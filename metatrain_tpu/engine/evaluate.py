"""The autograd evaluation engine: energies -> forces and stress.

TPU-native counterpart of the reference's ``utils/evaluate_model.py`` +
``utils/output_gradient.py``: instead of rebuilding systems with
``requires_grad`` tensors and calling ``torch.autograd.grad``, the whole
computation is one differentiable function of ``(positions, strain)`` and
gradients come from a single ``jax.vjp`` -- one forward pass, one backward
pass per energy target. The strain trick is identical in spirit
(reference ``evaluate_model.py:296-350``): per-system ``strain = I``,
``positions @ strain[system]``, ``cell @ strain``, so
``dE/dstrain`` is the (volume-scaled) stress and ``-dE/dstrain`` the virial.

Double backward (training with forces in the loss) works natively: the
returned gradients are themselves differentiable JAX values, so the loss
may depend on them and ``jax.grad`` of the loss flows through this engine
(the reference needs a ``manual_attention`` workaround for this,
``pet/modules/transformer.py:565-589``; JAX does not).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.target_info import TargetInfo


ForwardFn = Callable[..., Dict[str, TensorMap]]


_XYZ = Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))
_STRAIN_COMPONENTS = (
    Labels(["xyz_1"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
    Labels(["xyz_2"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
)


def evaluate_model(
    forward_fn: ForwardFn,
    params,
    batch: SystemBatch,
    target_infos: Dict[str, TargetInfo],
    is_training: bool = True,
    outputs: Optional[List[str]] = None,
    selected_atoms=None,
) -> Dict[str, TensorMap]:
    """Run the model and attach requested position/strain gradients.

    :param forward_fn: pure function ``(params, batch, outputs) ->
        {name: TensorMap}``; must honor overridden ``batch.positions`` /
        ``batch.cells``.
    :param params: model parameters pytree.
    :param batch: the system batch.
    :param target_infos: targets to evaluate, with their gradient lists.
    :param is_training: kept for API parity; JAX gradients are always
        differentiable, so this does not change correctness.
    :param outputs: subset of target names to compute (default: all).
    :param selected_atoms: optional (A,) boolean mask restricting outputs
        (and hence their gradients) to a subset of atoms; see
        ``models.nn_base.AtomisticNNModel.forward``.
    :return: ``{name: TensorMap}`` with ``positions`` gradients of shape
        (A, 3, 1) and ``strain`` gradients of shape (S, 3, 3, 1) attached
        to scalar targets that request them.
    """
    names = list(outputs) if outputs is not None else list(target_infos)
    needs_pos = [n for n in names if "positions" in target_infos[n].gradients]
    needs_strain = [n for n in names if "strain" in target_infos[n].gradients]
    grad_targets = sorted(set(needs_pos) | set(needs_strain))

    import contextlib

    from ..ops.inference import no_param_grads

    # inference (is_training=False): no parameter gradients will ever be
    # pulled through this trace -- let custom kernels skip building them
    grad_ctx = no_param_grads if not is_training else contextlib.nullcontext

    import functools

    if selected_atoms is not None:
        forward_fn = functools.partial(
            forward_fn, selected_atoms=selected_atoms
        )

    if not grad_targets:
        with grad_ctx():
            return forward_fn(params, batch, names)


    S = batch.n_systems_padded
    dtype = batch.positions.dtype
    strain = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (S, 3, 3))

    def strained_forward(positions, strain):
        atom_strain = strain[batch.system_index]  # (A, 3, 3)
        pos_s = jnp.einsum(
            "ac,acd->ad",
            positions,
            atom_strain,
            precision=jax.lax.Precision.HIGHEST,
        )
        cells_s = jnp.einsum(
            "scd,sde->sce",
            batch.cells,
            strain,
            precision=jax.lax.Precision.HIGHEST,
        )
        new_batch = batch.replace(positions=pos_s, cells=cells_s)
        predictions = forward_fn(params, new_batch, names)
        primary = {n: predictions[n].block(0).values for n in grad_targets}
        return primary, predictions

    with grad_ctx():
        primary, vjp_fn, predictions = jax.vjp(
            strained_forward, batch.positions, strain, has_aux=True
        )

    for name in grad_targets:
        block = predictions[name].block(0)
        n_props = primary[name].shape[-1]
        if n_props == 1:
            cotangent = {n: jnp.zeros_like(v) for n, v in primary.items()}
            seed = jnp.ones_like(primary[name])
            if block.mask is not None:
                mask = block.mask.reshape(
                    block.mask.shape + (1,) * (seed.ndim - 1)
                )
                seed = jnp.where(mask, seed, 0.0)
            cotangent[name] = seed
            with grad_ctx():
                d_pos, d_strain = vjp_fn(cotangent)
        else:
            # multi-property target (e.g. LLPR ensemble members, reference
            # llpr/model.py:719): one vmapped backward over the property
            # cotangent basis gives every member's gradient at once
            def pull(seed_p, name=name, block=block):
                cotangent = {
                    n: jnp.zeros_like(v) for n, v in primary.items()
                }
                seed = jnp.zeros_like(primary[name]) + seed_p
                if block.mask is not None:
                    mask = block.mask.reshape(
                        block.mask.shape + (1,) * (seed.ndim - 1)
                    )
                    seed = jnp.where(mask, seed, 0.0)
                cotangent[name] = seed
                return vjp_fn(cotangent)

            basis = jnp.eye(n_props, dtype=primary[name].dtype)
            with grad_ctx():
                d_pos_all, d_strain_all = jax.vmap(pull)(basis)
            # (P, A, 3) -> (A, 3, P); (P, S, 3, 3) -> (S, 3, 3, P)
            d_pos = jnp.moveaxis(d_pos_all, 0, -1)
            d_strain = jnp.moveaxis(d_strain_all, 0, -1)

        if name in needs_pos:
            grad = TensorBlock(
                values=d_pos[:, :, None] if n_props == 1 else d_pos,
                samples=Labels(
                    ["system", "atom"],
                    jnp.stack(
                        [
                            batch.system_index,
                            jnp.arange(batch.n_atoms_padded, dtype=jnp.int32),
                        ],
                        axis=1,
                    ),
                ),
                components=(_XYZ,),
                properties=block.properties,
                mask=batch.atom_mask,
            )
            block.add_gradient("positions", grad)
        if name in needs_strain:
            grad = TensorBlock(
                values=d_strain[:, :, :, None] if n_props == 1 else d_strain,
                samples=Labels.range("sample", S),
                components=_STRAIN_COMPONENTS,
                properties=block.properties,
                mask=batch.system_mask,
            )
            block.add_gradient("strain", grad)

    return predictions
