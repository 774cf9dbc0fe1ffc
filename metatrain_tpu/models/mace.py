"""MACE-family: higher-order equivariant message passing.

TPU-native replacement for the reference's wrapper around ``mace-torch``/
``e3nn`` (``src/metatrain/experimental/mace/``): instead of wrapping an
external CUDA-kernel library, the equivariant stack is built natively --
our exact real-CG tables (``ops/cg.py``) drive dense per-path einsums over
the NEF layout, which XLA maps straight onto the MXU (the "padded per-L
dense einsum" strategy from SURVEY.md section 7.2 item 3).

Model structure per interaction (MACE-style, SO(3)):

- edge attributes: Bessel radial basis x spherical harmonics Y^l(u_ij),
  smooth cutoff envelope;
- density/interaction: for every CG path (l1, l2 -> L), neighbor features
  h_j^{l1} are combined with edge attributes l2 into messages m_i^L with
  learned per-path radial weights;
- product: the paper's EXACT B-basis -- symmetric contractions of the
  A-basis over an independent coupling-path basis with per-species path
  weights (arXiv:2206.07697 eq. 10-11, ``ops/symmetric_contraction.py``);
  older checkpoints keep the iterated-CG / legacy-gate products;
- update: per-l linear channel mixing + per-species residual;
- readout: invariant (l=0) channels -> per-atom MLP -> targets;
  equivariant readouts for spherical/vector targets.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..containers import SystemBatch
from ..data.target_info import DatasetInfo
from ..engine.trainer import DEFAULT_TRAINER_HYPERS, NNTrainer
from ..ops.cg import real_clebsch_gordan
from ..ops.radial import radial_basis
from ..ops.spherical import real_spherical_harmonics
from .nn_base import AtomisticNNModel


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # reference mace-torch defaults, adapted (experimental/mace/documentation.py)
    "cutoff": 5.0,
    "cutoff_width": 0.5,
    "num_radial": 8,
    "max_ell": 2,  # highest irrep order carried on nodes/messages
    "num_channels": 32,
    "num_interactions": 2,
    "correlation": 3,  # highest product (B-basis) order, as in paper MACE
    "mlp_width": 64,
    # product basis:
    # - "symmetric" (default): the paper's EXACT B-basis -- symmetric
    #   contractions with an independent (SVD-orthonormalized) coupling
    #   path basis and per-species path weights
    #   (``ops/symmetric_contraction.py``);
    # - "iterated_cg": the overcomplete iterated-CG span of the same
    #   polynomial space (v2 checkpoints);
    # - "legacy": round-1 invariant-gate product (v1 checkpoints).
    "product_basis": "symmetric",
}


def _cg_couple(x1, l1, x2, l2, L, acc):
    """CG coupling of two per-channel irrep blocks:
    (A, C, 2l1+1) x (A, C, 2l2+1) -> (A, C, 2L+1)."""
    cg = jnp.asarray(real_clebsch_gordan(l1, l2, L), dtype=acc)
    return jnp.einsum(
        "acp,acq,pqk->ack", x1, x2, cg, preferred_element_type=acc
    )


class EquivariantInteraction(nn.Module):
    """One interaction: CG-coupled neighbor aggregation + channel mixing."""

    max_ell: int
    num_channels: int
    num_radial: int
    correlation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], edge_data):
        # features[l]: (A, C, 2l+1)
        radial, sph, nbr_idx, nbr_mask = edge_data
        A, M = nbr_mask.shape
        C = self.num_channels
        lmax = self.max_ell

        messages: List[jnp.ndarray] = [
            jnp.zeros((A, C, 2 * L + 1), dtype=self.dtype)
            for L in range(lmax + 1)
        ]
        acc = jnp.promote_types(jnp.float32, self.dtype)
        for l1 in range(lmax + 1):
            # gather neighbor features once per l1: (A, M, C, 2l1+1)
            h_nbr = features[l1][nbr_idx]
            for l2 in range(lmax + 1):
                for L in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                    cg = jnp.asarray(
                        real_clebsch_gordan(l1, l2, L), dtype=acc
                    )
                    # learned per-channel radial weights for this path
                    w = nn.Dense(
                        C,
                        use_bias=False,
                        dtype=self.dtype,
                        name=f"radial_{l1}_{l2}_{L}",
                    )(radial)  # (A, M, C)
                    weighted = h_nbr * w[:, :, :, None]
                    # sum over neighbors: (A, C, 2l1+1, 2l2+1)
                    outer = jnp.einsum(
                        "amcp,amq->acpq",
                        weighted,
                        sph[l2],
                        preferred_element_type=acc,
                    )
                    messages[L] = messages[L] + jnp.einsum(
                        "acpq,pqk->ack", outer, cg, preferred_element_type=acc
                    ).astype(self.dtype)

        if self.correlation >= 2:
            # on-node self-product (MACE B-basis flavor): couple the
            # invariant channels with each irrep to re-weight messages
            gate = nn.Dense(
                C, dtype=self.dtype, name="product_gate"
            )(messages[0][:, :, 0])
            gate = jax.nn.silu(gate)
            messages = [
                m * gate[:, :, None] if L > 0 else m
                for L, m in enumerate(messages)
            ]

        # channel mixing per l (contract the channel axis) + residual
        out: List[jnp.ndarray] = []
        for L in range(lmax + 1):
            mixed = nn.Dense(
                C, use_bias=False, dtype=self.dtype, name=f"mix_{L}"
            )(messages[L].transpose(0, 2, 1)).transpose(0, 2, 1)
            out.append(features[L] + mixed)
        return out


def _pname(p: int) -> str:
    return "e" if p > 0 else "o"


class ParityInteraction(nn.Module):
    """MACE interaction with O(3) parity tracking.

    Features are a dict ``{(L, p): (A, C, 2L+1)}`` where ``p`` is the
    behavior under inversion ("natural" blocks have ``p == (-1)^L``).
    One interaction (paper MACE, arXiv:2206.07697, built natively):

    1. A-basis (density): neighbor features x spherical harmonics coupled
       through every CG path with learned per-path radial weights;
    2. product basis: iterated CG products of the A-basis up to
       ``correlation`` order, each path carrying per-SPECIES per-channel
       weights (the span of the paper's symmetric contractions -- an
       overcomplete but exactly equivariant parameterization of the same
       polynomial space, mapped to dense einsums for the MXU);
    3. update: per-species skip connection + per-L channel mixing.
    """

    max_ell: int
    num_channels: int
    num_species: int
    correlation: int
    product_basis: str = "symmetric"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, species_index, edge_data):
        radial, sph, nbr_idx, nbr_mask = edge_data
        lmax, C = self.max_ell, self.num_channels
        acc = jnp.promote_types(jnp.float32, self.dtype)

        # per-ATOM density normalization (batch-invariant; MACE uses a
        # dataset-wide average neighbor count, which would couple batched
        # systems): (A, 1, 1)
        inv_nbrs = jax.lax.rsqrt(
            jnp.sum(nbr_mask.astype(acc), axis=1) + 1.0
        ).astype(self.dtype)[:, None, None]

        # ---- 1. A-basis -------------------------------------------------
        messages: Dict[Any, jnp.ndarray] = {}
        for (l1, p1), feat in sorted(features.items()):
            h_nbr = feat[nbr_idx]  # (A, M, C, 2l1+1)
            for l2 in range(lmax + 1):
                p = p1 * ((-1) ** l2)
                for L in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                    w = nn.Dense(
                        C,
                        use_bias=False,
                        dtype=self.dtype,
                        name=f"radial_{l1}{_pname(p1)}_{l2}_{L}",
                    )(radial)  # (A, M, C)
                    outer = jnp.einsum(
                        "amcp,amq->acpq",
                        h_nbr * w[:, :, :, None],
                        sph[l2],
                        preferred_element_type=acc,
                    )
                    cg = jnp.asarray(real_clebsch_gordan(l1, l2, L), dtype=acc)
                    msg = jnp.einsum(
                        "acpq,pqk->ack", outer, cg, preferred_element_type=acc
                    ).astype(self.dtype) * inv_nbrs
                    key = (L, p)
                    messages[key] = messages.get(key, 0.0) + msg

        # ---- 2. product basis --------------------------------------------
        if self.product_basis == "symmetric":
            # EXACT MACE B-basis (arXiv:2206.07697 eq. 10-11): symmetric
            # contractions over an independent coupling-path basis with
            # per-species path weights (``ops/symmetric_contraction``).
            # Operates on the natural-parity A-basis stack (paper MACE
            # carries only natural-parity node irreps); non-natural
            # blocks produced by mixed-parity features pass through.
            from ..ops.symmetric_contraction import (
                contract_symmetric,
                num_paths,
            )

            n_atoms = species_index.shape[0]
            stack = []
            for L in range(lmax + 1):
                blk = messages.get((L, (-1) ** L))
                if blk is None:
                    blk = jnp.zeros(
                        (n_atoms, C, 2 * L + 1), dtype=self.dtype
                    )
                stack.append(blk.astype(acc))
            A_feat = jnp.concatenate(stack, axis=-1)  # (A, C, (lmax+1)^2)

            path_weights: Dict[Any, jnp.ndarray] = {}
            for nu in range(1, self.correlation + 1):
                for L in range(lmax + 1):
                    P = num_paths(lmax, L, nu)
                    if P == 0:
                        continue
                    w = nn.Embed(
                        self.num_species,
                        P * C,
                        dtype=self.dtype,
                        name=f"sym{nu}_{L}",
                    )(species_index)  # (A, P*C)
                    path_weights[(nu, L)] = w.reshape(n_atoms, P, C)
            prods = contract_symmetric(
                A_feat, path_weights, lmax, lmax, self.correlation, jnp=jnp
            )
            total = {
                key: val
                for key, val in messages.items()
                if key[1] != (-1) ** key[0]  # non-natural: pass through
            }
            for L, val in prods.items():
                total[(L, (-1) ** L)] = val.astype(self.dtype)
        else:
            total = dict(messages)
            current = messages
            for order in range(2, self.correlation + 1):
                nxt: Dict[Any, jnp.ndarray] = {}
                for (l1, p1), x1 in sorted(current.items()):
                    for (l2, p2), x2 in sorted(messages.items()):
                        if order == 2 and (l2, p2) > (l1, p1):
                            continue  # symmetric at order 2: halve paths
                        p = p1 * p2
                        for L in range(
                            abs(l1 - l2), min(l1 + l2, lmax) + 1
                        ):
                            w = nn.Embed(
                                self.num_species,
                                C,
                                dtype=self.dtype,
                                name=(
                                    f"prod{order}_{l1}{_pname(p1)}_"
                                    f"{l2}{_pname(p2)}_{L}"
                                ),
                            )(species_index)  # (A, C) per-species weights
                            block = _cg_couple(
                                x1.astype(acc), l1, x2.astype(acc), l2, L,
                                acc,
                            ).astype(self.dtype) * w[:, :, None]
                            key = (L, p)
                            nxt[key] = nxt.get(key, 0.0) + block
                current = nxt
                for key, val in nxt.items():
                    total[key] = total.get(key, 0.0) + val

        # ---- 3. update: per-species skip + per-key channel mixing -------
        out: Dict[Any, jnp.ndarray] = {}
        skip_init = nn.initializers.normal(stddev=1.0 / np.sqrt(C))
        for key in sorted(total):
            L, p = key
            m = total[key]
            mixed = nn.Dense(
                C,
                use_bias=False,
                dtype=self.dtype,
                name=f"mix_{L}{_pname(p)}",
            )(m.transpose(0, 2, 1)).transpose(0, 2, 1)
            if key in features:
                skip_table = self.param(
                    f"skip_{L}{_pname(p)}",
                    skip_init,
                    (self.num_species, C, C),
                )
                skip_w = skip_table[species_index].astype(self.dtype)
                mixed = mixed + jnp.einsum(
                    "acp,acd->adp",
                    features[key],
                    skip_w,
                    preferred_element_type=acc,
                ).astype(self.dtype)
            out[key] = mixed
        return out


class EquivariantReadout(nn.Module):
    """Read a (o3_lambda, o3_sigma) spherical block from parity-tracked
    features: direct per-channel linear when a block of the right parity
    exists, otherwise one extra CG coupling of feature pairs whose
    combined parity matches (covers e.g. lambda=1 sigma=-1 pseudovectors)."""

    o3_lambda: int
    o3_sigma: int
    num_properties: int
    max_ell: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        lam = self.o3_lambda
        p_t = self.o3_sigma * ((-1) ** lam)
        acc = jnp.promote_types(jnp.float32, self.dtype)

        def channel_linear(x, name):
            # (A, C, 2L+1) -> (A, num_properties, 2L+1)
            return nn.Dense(
                self.num_properties, use_bias=False, dtype=self.dtype, name=name
            )(x.transpose(0, 2, 1)).transpose(0, 2, 1)

        if (lam, p_t) in features:
            return channel_linear(features[(lam, p_t)], "direct")

        # one CG coupling of available blocks with the right parity
        out = None
        for (l1, p1), x1 in sorted(features.items()):
            for (l2, p2), x2 in sorted(features.items()):
                if (l2, p2) > (l1, p1):
                    continue
                if p1 * p2 != p_t or not (abs(l1 - l2) <= lam <= l1 + l2):
                    continue
                block = _cg_couple(
                    x1.astype(acc), l1, x2.astype(acc), l2, lam, acc
                ).astype(self.dtype)
                term = channel_linear(
                    block, f"couple_{l1}{_pname(p1)}_{l2}{_pname(p2)}"
                )
                out = term if out is None else out + term
        if out is None:
            raise NotImplementedError(
                f"no parity path to (lambda={lam}, sigma={self.o3_sigma}) "
                f"with max_ell={self.max_ell}"
            )
        return out


class MACEModuleV2(nn.Module):
    """Parity-tracked MACE with iterated-CG products and equivariant
    readouts (scalar targets: per-interaction invariant readouts summed,
    as in paper MACE)."""

    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    target_specs: Dict[str, Any]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any], requested: Sequence[str]):
        hp = self.hypers
        lmax, C = hp["max_ell"], hp["num_channels"]
        A, M = batch_data["nbr_mask"].shape

        distances = batch_data["edge_distances"]
        radial = radial_basis(
            distances, hp["cutoff"], hp["num_radial"], "bessel", hp["cutoff_width"]
        )
        radial = jnp.where(
            batch_data["nbr_mask"][:, :, None], radial, 0.0
        ).astype(self.dtype)
        unit = batch_data["edge_vectors"] / jnp.maximum(distances, 1e-10)[
            :, :, None
        ]
        sph = [
            jnp.where(
                batch_data["nbr_mask"][:, :, None], y, 0.0
            ).astype(self.dtype)
            for y in real_spherical_harmonics(unit, lmax)
        ]

        species_index = batch_data["species_index"]
        h0 = nn.Embed(
            self.num_species, C, dtype=self.dtype, name="species_embedding"
        )(species_index)
        features = {(0, 1): h0[:, :, None]}

        edge_data = (radial, sph, batch_data["nbr_indices"], batch_data["nbr_mask"])
        invariant_stack: List[jnp.ndarray] = []
        for t in range(hp["num_interactions"]):
            features = ParityInteraction(
                max_ell=lmax,
                num_channels=C,
                num_species=self.num_species,
                correlation=hp["correlation"],
                product_basis=hp.get("product_basis", "symmetric"),
                dtype=self.dtype,
                name=f"interaction_{t}",
            )(features, species_index, edge_data)
            invariant_stack.append(features[(0, 1)][:, :, 0])

        invariants = jnp.concatenate(invariant_stack, axis=-1)
        hidden = nn.Dense(hp["mlp_width"], dtype=self.dtype, name="readout_0")(
            invariants
        )
        hidden = jax.nn.silu(hidden)

        results: Dict[str, Any] = {"_features": invariants}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            specs = self.target_specs.get(target_name)
            head = nn.Dense(
                hp["mlp_width"], dtype=self.dtype, name=f"head_{safe}"
            )(hidden)
            head = jax.nn.silu(head)
            results[f"_ll_features::{target_name}"] = head
            per_block = {}
            for b_idx, (block_key, size) in enumerate(shapes.items()):
                spec = specs[b_idx] if specs else {"type": "scalar"}
                if spec["type"] == "scalar":
                    per_block[block_key] = nn.Dense(
                        size, dtype=self.dtype, name=f"last_{safe}_{block_key}"
                    )(head)
                else:
                    out = EquivariantReadout(
                        o3_lambda=spec["o3_lambda"],
                        o3_sigma=spec["o3_sigma"],
                        num_properties=spec["num_properties"],
                        max_ell=hp["max_ell"],
                        dtype=self.dtype,
                        name=f"equiv_readout_{safe}_{block_key}",
                    )(features)
                    if spec["type"] == "cartesian_rank1":
                        # real-SH order m=(-1,0,1) ~ (y,z,x) -> xyz
                        out = out[:, :, jnp.array([2, 0, 1])]
                    # (A, props, 2lam+1) -> (A, components * props) with
                    # components-major layout (matches TensorMap blocks)
                    per_block[block_key] = out.transpose(0, 2, 1).reshape(
                        out.shape[0], -1
                    )
            results[target_name] = per_block
        return results


class MACEModule(nn.Module):
    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any], requested: Sequence[str]):
        hp = self.hypers
        lmax, C = hp["max_ell"], hp["num_channels"]
        A, M = batch_data["nbr_mask"].shape

        distances = batch_data["edge_distances"]
        radial = radial_basis(
            distances, hp["cutoff"], hp["num_radial"], "bessel", hp["cutoff_width"]
        )
        radial = jnp.where(
            batch_data["nbr_mask"][:, :, None], radial, 0.0
        ).astype(self.dtype)
        unit = batch_data["edge_vectors"] / jnp.maximum(distances, 1e-10)[
            :, :, None
        ]
        sph = [
            jnp.where(
                batch_data["nbr_mask"][:, :, None], y, 0.0
            ).astype(self.dtype)
            for y in real_spherical_harmonics(unit, lmax)
        ]

        # initial features: species embedding in the invariant channel
        h0 = nn.Embed(
            self.num_species, C, dtype=self.dtype, name="species_embedding"
        )(batch_data["species_index"])
        features: List[jnp.ndarray] = [h0[:, :, None]] + [
            jnp.zeros((A, C, 2 * L + 1), dtype=self.dtype)
            for L in range(1, lmax + 1)
        ]

        edge_data = (radial, sph, batch_data["nbr_indices"], batch_data["nbr_mask"])
        for t in range(hp["num_interactions"]):
            features = EquivariantInteraction(
                max_ell=lmax,
                num_channels=C,
                num_radial=hp["num_radial"],
                correlation=hp["correlation"],
                dtype=self.dtype,
                name=f"interaction_{t}",
            )(features, edge_data)

        invariants = features[0][:, :, 0]  # (A, C)
        hidden = nn.Dense(hp["mlp_width"], dtype=self.dtype, name="readout_0")(
            invariants
        )
        hidden = jax.nn.silu(hidden)

        results: Dict[str, Any] = {"_features": invariants}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            head = nn.Dense(
                hp["mlp_width"], dtype=self.dtype, name=f"head_{safe}"
            )(hidden)
            head = jax.nn.silu(head)
            results[f"_ll_features::{target_name}"] = head
            per_block = {}
            for block_key, size in shapes.items():
                per_block[block_key] = nn.Dense(
                    size, dtype=self.dtype, name=f"last_{safe}_{block_key}"
                )(head)
            results[target_name] = per_block
        return results


class _FoundationCompatShim:
    """Duck-typed stand-in for a flax module (``init``/``apply``) whose
    parameters are the imported mace-torch foundation tensors; the
    forward re-executes the mace architecture from them
    (:mod:`metatrain_tpu.interop.mace_compat`). Scalar-energy targets
    only (the foundation readouts are scalar); non-trainable foundation
    buffers (U matrices, bessel frequencies) ride the parameter tree
    under ``foundation_static`` behind a ``stop_gradient`` so finetuning
    never drifts them.
    """

    def __init__(self, config, output_shapes, target_names):
        from ..interop.mace_compat import MACECompat

        self.compat = MACECompat(config)
        self.output_shapes = output_shapes
        self.target_names = tuple(target_names)
        self.num_elements = self.compat.num_elements
        # our species_index is sorted-atomic-types order; the foundation
        # tensors' element axis follows the FILE's atomic_numbers order
        perm = config.get("element_perm")
        self._element_perm = (
            np.asarray(perm, np.int32)
            if perm is not None
            else np.arange(self.num_elements, dtype=np.int32)
        )

    def init(self, rng, batch_data, targets):  # pragma: no cover - guard
        raise RuntimeError(
            "foundation-compat MACE parameters come from "
            "`mtt-tpu import-torch <foundation file>`, not fresh init"
        )

    def apply(self, params, batch_data, targets, **_kwargs):
        p = params["params"]
        state = dict(p["foundation"])
        state.update(
            jax.tree_util.tree_map(
                jax.lax.stop_gradient, dict(p.get("foundation_static", {}))
            )
        )
        file_idx = jnp.asarray(self._element_perm)[
            batch_data["species_index"]
        ]
        onehot = jax.nn.one_hot(
            file_idx, self.num_elements, dtype=jnp.float32
        )
        bd = dict(batch_data)
        bd["species_onehot"] = onehot
        energies = self.compat.forward(state, bd, jnp)  # (A,)
        out = {}
        for name in targets:
            shapes = self.output_shapes[name]
            (block_key,) = tuple(shapes)
            if shapes[block_key] != 1:
                raise NotImplementedError(
                    "foundation-compat MACE serves scalar energy "
                    "targets only"
                )
            out[name] = {block_key: energies[:, None]}
        return out


class MACE(AtomisticNNModel):
    ARCHITECTURE_NAME = "experimental.mace"
    __checkpoint_version__ = 3
    __supported_dtypes__ = [jnp.float64, jnp.float32]
    __default_metadata__ = {
        "references": {"architecture": ["https://arxiv.org/abs/2206.07697"]}
    }

    def __init__(self, hypers, dataset_info: DatasetInfo, compute_dtype=jnp.float32):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        super().__init__(full, dataset_info, compute_dtype)
        legacy = full["product_basis"] == "legacy"

        target_specs: Dict[str, Any] = {}
        for name, info in self.target_infos.items():
            specs = []
            if info.is_scalar:
                for _ in info.layout.blocks():
                    specs.append({"type": "scalar"})
            elif legacy:
                raise NotImplementedError(
                    f"MACE tensorial target '{name}': use "
                    "product_basis='iterated_cg'"
                )
            elif info.is_spherical:
                names = info.layout.keys.names
                if "o3_lambda" not in names:
                    raise NotImplementedError(
                        f"MACE target '{name}': spherical "
                        "product='cartesian' (o3_lambda_1/2) targets "
                        "have no equivariant readout here; use a "
                        "generic-head architecture (pet, dpa3)"
                    )
                for key_tuple, block in info.layout.items():
                    specs.append(
                        {
                            "type": "spherical",
                            "o3_lambda": int(
                                key_tuple[names.index("o3_lambda")]
                            ),
                            "o3_sigma": int(key_tuple[names.index("o3_sigma")]),
                            "num_properties": len(block.properties),
                        }
                    )
            elif info.is_cartesian and info.rank == 1:
                for _, block in info.layout.items():
                    specs.append(
                        {
                            "type": "cartesian_rank1",
                            "o3_lambda": 1,
                            "o3_sigma": 1,
                            "num_properties": len(block.properties),
                        }
                    )
            else:
                raise NotImplementedError(
                    f"MACE target '{name}': Cartesian rank >= 2 targets "
                    "are not supported (use a spherical decomposition)"
                )
            target_specs[name] = specs

        self.cutoff = float(full["cutoff"])
        if full.get("foundation_compat"):
            # imported mace-torch foundation interior: the module
            # re-executes the mace forward from the transplanted tensors
            # (interop/mace_compat); parameters ARE those tensors
            self.module = _FoundationCompatShim(
                dict(full["foundation_config"]),
                self.output_shapes,
                tuple(self.target_infos),
            )
        elif legacy:
            self.module = MACEModule(
                hypers=dict(full),
                num_species=len(self.atomic_types),
                output_shapes=self.output_shapes,
                dtype=compute_dtype,
            )
        else:
            self.module = MACEModuleV2(
                hypers=dict(full),
                num_species=len(self.atomic_types),
                output_shapes=self.output_shapes,
                target_specs=target_specs,
                dtype=compute_dtype,
            )

    @classmethod
    def upgrade_v1_v2(cls, checkpoint):
        """v1 checkpoints predate the iterated-CG product basis: they keep
        the legacy module (their saved parameters match it)."""
        hypers = dict(checkpoint["hypers"])
        hypers["product_basis"] = "legacy"
        hypers.setdefault("correlation", 2)
        checkpoint = dict(checkpoint)
        checkpoint["hypers"] = hypers
        return checkpoint

    @classmethod
    def upgrade_v2_v3(cls, checkpoint):
        """v3 makes the exact symmetric-contraction B-basis the default
        product basis; v2 checkpoints were trained with the iterated-CG
        span and keep it (their saved parameters match that module)."""
        hypers = dict(checkpoint["hypers"])
        hypers.setdefault("product_basis", "iterated_cg")
        checkpoint = dict(checkpoint)
        checkpoint["hypers"] = hypers
        return checkpoint

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        vectors, distances = batch.edge_vectors()
        species_index = self.species_index(batch)
        return {
            "species_index": species_index,
            "edge_vectors": vectors,
            "edge_distances": distances,
            "nbr_indices": batch.nbr_indices,
            "nbr_mask": batch.nbr_mask,
        }

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff


class MACETrainer(NNTrainer):
    DEFAULT_HYPERS = copy.deepcopy(DEFAULT_TRAINER_HYPERS)
    DEFAULT_HYPERS.update({"learning_rate": 5e-3, "o3_augmentation": False})


__model__ = MACE
__trainer__ = MACETrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": copy.deepcopy(MACETrainer.DEFAULT_HYPERS),
}
