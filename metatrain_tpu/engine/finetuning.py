"""Fine-tuning strategies: full / heads-only / LoRA.

Counterpart of the reference ``pet/modules/finetuning.py:13-377``. In a
functional JAX world a "strategy" is just a parameter mask for the
optimizer (``optax.masked``) plus, for LoRA, extra low-rank parameters
whose product is added to the frozen kernels at apply time.

- ``full``: every parameter trains (default).
- ``heads``: only per-target head/last-layer parameters train; the
  backbone is frozen.
- ``lora``: backbone kernels are frozen; rank-r A/B adapters are created
  for every 2-D kernel and merged as ``W + alpha/r * A @ B`` before the
  forward pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


HEAD_MARKERS = ("head", "last", "readout", "logits")


def _is_head_path(path: Tuple) -> bool:
    flat = "/".join(str(getattr(p, "key", p)) for p in path).lower()
    return any(marker in flat for marker in HEAD_MARKERS)


_HEAD_NAME_PREFIXES = ("node_head_", "edge_head_", "node_last_", "edge_last_")


def inherit_heads(params, mapping):
    """Copy head/last-layer parameters of existing targets into the
    (freshly initialized) heads of new targets.

    ``mapping`` maps new target names (keys) to existing source targets
    (values), as in the reference (``pet/modules/finetuning.py:57-61``):
    instead of random initialization, the new target's head starts from
    the source head's weights. Matching is by module-name segment
    (``node_head_<target>_<i>`` etc.); leaves whose source is missing or
    shape-mismatched are left untouched.
    """
    if not mapping:
        return params
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    by_path = {
        tuple(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in leaves
    }

    def source_path(path_keys, dst_safe, src_safe):
        out = []
        hit = False
        for seg in path_keys:
            for prefix in _HEAD_NAME_PREFIXES:
                if seg.startswith(prefix + dst_safe) and (
                    len(seg) == len(prefix + dst_safe)
                    or seg[len(prefix + dst_safe)] == "_"
                ):
                    seg = prefix + src_safe + seg[len(prefix + dst_safe):]
                    hit = True
                    break
            out.append(seg)
        return (tuple(out), hit)

    new_by_path = dict(by_path)
    for dst, src in mapping.items():
        dst_safe = dst.replace(":", "_")
        src_safe = src.replace(":", "_")
        for path_keys, leaf in by_path.items():
            src_keys, hit = source_path(path_keys, dst_safe, src_safe)
            if not hit:
                continue
            src_leaf = by_path.get(src_keys)
            if src_leaf is not None and src_leaf.shape == leaf.shape:
                new_by_path[path_keys] = src_leaf.astype(leaf.dtype)
    new_leaves = [
        new_by_path[tuple(str(getattr(p, "key", p)) for p in path)]
        for path, _ in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def trainable_mask(params, method: str):
    """Boolean pytree: True where the optimizer should update."""
    if method == "full":
        return jax.tree_util.tree_map(lambda _: True, params)
    if method == "heads":
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _is_head_path(path), params
        )
    raise ValueError(f"unknown finetuning method {method!r}")


def masked_optimizer(
    optimizer: optax.GradientTransformation, params, method: str
) -> optax.GradientTransformation:
    """Route frozen parameters to set_to_zero (optax.masked alone would
    pass their raw gradients through to apply_updates)."""
    if method == "full":
        return optimizer
    mask = trainable_mask(params, method)
    labels = jax.tree_util.tree_map(
        lambda trainable: "train" if trainable else "freeze", mask
    )
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels
    )


# -- LoRA --------------------------------------------------------------------


def init_lora_params(
    params, rank: int, rng: jax.Array, targets: str = "kernel"
):
    """Low-rank adapters for every 2-D kernel in the pytree."""
    adapters = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))
    for (path, leaf), key in zip(flat, keys):
        names = [str(getattr(p, "key", p)) for p in path]
        if names and names[-1] == targets and leaf.ndim == 2:
            d_in, d_out = leaf.shape
            path_key = "/".join(names)
            adapters[path_key] = {
                "A": jax.random.normal(key, (d_in, rank), leaf.dtype)
                / jnp.sqrt(d_in),
                "B": jnp.zeros((rank, d_out), leaf.dtype),
            }
    return adapters


def apply_lora(params, adapters: Dict[str, Dict[str, jnp.ndarray]], alpha: float, rank: int):
    """Merge adapters into a new parameter pytree: W + alpha/r * A @ B."""
    scale = alpha / max(rank, 1)

    def merge(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        key = "/".join(names)
        if key in adapters:
            ab = adapters[key]
            return leaf + scale * (ab["A"] @ ab["B"]).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def make_lora_forward(model, adapters_template, alpha: float, rank: int):
    """Wrap ``model.forward`` so trainable params = adapters only."""

    def forward(lora_params, batch, outputs):
        merged = apply_lora(model.params, lora_params, alpha, rank)
        return model.forward(merged, batch, outputs)

    return forward
