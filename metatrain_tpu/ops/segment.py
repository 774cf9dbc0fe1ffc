"""Masked segment reductions and per-atom averaging.

TPU-native replacements for the reference's ``utils/sum_over_atoms.py`` and
``utils/per_atom.py``: fixed-shape ``jax.ops.segment_sum`` over the batch's
system indices (padding atoms point at the always-padded last system slot,
so no masking branch is needed in the hot path).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap


def sum_over_atoms(
    per_atom_values: jnp.ndarray,
    system_index: jnp.ndarray,
    n_systems: int,
    atom_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Sum per-atom values (A, ...) into per-system values (S, ...)."""
    values = per_atom_values
    if atom_mask is not None:
        values = jnp.where(
            atom_mask.reshape(atom_mask.shape + (1,) * (values.ndim - 1)),
            values,
            0.0,
        )
    return jax.ops.segment_sum(values, system_index, num_segments=n_systems)


def sum_over_atoms_tensormap(tmap: TensorMap, batch: SystemBatch) -> TensorMap:
    """Per-atom TensorMap -> per-system TensorMap (sum over atoms)."""
    S = batch.n_systems_padded

    def convert(block: TensorBlock) -> TensorBlock:
        summed = sum_over_atoms(
            block.values, batch.system_index, S, block.mask
        )
        return TensorBlock(
            values=summed,
            samples=Labels.range("system", S),
            components=block.components,
            properties=block.properties,
            mask=batch.system_mask,
        )

    return tmap.map_blocks(convert)


def divide_by_num_atoms(tmap: TensorMap, num_atoms: jnp.ndarray) -> TensorMap:
    """Divide per-system blocks (and their per-system gradients) by the
    number of atoms; per-atom blocks/gradients are untouched
    (reference ``utils/per_atom.py:40-80``)."""
    safe = jnp.maximum(num_atoms, 1).astype(jnp.float32)

    def convert(block: TensorBlock) -> TensorBlock:
        if "atom" in block.samples.names or "first_atom" in block.samples.names:
            return block
        scale = safe.reshape((-1,) + (1,) * (block.values.ndim - 1)).astype(
            block.values.dtype
        )
        new = TensorBlock(
            values=block.values / scale,
            samples=block.samples,
            components=block.components,
            properties=block.properties,
            mask=block.mask,
        )
        for name, grad in block.gradients():
            if "atom" in grad.samples.names or "first_atom" in grad.samples.names:
                new.add_gradient(name, grad)
            else:
                g_scale = safe.reshape(
                    (-1,) + (1,) * (grad.values.ndim - 1)
                ).astype(grad.values.dtype)
                new.add_gradient(
                    name,
                    TensorBlock(
                        values=grad.values / g_scale,
                        samples=grad.samples,
                        components=grad.components,
                        properties=grad.properties,
                        mask=grad.mask,
                    ),
                )
        return new

    return tmap.map_blocks(convert)


def average_by_num_atoms(
    tensor_map_dict: Dict[str, TensorMap],
    batch: SystemBatch,
    per_structure_keys: Sequence[str] = (),
) -> Dict[str, TensorMap]:
    """Average per-system quantities by atom count, skipping
    ``per_structure_keys`` (reference ``utils/per_atom.py:8-38``)."""
    num_atoms = batch.n_atoms_per_system
    out = {}
    for key, tmap in tensor_map_dict.items():
        if key in per_structure_keys:
            out[key] = tmap
        else:
            out[key] = divide_by_num_atoms(tmap, num_atoms)
    return out
