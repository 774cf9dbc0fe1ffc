"""Collation: host samples -> fixed-shape device batches.

Replaces the reference's serialize-to-blob CollateFn + unpack_batch
(``utils/data/dataset.py:381-481``). Output is a :class:`Batch`: one padded
:class:`SystemBatch` plus padded, masked target TensorMaps whose array
shapes depend only on the (bucketed) batch geometry -- so one XLA
compilation per bucket serves the whole run.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import (
    Labels,
    NeighborData,
    System,
    SystemBatch,
    TensorBlock,
    TensorMap,
    batch_from_systems,
    bucket_atoms,
    bucket_neighbors,
    bucket_size,
)
from ..ops.neighbors import compute_neighbor_data
from .dataset import Sample
from .target_info import TargetInfo


@dataclasses.dataclass
class Batch:
    """One device-resident training/eval batch."""

    systems: SystemBatch
    targets: Dict[str, TensorMap]
    extra_data: Dict[str, TensorMap] = dataclasses.field(default_factory=dict)


jax.tree_util.register_pytree_node(
    Batch,
    lambda b: (
        (b.systems, b.targets, b.extra_data),
        None,
    ),
    lambda _, children: Batch(*children),
)


class NeighborListCache:
    """Per-system neighbor-data cache keyed on object identity.

    Entries hold a weakref to their system: a hit requires the stored
    referent to still BE the queried object, so a recycled CPython id
    (disk-backed datasets build a fresh ``System`` per access) can never
    return another structure's neighbor lists, and dead entries are
    purged so the cache stays bounded by live systems."""

    def __init__(self, cutoff: float):
        import weakref

        self.cutoff = cutoff
        self._weakref = weakref.ref
        self._cache: Dict[int, tuple] = {}  # id -> (weakref, NeighborData)
        self._queries = 0

    def __call__(self, system: System) -> NeighborData:
        key = id(system)
        entry = self._cache.get(key)
        if entry is not None and entry[0]() is system:
            return entry[1]
        data = compute_neighbor_data(system, self.cutoff)
        try:
            ref = self._weakref(system)
        except TypeError:  # not weakref-able: don't cache
            return data
        self._cache[key] = (ref, data)
        self._queries += 1
        if self._queries % 256 == 0:  # amortized purge of dead entries
            self._cache = {
                k: v for k, v in self._cache.items() if v[0]() is not None
            }
        return data


class CollateFn:
    """Build :class:`Batch` objects from dataset samples.

    :param cutoff: neighbor-list cutoff (from the model's requested NL).
    :param dtype: floating dtype of device arrays.
    :param target_infos: target name -> TargetInfo (drives batched layout).
    :param bucket_ratio: geometric bucket growth factor.
    :param max_neighbors: optional fixed NEF width (otherwise bucketed).
    :param extra_system_keys: names of per-system scalars to ship in
        ``SystemBatch.extra`` (e.g. ``charge`` for conditioning).
    :param transforms: host-side batch transforms applied in order (e.g.
        O3 augmentation, additive-baseline removal), each
        ``(samples) -> samples``.
    :param n_atoms_padded: optional fixed atom padding (otherwise bucketed);
        fixed sizes give identical shapes across batches, required when
        stacking per-device batches for data parallelism.
    :param n_systems_padded: optional fixed system padding.
    """

    def __init__(
        self,
        cutoff: float,
        target_infos: Dict[str, TargetInfo],
        dtype=jnp.float32,
        bucket_ratio: float = 1.25,
        max_neighbors: Optional[int] = None,
        extra_system_keys: Sequence[str] = (),
        transforms: Sequence[Callable[[List[Sample]], List[Sample]]] = (),
        n_atoms_padded: Optional[int] = None,
        n_systems_padded: Optional[int] = None,
    ):
        self.cutoff = cutoff
        self.target_infos = dict(target_infos)
        self.dtype = dtype
        self.bucket_ratio = bucket_ratio
        self.max_neighbors = max_neighbors
        self.extra_system_keys = tuple(extra_system_keys)
        self.transforms = list(transforms)
        self.n_atoms_padded = n_atoms_padded
        self.n_systems_padded = n_systems_padded
        self.nl_cache = NeighborListCache(cutoff)

    def __call__(self, samples: List[Sample]) -> Batch:
        # Neighbor lists are computed on the ORIGINAL systems (cache hits
        # across epochs); transforms must preserve the neighbor topology
        # (O3 rotations and target-space removals do -- distances are
        # invariant), they only change positions/cells/target values.
        neighbor_data = [self.nl_cache(s.system) for s in samples]

        for transform in self.transforms:
            samples = transform(samples)

        systems = [s.system for s in samples]

        total_atoms = sum(len(s) for s in systems)
        A = self.n_atoms_padded or bucket_atoms(total_atoms, self.bucket_ratio)
        S = self.n_systems_padded or bucket_size(
            len(systems) + 1, self.bucket_ratio, minimum=2
        )
        m_req = max((n.max_neighbors for n in neighbor_data), default=1)
        M = self.max_neighbors or bucket_neighbors(m_req, self.bucket_ratio)

        system_batch = batch_from_systems(
            systems,
            neighbor_data,
            n_atoms_padded=A,
            n_systems_padded=S,
            max_neighbors=M,
            dtype=self.dtype,
            extra_keys=self.extra_system_keys,
        )

        targets = {
            name: batch_targets(
                [s.targets[name] for s in samples],
                self.target_infos[name],
                systems,
                A,
                S,
                self.dtype,
            )
            for name in samples[0].targets
            if name in self.target_infos
        }
        extra = {
            name: batch_targets(
                [s.extra_data[name] for s in samples],
                None,
                systems,
                A,
                S,
                self.dtype,
            )
            for name in samples[0].extra_data
        }
        return Batch(systems=system_batch, targets=targets, extra_data=extra)


def _batch_sample_labels(
    sample_kind: str, systems: Sequence[System], A: int, S: int
) -> Labels:
    if sample_kind == "system":
        return Labels.range("system", S)
    values = np.zeros((A, 2), dtype=np.int32)
    values[:, 0] = S - 1  # padding rows point at the padded system slot
    offset = 0
    for sys_i, system in enumerate(systems):
        n = len(system)
        values[offset : offset + n, 0] = sys_i
        values[offset : offset + n, 1] = np.arange(n)
        offset += n
    return Labels(["system", "atom"], values)


def batch_targets(
    per_system: Sequence[TensorMap],
    info: Optional[TargetInfo],
    systems: Sequence[System],
    A: int,
    S: int,
    dtype,
) -> TensorMap:
    """Pad and stack per-system target TensorMaps into one batch TensorMap.

    Per-structure blocks become ``(S, *components, P)`` with the system
    mask; per-atom blocks become ``(A, *components, P)`` with the atom
    mask. Scalar-target gradients follow: ``positions`` -> ``(A, 3, P)``,
    ``strain`` -> ``(S, 3, 3, P)``. Missing values are NaN in the reference
    (NaN-masked losses); here padding is zero + mask=False.
    """
    template = per_system[0]
    n_systems = len(systems)
    atom_counts = [len(s) for s in systems]
    offsets = np.concatenate([[0], np.cumsum(atom_counts)])

    atom_mask = np.zeros((A,), dtype=bool)
    atom_mask[: offsets[-1]] = True
    system_mask = np.zeros((S,), dtype=bool)
    system_mask[:n_systems] = True

    blocks = []
    for key_idx in range(len(template)):
        block_template = template.blocks()[key_idx]
        per_atom = "atom" in block_template.samples.names
        comp_shape = tuple(len(c) for c in block_template.components)
        n_props = len(block_template.properties)

        if per_atom:
            values = np.zeros((A,) + comp_shape + (n_props,), dtype=np.float64)
            # atomic-basis blocks carry only a SUBSET of each system's
            # atoms (those of the block's atom_type): scatter rows by the
            # block's own "atom" sample column and mask the rest out
            subset = any(
                len(tmap.blocks()[key_idx].samples) != n
                for tmap, n in zip(per_system, atom_counts)
            )
            if subset:
                sub_mask = np.zeros((A,), dtype=bool)
                for sys_i, tmap in enumerate(per_system):
                    b = tmap.blocks()[key_idx]
                    atom_col = b.samples.names.index("atom")
                    rows = offsets[sys_i] + np.asarray(
                        b.samples.values[:, atom_col], dtype=np.int64
                    )
                    values[rows] = np.asarray(b.values)
                    sub_mask[rows] = True
                mask = sub_mask
            else:
                for sys_i, tmap in enumerate(per_system):
                    b = tmap.blocks()[key_idx]
                    values[offsets[sys_i] : offsets[sys_i + 1]] = np.asarray(
                        b.values
                    )
                mask = atom_mask
        else:
            values = np.zeros((S,) + comp_shape + (n_props,), dtype=np.float64)
            for sys_i, tmap in enumerate(per_system):
                b = tmap.blocks()[key_idx]
                values[sys_i] = np.asarray(b.values)[0]
            mask = system_mask

        batched = TensorBlock(
            values=jnp.asarray(values, dtype=dtype),
            samples=_batch_sample_labels(
                "atom" if per_atom else "system", systems, A, S
            ),
            components=block_template.components,
            properties=block_template.properties,
            mask=jnp.asarray(mask),
        )

        for grad_name in block_template.gradients_list():
            grad_template = block_template.gradient(grad_name)
            g_props = len(grad_template.properties)
            if grad_name == "positions":
                g_values = np.zeros((A, 3, g_props), dtype=np.float64)
                for sys_i, tmap in enumerate(per_system):
                    g = tmap.blocks()[key_idx].gradient(grad_name)
                    g_values[offsets[sys_i] : offsets[sys_i + 1]] = np.asarray(
                        g.values
                    )
                g_mask = atom_mask
                g_samples = _batch_sample_labels("atom", systems, A, S)
            elif grad_name == "strain":
                g_values = np.zeros((S, 3, 3, g_props), dtype=np.float64)
                for sys_i, tmap in enumerate(per_system):
                    g = tmap.blocks()[key_idx].gradient(grad_name)
                    g_values[sys_i] = np.asarray(g.values)[0]
                g_mask = system_mask
                g_samples = _batch_sample_labels("system", systems, A, S)
            else:
                raise ValueError(f"unsupported gradient '{grad_name}'")
            batched.add_gradient(
                grad_name,
                TensorBlock(
                    values=jnp.asarray(g_values, dtype=dtype),
                    samples=g_samples,
                    components=grad_template.components,
                    properties=grad_template.properties,
                    mask=jnp.asarray(g_mask),
                ),
            )

        blocks.append(batched)

    return TensorMap(template.keys, blocks)
