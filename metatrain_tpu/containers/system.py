"""Atomic systems: host records and padded device batches (NEF layout).

TPU-native counterpart of metatomic's ``System`` (reference usage:
``/root/reference/src/metatrain/utils/abc.py:16-21`` and the collate
pipeline at ``utils/data/dataset.py:381-481``). Instead of a list of
variable-size ``System`` objects flowing to the model, the host builds a
single fixed-shape :class:`SystemBatch` -- a struct-of-arrays pytree padded
to bucketed sizes -- so one XLA compilation serves every batch in a bucket.

The neighbor data lives directly in the NEF layout ``(n_atoms_pad,
max_neighbors)`` that PET's reference implementation builds on-the-fly per
batch (``pet/modules/nef.py``, ``pet/modules/structures.py:115-378``); here
it is produced once on the host by the neighbor-list builder and consumed
unchanged by every model.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .labels import Array


@dataclasses.dataclass
class System:
    """A single atomic configuration on the host.

    :param positions: ``(n_atoms, 3)`` float64 Cartesian positions.
    :param types: ``(n_atoms,)`` integer atomic numbers.
    :param cell: ``(3, 3)`` float64 cell matrix (rows are cell vectors);
        zero rows for non-periodic directions, following metatomic.
    :param pbc: ``(3,)`` booleans, one per cell vector.
    :param extra: named per-system or per-atom host data (e.g. ``charge``,
        ``momenta``, ``masses``).
    """

    positions: np.ndarray
    types: np.ndarray
    cell: np.ndarray
    pbc: np.ndarray
    extra: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        self.positions = np.ascontiguousarray(self.positions, dtype=np.float64)
        self.types = np.ascontiguousarray(self.types, dtype=np.int32)
        self.cell = np.ascontiguousarray(self.cell, dtype=np.float64)
        self.pbc = np.ascontiguousarray(self.pbc, dtype=bool)
        if self.positions.ndim != 2 or self.positions.shape[1] != 3:
            raise ValueError(f"positions must be (n, 3), got {self.positions.shape}")
        if self.cell.shape != (3, 3):
            raise ValueError(f"cell must be (3, 3), got {self.cell.shape}")
        if len(self.types) != len(self.positions):
            raise ValueError("types and positions disagree on the number of atoms")

    def __len__(self) -> int:
        return len(self.positions)


@dataclasses.dataclass
class NeighborData:
    """Host-side NEF neighbor data for one system (see ops.neighbors).

    ``colored=True`` marks the colored-slot layout (slots assigned by
    proper edge coloring, ``ops/neighbors.py``): the reversed edge of
    (atom, slot) sits at the SAME slot of the neighbor atom for all but
    a tiny overflow set, enabling the banded MXU permutation kernel
    (``ops/pallas/color_gather.py``)."""

    indices: np.ndarray  # (n_atoms, max_nbrs) int32, padding -> own atom index
    shifts: np.ndarray  # (n_atoms, max_nbrs, 3) int32 cell shifts
    mask: np.ndarray  # (n_atoms, max_nbrs) bool
    reverse: np.ndarray  # (n_atoms, max_nbrs) int32 flat index of the ji edge
    colored: bool = False
    #: sigma-paired slot groups of the grouped-window colored layout
    #: ((base, cap, delta, width, pair), ...) or None (see
    #: ops/neighbors._grouped_slots); the batch extends the last
    #: (overflow) group over the reserved always-masked bucket slots
    color_groups: Optional[tuple] = None

    @property
    def max_neighbors(self) -> int:
        return int(self.indices.shape[1])


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def bucket_size(value: int, ratio: float = 1.25, minimum: int = 8) -> int:
    """Geometric bucketing: smallest ``minimum * ratio**k`` >= value.

    Bounds both the number of distinct compilations (O(log n)) and the
    padding waste (< ratio - 1). Same idea as the reference JAX calculator's
    padding buckets (``experimental/space/calculator.py:19-60``).
    """
    if value <= minimum:
        return minimum
    size = float(minimum)
    while size < value:
        size = max(size * ratio, size + 1)
    return int(np.ceil(size))


def bucket_atoms(value: int, ratio: float = 1.25) -> int:
    """Geometric bucket for the padded atom count, rounded to a multiple
    of 128 so Pallas kernels never re-pad (their atom blocks are <= 128;
    an unaligned A costs two full-array copies per kernel launch)."""
    return _round_up(bucket_size(value, ratio, minimum=128), 128)


def bucket_neighbors(value: int, ratio: float = 1.25) -> int:
    """Geometric bucket for the NEF neighbor width M.

    The result is a multiple of 16 and strictly greater than ``value``:

    - M % 16 == 0 makes (A, M, D) -> (A*M, D) reshapes layout-free for
      both f32 (8-sublane tiles) and bf16 (16-sublane tiles), so the
      row-block stage kernels and the reversed-edge gather run on
      perfectly aligned flat 2D arrays with no relayout copies;
    - the strictly-reserved last slot (always masked) is where PET's
      attention kernel stores the center token, keeping the token count
      T == M sublane-aligned with no concat (see ops/pallas/fused_layer).
    """
    m = bucket_size(max(value, 1), ratio, minimum=7)
    return _round_up(m + 1, 16)


@jax.tree_util.register_pytree_node_class
class SystemBatch:
    """A fixed-shape padded batch of systems, resident on device.

    Array layout (A = padded atoms, S = padded systems, M = max neighbors):

    - ``positions`` (A, 3) float: padding atoms sit at the origin.
    - ``types`` (A,) int32: padding -> 0.
    - ``atom_mask`` (A,) bool.
    - ``system_index`` (A,) int32: system of each atom; padding -> S - 1
      (pointing at a guaranteed-padded system slot keeps segment ops safe).
    - ``cells`` (S, 3, 3) float; ``pbc`` (S, 3) bool; ``system_mask`` (S,) bool.
    - ``nbr_indices`` (A, M) int32: global atom index of each neighbor,
      padding -> the center atom itself (gives zero edge vectors).
    - ``nbr_shifts`` (A, M, 3) int32 cell shift of each edge.
    - ``nbr_mask`` (A, M) bool.
    - ``nbr_reverse`` (A, M) int32: flat index (into A*M) of the reversed
      ``j -> i`` edge; padding -> the edge's own flat index.
    - ``nbr_fixup_src`` / ``nbr_fixup_dst`` (G, K) int32: per kernel
      block, the edge rows whose reversal is NOT slot-preserving-in-band
      under the colored NEF layout (empty when ``color_band == 0``):
      global flat source rows / block-local destination rows, padding
      ``dst == -1``. See ``ops/pallas/color_gather.py``.
    - ``color_band`` (static int, pytree aux): circular atom-index band
      bound for the colored reversed-edge kernel; 0 disables it.
    - ``extra``: dict of named per-system (S, ...) or per-atom (A, ...) data.
    """

    def __init__(
        self,
        positions: Array,
        types: Array,
        atom_mask: Array,
        system_index: Array,
        cells: Array,
        pbc: Array,
        system_mask: Array,
        nbr_indices: Array,
        nbr_shifts: Array,
        nbr_mask: Array,
        nbr_reverse: Array,
        extra: Optional[Dict[str, Array]] = None,
        nbr_fixup_src: Optional[Array] = None,
        nbr_fixup_dst: Optional[Array] = None,
        color_band: int = 0,
        color_groups: tuple = (),
        color_fixup_split: tuple = (0, 0),
    ):
        self.positions = positions
        self.types = types
        self.atom_mask = atom_mask
        self.system_index = system_index
        self.cells = cells
        self.pbc = pbc
        self.system_mask = system_mask
        self.nbr_indices = nbr_indices
        self.nbr_shifts = nbr_shifts
        self.nbr_mask = nbr_mask
        self.nbr_reverse = nbr_reverse
        empty = jnp.zeros((0,), dtype=jnp.int32)
        self.nbr_fixup_src = empty if nbr_fixup_src is None else nbr_fixup_src
        self.nbr_fixup_dst = empty if nbr_fixup_dst is None else nbr_fixup_dst
        self.color_band = int(color_band)
        self.color_groups = tuple(color_groups)
        self.color_fixup_split = tuple(color_fixup_split)
        self.extra = dict(extra or {})

    # -- pytree ------------------------------------------------------------

    _FIELDS = (
        "positions",
        "types",
        "atom_mask",
        "system_index",
        "cells",
        "pbc",
        "system_mask",
        "nbr_indices",
        "nbr_shifts",
        "nbr_mask",
        "nbr_reverse",
        "nbr_fixup_src",
        "nbr_fixup_dst",
    )

    def tree_flatten(self):
        extra_keys = tuple(sorted(self.extra.keys()))
        children = tuple(getattr(self, f) for f in self._FIELDS) + tuple(
            self.extra[k] for k in extra_keys
        )
        return children, (
            extra_keys, self.color_band, self.color_groups,
            self.color_fixup_split,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        extra_keys, color_band, color_groups, color_fixup_split = aux
        obj = object.__new__(cls)
        for name, child in zip(cls._FIELDS, children[: len(cls._FIELDS)]):
            setattr(obj, name, child)
        obj.color_band = color_band
        obj.color_groups = color_groups
        obj.color_fixup_split = color_fixup_split
        obj.extra = dict(zip(extra_keys, children[len(cls._FIELDS):]))
        return obj

    def replace(self, **updates) -> "SystemBatch":
        """Functional update (used by the autograd engine to thread
        differentiable positions/cells through the forward pass)."""
        new = object.__new__(SystemBatch)
        for name in self._FIELDS:
            setattr(new, name, updates.pop(name, getattr(self, name)))
        new.color_band = updates.pop("color_band", self.color_band)
        new.color_groups = updates.pop("color_groups", self.color_groups)
        new.color_fixup_split = updates.pop(
            "color_fixup_split", self.color_fixup_split
        )
        new.extra = updates.pop("extra", dict(self.extra))
        if updates:
            raise TypeError(f"unknown fields {sorted(updates)}")
        return new

    # -- info -----------------------------------------------------------------

    @property
    def n_atoms_padded(self) -> int:
        return int(self.positions.shape[0])

    @property
    def n_systems_padded(self) -> int:
        return int(self.cells.shape[0])

    @property
    def max_neighbors(self) -> int:
        return int(self.nbr_indices.shape[1])

    @property
    def n_atoms(self) -> Array:
        return jnp.sum(self.atom_mask.astype(jnp.int32))

    @property
    def n_atoms_per_system(self) -> Array:
        return jax.ops.segment_sum(
            self.atom_mask.astype(jnp.int32),
            self.system_index,
            num_segments=self.n_systems_padded,
        )

    def __repr__(self) -> str:
        return (
            f"SystemBatch(A={self.n_atoms_padded}, S={self.n_systems_padded}, "
            f"M={self.max_neighbors}, extra={sorted(self.extra)})"
        )

    # -- geometry --------------------------------------------------------------

    def edge_vectors(
        self, positions: Optional[Array] = None, cells: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        """Edge vectors and distances in NEF layout.

        :param positions: override positions (used by the autograd engine to
            thread differentiable positions through).
        :param cells: override cells (threaded through for the strain trick).
        :return: ``(vectors, distances)`` of shapes (A, M, 3) and (A, M).
            Masked slots have zero vectors and distance ~0.
        """
        pos = self.positions if positions is None else positions
        cell = self.cells if cells is None else cells
        atom_cells = cell[self.system_index]  # (A, 3, 3)
        # HIGHEST precision: with bf16-default matmuls on TPU the shift*cell
        # product would corrupt edge vectors by ~1e-2 Angstrom.
        shift_contrib = jnp.einsum(
            "amk,akc->amc",
            self.nbr_shifts.astype(pos.dtype),
            atom_cells,
            precision=jax.lax.Precision.HIGHEST,
        )
        vectors = (
            _gather_neighbor_positions(pos, self.nbr_indices, self.nbr_reverse)
            - pos[:, None, :]
            + shift_contrib
        )
        vectors = jnp.where(self.nbr_mask[:, :, None], vectors, 0.0)
        distances = jnp.sqrt(jnp.sum(vectors * vectors, axis=-1) + 1e-15)
        return vectors, distances


def _gather_neighbor_positions(pos, nbr_indices, nbr_reverse):
    """``pos[nbr_indices]`` with a scatter-free transpose.

    Forward: a direct row gather from the SMALL (A, 3) source (~2x
    faster than gathering from a broadcast (A*M, 3) array: XLA reads one
    full tile per gathered row either way, but the small source stays
    resident).

    Transpose: the generic transpose is a duplicate-index scatter-add
    (~4 ms at bench shape). Because ``nbr_reverse`` is an involutive edge
    permutation whose reversed slot's CENTER equals ``nbr_indices[i, m]``
    (padded slots self-map and carry zero cotangents), the exact
    transpose is ``dpos[p] = sum_m dvec[reverse(p, m)]`` -- an edge
    reversal followed by a window sum, both with natural autodiff rules
    (so grad-of-grad and jacfwd keep working).
    """
    from ..ops.involution import nbr_gather

    return nbr_gather(pos, nbr_indices, nbr_reverse)


def colored_fixups(
    nbr_indices: np.ndarray,
    nbr_reverse: np.ndarray,
    feature_dim: int = 128,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Band bound + per-block fixup lists for the colored reversed-edge
    kernel.

    Host-side mirror of the kernel's window arithmetic
    (``ops/pallas/color_gather.py``): a row (a, m) is kernel-servable iff
    its reversal is slot-preserving (``reverse == indices * M + m``, the
    colored-layout invariant) AND the matched atom lies in the circular
    band window of a's block. Everything else -- coloring overflow,
    periodic self-image pairs, band outliers -- goes on the fixup lists,
    patched INSIDE the kernel by a per-block one-hot correction matmul
    (an XLA row scatter costs ~2 ms flat at these array sizes; the
    in-kernel patch is ~free).

    Band selection minimizes a cost model over measured v5e rates: the
    banded one-hot matmul scales with the window width W, the in-kernel
    fixup matmul with the bucketed per-block fixup width K (so a wider
    band that brings the fixup count down to the coloring-overflow floor
    usually wins). Returns ``(band, fixup_src, fixup_dst)`` with shapes
    (G, K): per kernel block, GLOBAL flat source rows and BLOCK-LOCAL
    destination rows (``m * BA + a_local``); padding entries have
    ``dst == -1`` (match nothing, patch nothing). ``band == 0`` means
    the plain gather is estimated faster than every supported geometry
    (caller falls back).
    """
    from ..ops.pallas.color_gather import (
        BAND_BUCKETS,
        GATHER_SECONDS_PER_ROW,
        MATMUL_FLOPS_PER_SECOND,
        kernel_geometry,
        local_band_index,
    )

    A, M = nbr_indices.shape
    nbr = nbr_indices.astype(np.int64)
    col = np.arange(M, dtype=np.int64)[None, :]
    slot_preserving = nbr_reverse.astype(np.int64) == nbr * M + col

    a_idx = np.arange(A, dtype=np.int64)[:, None]
    # circular offset of the matched atom from its block start; depends
    # only on BA, so compute once per geometry, not per band: the band
    # condition is then u < BA + mg  OR  u >= A - mg
    u_by_ba: dict = {}
    plain_cost = A * M * GATHER_SECONDS_PER_ROW
    # Select the band by modeled cost under the PRODUCTION compute dtype
    # (bf16): candidates are bands whose double-buffered scratch fits the
    # kernel VMEM budget at 2 bytes/element. An f32 run whose scratch
    # does not fit falls back to the plain XLA gather at runtime
    # (color_gather.use_kernel re-checks with the real dtype) -- measured
    # at the 10k-atom bench that gather (plain_cost ~5.8 ms) is within
    # ~10% of the best f32-feasible kernel band (5.3 ms), while forcing
    # an f32-feasible band onto the bf16 path costs 2.6x (band 640 @
    # 5.3 ms vs band 896 @ 2.1 ms: the narrow band's K=3328 in-kernel
    # fixup matmul dwarfs the width it saves).
    best = (plain_cost, 0, None)  # (cost, band, geom)
    for band in BAND_BUCKETS:
        geom = kernel_geometry(A, band)
        if geom is None:
            continue
        BA, mg, W = geom
        scratch_per_byte = 2 * M * W * feature_dim
        if scratch_per_byte * 2 > _color_vmem_budget():
            continue  # exceeds VMEM even in bf16
        if BA not in u_by_ba:
            a0 = (a_idx // BA) * BA
            u_by_ba[BA] = ((nbr - a0) % A).astype(np.int32)
        u = u_by_ba[BA]
        ok = slot_preserving & ((u < BA + mg) | (u >= A - mg))
        G = A // BA
        per_block_bad = (~ok).reshape(G, BA * M).sum(axis=1)
        K = _fixup_width_from_max(int(per_block_bad.max(initial=0)))
        cost = (
            2.0 * M * A * (W + K) * feature_dim / MATMUL_FLOPS_PER_SECOND
            + G * K * GATHER_SECONDS_PER_ROW
        )
        if cost < best[0]:
            best = (cost, band, geom)
    if best[1] == 0:
        return 0, np.zeros((0, 0), np.int32), np.zeros((0, 0), np.int32)

    _, band, (BA, mg, W) = best
    u = u_by_ba[BA]
    ok = slot_preserving & ((u < BA + mg) | (u >= A - mg))
    rows = np.nonzero(~ok.reshape(-1))[0]
    G = A // BA
    blocks = rows // (BA * M)  # nondecreasing (rows sorted)
    K = _fixup_width(blocks, G)
    src = np.zeros((G, K), dtype=np.int32)
    dst = np.full((G, K), -1, dtype=np.int32)
    a = rows // M
    m = rows % M
    counts = np.bincount(blocks, minlength=G)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    k = np.arange(len(rows), dtype=np.int64) - starts[blocks]
    src[blocks, k] = nbr_reverse.reshape(-1)[rows]
    dst[blocks, k] = m * BA + (a - blocks * BA)
    return band, src, dst


def grouped_fixups(
    nbr_indices: np.ndarray,
    nbr_reverse: np.ndarray,
    nbr_mask: np.ndarray,
    groups: tuple,
    feature_dim: int = 128,
) -> Tuple[tuple, np.ndarray, np.ndarray]:
    """Per-block fixup lists for the grouped-window colored kernel.

    Host-side mirror of ``ops/pallas/color_gather._grouped_kernel``: a
    row (a, m) with m in group g (slot index k = m - base_g) is
    kernel-servable iff its reversal lands at the sigma-paired slot
    (``reverse == indices * M + pair_base_g + k``) AND the matched atom
    lies in the group's circular window of a's block. Masked rows of
    non-self-paired groups are DON'T-CARE (the kernel emits unspecified
    values there; consumers mask them and their cotangents are exactly
    zero), so they stay off the fixup lists; masked rows of self-paired
    groups self-serve exactly. Everything else is patched in-kernel from
    the fixup lists, exactly as in :func:`colored_fixups`.

    Returns ``(groups, fixup_src, fixup_dst, fixup_split)`` where
    ``fixup_split = (K_A, ov_base)`` is the range-split fixup spec
    (``(0, 0)`` for a single full-range tier), or
    ``((), empty, empty, (0, 0))`` when the plain gather is modeled
    faster (the caller falls back).
    """
    from ..ops.pallas.color_gather import (
        GATHER_SECONDS_PER_ROW,
        MATMUL_FLOPS_PER_SECOND,
        grouped_geometry,
    )

    A, M = nbr_indices.shape
    empty = np.zeros((0, 0), np.int32)
    geom = grouped_geometry(A, groups, M)
    if geom is None:
        return (), empty, empty, (0, 0)
    BA, _ = geom
    G = A // BA

    nbr = nbr_indices.astype(np.int64)
    m_idx = np.arange(M, dtype=np.int64)[None, :]
    a_idx = np.arange(A, dtype=np.int64)[:, None]
    blk0 = (a_idx // BA) * BA

    sigma = np.empty(M, dtype=np.int64)
    delta_of = np.empty(M, dtype=np.int64)
    width_of = np.empty(M, dtype=np.int64)
    selfpaired = np.empty(M, dtype=bool)
    for gi, (base, cap, delta, width, pair) in enumerate(groups):
        sl = slice(base, base + cap)
        sigma[sl] = groups[pair][0] + np.arange(cap)
        delta_of[sl] = delta
        width_of[sl] = width
        selfpaired[sl] = pair == gi

    slot_ok = nbr_reverse.astype(np.int64) == nbr * M + sigma[None, :]
    l = (nbr - blk0 - delta_of[None, :] + width_of[None, :]) % A
    in_window = l < BA + 2 * width_of[None, :]
    servable = slot_ok & in_window
    dont_care = (~np.asarray(nbr_mask, bool)) & (~selfpaired[None, :])
    bad = ~(servable | dont_care)

    rows = np.nonzero(bad.reshape(-1))[0]
    blocks = rows // (BA * M)
    a_of = rows // M
    m_of = rows % M

    # Range-restricted fixup (ops/pallas/color_gather._grouped_kernel):
    # the host fill routes unassigned edges into the highest free slots
    # (the overflow group sits at the end of the slot space), so fixup
    # destinations concentrate in the top slots -- the correction matmul
    # only spans rows [base_r * BA, M * BA), typically 3-5x fewer.
    base_r = int(m_of.min(initial=M))
    K = _fixup_width(blocks, G)

    # cost vs the plain XLA gather (same constants as colored_fixups)
    row_cost = sum(
        cap * (BA + 2 * width) for (_, cap, _, width, _) in groups
    )
    fix_cost = (M - base_r) * K
    cost = (
        2.0 * BA * feature_dim * (row_cost + fix_cost) * G
        / MATMUL_FLOPS_PER_SECOND
        + G * K * GATHER_SECONDS_PER_ROW
    )
    if cost >= A * M * GATHER_SECONDS_PER_ROW:
        return (), empty, empty, (0, 0)

    src = np.zeros((G, max(K, 0)), dtype=np.int32)
    dst = np.full((G, max(K, 0)), -1, dtype=np.int32)
    if K:
        counts = np.bincount(blocks, minlength=G)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(len(rows), dtype=np.int64) - starts[blocks]
        src[blocks, k] = nbr_reverse.reshape(-1)[rows]
        dst[blocks, k] = (m_of - base_r) * BA + (a_of - blocks * BA)
    return tuple(groups), src, dst, (int(K) if 0 < base_r else 0, int(base_r))


def _fixup_width(blocks: np.ndarray, n_blocks: int) -> int:
    """Bucketed per-block fixup list width: the max per-block count,
    rounded up to a lane multiple so the in-kernel one-hot matmul stays
    MXU-aligned and K (a static kernel parameter) is coarse-grained."""
    if len(blocks) == 0:
        return 0
    max_count = int(np.bincount(blocks, minlength=max(n_blocks, 1)).max())
    return _fixup_width_from_max(max_count)


def _fixup_width_from_max(max_count: int) -> int:
    if max_count == 0:
        return 0
    return _round_up(max(max_count, 128), 128)


def _color_vmem_budget() -> int:
    from ..ops.pallas.color_gather import _VMEM_BUDGET

    return _VMEM_BUDGET


def batch_from_systems(
    systems: Sequence[System],
    neighbors: Sequence[NeighborData],
    n_atoms_padded: Optional[int] = None,
    n_systems_padded: Optional[int] = None,
    max_neighbors: Optional[int] = None,
    dtype=jnp.float32,
    bucket_ratio: float = 1.25,
    extra_keys: Sequence[str] = (),
) -> SystemBatch:
    """Assemble host systems + NEF neighbor data into one padded batch.

    This replaces the reference's serialize-into-a-blob CollateFn
    (``utils/data/dataset.py:381-445``, a torch-DataLoader workaround that
    is intentionally NOT ported) with direct construction of fixed-shape
    arrays. Padded atoms point at a padded system slot; padded neighbor
    slots self-reference so downstream gathers stay in-bounds.
    """
    n_systems = len(systems)
    if n_systems == 0:
        raise ValueError("cannot batch zero systems")
    if len(neighbors) != n_systems:
        raise ValueError("need one NeighborData per system")

    total_atoms = sum(len(s) for s in systems)
    m_required = max((n.max_neighbors for n in neighbors), default=1)

    A = n_atoms_padded or bucket_atoms(total_atoms, bucket_ratio)
    # reserve one always-padded system slot as the padding-atom target
    S = n_systems_padded or bucket_size(n_systems + 1, bucket_ratio, minimum=2)
    M = max_neighbors or bucket_neighbors(m_required, bucket_ratio)
    if A < total_atoms:
        raise ValueError(f"n_atoms_padded={A} < total atoms {total_atoms}")
    if S < n_systems + 1:
        raise ValueError(f"n_systems_padded={S} too small for {n_systems} systems")
    if M < m_required + 1:
        # one slot is strictly reserved (always masked): PET's fused
        # attention kernel stores the center token there (bucket_neighbors)
        raise ValueError(
            f"max_neighbors={M} must exceed the largest real neighbor "
            f"count {m_required} (the last NEF slot is reserved)"
        )

    positions = np.zeros((A, 3), dtype=np.float64)
    types = np.zeros((A,), dtype=np.int32)
    atom_mask = np.zeros((A,), dtype=bool)
    system_index = np.full((A,), S - 1, dtype=np.int32)
    cells = np.zeros((S, 3, 3), dtype=np.float64)
    pbc = np.zeros((S, 3), dtype=bool)
    system_mask = np.zeros((S,), dtype=bool)

    nbr_indices = np.tile(np.arange(A, dtype=np.int32)[:, None], (1, M))
    nbr_shifts = np.zeros((A, M, 3), dtype=np.int32)
    nbr_mask = np.zeros((A, M), dtype=bool)
    # padded slots reverse to themselves (their own flat index)
    nbr_reverse = (
        np.arange(A, dtype=np.int32)[:, None] * M + np.arange(M, dtype=np.int32)[None, :]
    )

    offset = 0
    for sys_i, (system, nbr) in enumerate(zip(systems, neighbors)):
        n = len(system)
        m = nbr.max_neighbors
        sl = slice(offset, offset + n)
        positions[sl] = system.positions
        types[sl] = system.types
        atom_mask[sl] = True
        system_index[sl] = sys_i
        cells[sys_i] = system.cell
        pbc[sys_i] = system.pbc
        system_mask[sys_i] = True

        # neighbor indices are local to the system -> offset to global;
        # masked slots self-reference the (offset) center atom
        local_idx = np.where(
            nbr.mask, nbr.indices, np.arange(n, dtype=np.int32)[:, None]
        )
        nbr_indices[sl, :m] = local_idx + offset
        nbr_shifts[sl, :m, :] = np.where(nbr.mask[..., None], nbr.shifts, 0)
        nbr_mask[sl, :m] = nbr.mask
        # reverse indices are flat into (n, m_local); remap to flat (A, M)
        rev_atom = nbr.reverse // m
        rev_slot = nbr.reverse % m
        remapped = (rev_atom + offset) * M + rev_slot
        own_flat = (
            (np.arange(n, dtype=np.int64)[:, None] + offset) * M
            + np.arange(m, dtype=np.int64)[None, :]
        )
        nbr_reverse[sl, :m] = np.where(nbr.mask, remapped, own_flat).astype(np.int32)

        offset += n

    extra: Dict[str, np.ndarray] = {}
    for key in extra_keys:
        per_system_values = []
        for system in systems:
            if key not in system.extra:
                raise KeyError(f"system missing extra data '{key}'")
            per_system_values.append(np.asarray(system.extra[key]))
        sample = per_system_values[0]
        if sample.ndim == 0:  # per-system scalar
            arr = np.zeros((S,), dtype=sample.dtype)
            for i, v in enumerate(per_system_values):
                arr[i] = v
        else:  # per-atom array
            arr = np.zeros((A,) + sample.shape[1:], dtype=sample.dtype)
            off = 0
            for system, v in zip(systems, per_system_values):
                arr[off : off + len(system)] = v
                off += len(system)
        extra[key] = arr

    color_band = 0
    color_groups: tuple = ()
    color_fixup_split: tuple = (0, 0)
    fixup_src = fixup_dst = np.zeros((0,), np.int32)
    if systems and all(n.colored for n in neighbors):
        from ..ops.pallas.color_gather import MIN_ROWS

        if A * M >= MIN_ROWS:
            nl_groups = neighbors[0].color_groups
            if len(systems) == 1 and nl_groups:
                # extend the last (wide self-paired) group over the
                # reserved always-masked bucket slots so the groups
                # partition the batch width exactly
                width_total = sum(g[1] for g in nl_groups)
                last = nl_groups[-1]
                padded = nl_groups[:-1] + (
                    (last[0], last[1] + (M - width_total), last[2],
                     last[3], last[4]),
                )
                (color_groups, fixup_src, fixup_dst,
                 color_fixup_split) = grouped_fixups(
                    nbr_indices, nbr_reverse, nbr_mask, padded
                )
            if not color_groups:
                color_band, fixup_src, fixup_dst = colored_fixups(
                    nbr_indices, nbr_reverse
                )

    def dev(x, dt=None):
        return jnp.asarray(x, dtype=dt)

    return SystemBatch(
        positions=dev(positions, dtype),
        types=dev(types),
        atom_mask=dev(atom_mask),
        system_index=dev(system_index),
        cells=dev(cells, dtype),
        pbc=dev(pbc),
        system_mask=dev(system_mask),
        nbr_indices=dev(nbr_indices),
        nbr_shifts=dev(nbr_shifts),
        nbr_mask=dev(nbr_mask),
        nbr_reverse=dev(nbr_reverse),
        extra={k: dev(v) for k, v in extra.items()},
        nbr_fixup_src=dev(fixup_src),
        nbr_fixup_dst=dev(fixup_dst),
        color_band=color_band,
        color_groups=color_groups,
        color_fixup_split=color_fixup_split,
    )


def systems_to_lists(batch: SystemBatch) -> List[System]:
    """Host-side inverse of :func:`batch_from_systems` (for writers/tests)."""
    positions = np.asarray(jax.device_get(batch.positions))
    types = np.asarray(jax.device_get(batch.types))
    atom_mask = np.asarray(jax.device_get(batch.atom_mask))
    system_index = np.asarray(jax.device_get(batch.system_index))
    cells = np.asarray(jax.device_get(batch.cells))
    pbc = np.asarray(jax.device_get(batch.pbc))
    system_mask = np.asarray(jax.device_get(batch.system_mask))

    systems = []
    for sys_i in np.nonzero(system_mask)[0]:
        sel = atom_mask & (system_index == sys_i)
        systems.append(
            System(
                positions=positions[sel],
                types=types[sel],
                cell=cells[sys_i],
                pbc=pbc[sys_i],
            )
        )
    return systems
