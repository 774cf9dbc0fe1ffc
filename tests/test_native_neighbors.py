"""Native C++ cell-list neighbor builder vs scipy fallback + brute force."""

import time

import numpy as np
import pytest

from metatrain_tpu.containers import System
from metatrain_tpu.native import get_library, native_neighbor_pairs
from metatrain_tpu.ops.neighbors import _neighbor_pairs_kdtree, neighbor_pairs

from conftest import make_crystal, make_molecule
from test_neighbors import brute_force_pairs


needs_native = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable"
)


def _as_set(centers, neighbors, shifts):
    return set(
        (int(c), int(n), int(s[0]), int(s[1]), int(s[2]))
        for c, n, s in zip(centers, neighbors, shifts)
    )


@needs_native
@pytest.mark.parametrize(
    "maker,cutoff",
    [
        (lambda: make_molecule(12, seed=1), 3.0),
        (lambda: make_crystal(n_cells=1), 3.0),
        (lambda: make_crystal(n_cells=2), 4.5),
        (lambda: make_crystal(n_cells=3), 6.0),  # cutoff > cell/2
    ],
)
def test_native_matches_brute_force(maker, cutoff):
    system = maker()
    got = _as_set(
        *native_neighbor_pairs(
            system.positions, system.cell, system.pbc, cutoff
        )
    )
    expected = brute_force_pairs(system, cutoff, max_shift=3)
    assert got == expected


@needs_native
def test_native_triclinic_and_mixed_pbc():
    rng = np.random.default_rng(3)
    cell = np.array([[6.0, 0, 0], [2.0, 5.0, 0], [1.0, -1.0, 7.0]])
    system = System(
        rng.uniform(0, 5, size=(20, 3)),
        np.full(20, 6),
        cell,
        np.ones(3, dtype=bool),
    )
    got = _as_set(
        *native_neighbor_pairs(system.positions, system.cell, system.pbc, 3.5)
    )
    expected = brute_force_pairs(system, 3.5, max_shift=2)
    assert got == expected

    slab = System(
        rng.uniform(0, 5, size=(15, 3)),
        np.full(15, 6),
        np.diag([5.0, 5.0, 0.0]),
        np.array([True, True, False]),
    )
    got = _as_set(
        *native_neighbor_pairs(slab.positions, slab.cell, slab.pbc, 3.0)
    )
    expected = brute_force_pairs(slab, 3.0, max_shift=2)
    assert got == expected


@needs_native
def test_native_positions_outside_cell():
    system = make_crystal(n_cells=2)
    shifted = System(
        system.positions + np.array([10.0, -7.0, 3.0]),  # far outside cell
        system.types,
        system.cell,
        system.pbc,
    )
    got = _as_set(
        *native_neighbor_pairs(shifted.positions, shifted.cell, shifted.pbc, 4.0)
    )
    reference = _as_set(
        *_neighbor_pairs_kdtree(
            shifted.positions, shifted.cell, shifted.pbc, 4.0
        )
    )
    assert got == reference


@needs_native
def test_native_half_list_dispatch():
    system = make_crystal(n_cells=2)
    c_full, n_full, s_full = neighbor_pairs(
        system.positions, system.cell, system.pbc, 4.0, full_list=True
    )
    c_half, n_half, s_half = neighbor_pairs(
        system.positions, system.cell, system.pbc, 4.0, full_list=False
    )
    assert len(c_full) == 2 * len(c_half)
    full = _as_set(c_full, n_full, s_full)
    half = _as_set(c_half, n_half, s_half)
    mirrored = _as_set(n_half, c_half, -s_half)
    assert half | mirrored == full and not (half & mirrored)


@needs_native
def test_native_is_faster_at_scale():
    system = make_crystal(n_cells=8)  # 2048 atoms
    t0 = time.perf_counter()
    native = native_neighbor_pairs(
        system.positions, system.cell, system.pbc, 4.5
    )
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    fallback = _neighbor_pairs_kdtree(
        system.positions, system.cell, system.pbc, 4.5
    )
    t_kdtree = time.perf_counter() - t0
    assert len(native[0]) == len(fallback[0])
    # native should win comfortably; loose factor to avoid CI flakiness
    assert t_native < t_kdtree


def test_native_nef_scatter_matches_numpy(monkeypatch):
    """The C++ pairs_to_nef_scatter equals the numpy scatter bit-for-bit
    (both slot modes)."""
    import metatrain_tpu.ops.neighbors as nbr_mod
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    rng = np.random.default_rng(5)
    system = System(
        positions=rng.uniform(0, 8, size=(64, 3)),
        types=rng.choice([1, 6], size=64),
        cell=np.eye(3) * 8.0,
        pbc=np.ones(3, dtype=bool),
    )
    for colored in (False, True):
        fast = compute_neighbor_data(system, cutoff=3.0, colored=colored)
        import metatrain_tpu.native as native_mod

        monkeypatch.setattr(
            native_mod, "native_pairs_to_nef", lambda *a, **k: None
        )
        slow = compute_neighbor_data(system, cutoff=3.0, colored=colored)
        monkeypatch.undo()
        np.testing.assert_array_equal(fast.indices, slow.indices)
        np.testing.assert_array_equal(fast.shifts, slow.shifts)
        np.testing.assert_array_equal(fast.mask, slow.mask)
        np.testing.assert_array_equal(fast.reverse, slow.reverse)
        assert fast.colored == slow.colored == colored
