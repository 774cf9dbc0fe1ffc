import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.containers import (
    Labels,
    System,
    TensorBlock,
    TensorMap,
    batch_from_systems,
    bucket_size,
    systems_to_lists,
)
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_crystal, make_molecule


def test_labels_basics():
    labels = Labels.range("system", 5)
    assert len(labels) == 5
    assert labels.names == ("system",)
    assert labels.position([3]) == 3
    assert labels.position([7]) == -1

    two = Labels(["system", "atom"], np.array([[0, 0], [0, 1], [1, 0]]))
    assert list(two.column("atom")) == [0, 1, 0]
    assert two.position([1, 0]) == 2


def test_labels_hash_eq():
    a = Labels.range("x", 3)
    b = Labels.range("x", 3)
    assert a == b and hash(a) == hash(b)
    c = Labels.range("y", 3)
    assert a != c


def test_labels_pytree():
    labels = Labels(["system"], jnp.arange(4).reshape(-1, 1))
    leaves, treedef = jax.tree_util.tree_flatten(labels)
    assert len(leaves) == 1
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.names == ("system",)


def test_tensormap_roundtrip_through_jit():
    block = TensorBlock(
        values=jnp.ones((4, 1)),
        samples=Labels.range("system", 4),
        components=[],
        properties=Labels(["energy"], np.zeros((1, 1), dtype=np.int32)),
        mask=jnp.array([True, True, True, False]),
    )
    grad = TensorBlock(
        values=jnp.zeros((4, 3, 1)),
        samples=Labels.range("atom", 4),
        components=[Labels(["xyz"], np.arange(3).reshape(-1, 1))],
        properties=Labels(["energy"], np.zeros((1, 1), dtype=np.int32)),
    )
    block.add_gradient("positions", grad)
    tmap = TensorMap(Labels.single(), [block])

    @jax.jit
    def double(t):
        return t.map_values(lambda v: 2 * v)

    out = double(tmap)
    assert isinstance(out, TensorMap)
    b = out.block()
    np.testing.assert_allclose(np.asarray(b.values), 2.0)
    np.testing.assert_allclose(np.asarray(b.gradient("positions").values), 0.0)
    assert b.gradients_list() == ["positions"]


def test_tensormap_block_selection():
    keys = Labels(["center_type"], np.array([[1], [6]], dtype=np.int32))
    blocks = [
        TensorBlock(
            jnp.full((2, 1), float(z)),
            Labels.range("system", 2),
            [],
            Labels.range("p", 1),
        )
        for z in (1, 6)
    ]
    tmap = TensorMap(keys, blocks)
    assert float(tmap.block(center_type=6).values[0, 0]) == 6.0
    assert float(tmap.block([1]).values[0, 0]) == 1.0


def test_bucket_size_monotonic():
    sizes = [bucket_size(n) for n in range(1, 2000)]
    assert all(s >= n for n, s in zip(range(1, 2000), sizes))
    assert len(set(sizes)) < 40  # O(log n) distinct buckets


def test_batch_from_systems_roundtrip():
    systems = [make_molecule(6, seed=1), make_molecule(9, seed=2)]
    nbrs = [compute_neighbor_data(s, cutoff=4.0) for s in systems]
    batch = batch_from_systems(systems, nbrs)

    assert batch.n_atoms_padded >= 15
    assert int(batch.n_atoms) == 15
    counts = np.asarray(batch.n_atoms_per_system)
    assert counts[0] == 6 and counts[1] == 9
    # padded system slot is empty
    assert not bool(np.asarray(batch.system_mask)[-1])

    back = systems_to_lists(batch)
    assert len(back) == 2
    np.testing.assert_allclose(
        back[0].positions, systems[0].positions, atol=1e-6
    )
    np.testing.assert_array_equal(back[1].types, systems[1].types)


def test_batch_edge_vectors_match_direct_computation():
    system = make_crystal(n_cells=1)
    nbr = compute_neighbor_data(system, cutoff=3.0)
    batch = batch_from_systems([system], [nbr])
    vectors, distances = batch.edge_vectors()
    vectors = np.asarray(vectors)
    distances = np.asarray(distances)
    mask = np.asarray(batch.nbr_mask)

    # all real distances within cutoff, all padded vectors zero
    assert (distances[mask] <= 3.0 + 1e-6).all()
    assert (distances[mask] > 0.1).all()
    np.testing.assert_allclose(vectors[~mask[: len(vectors)]], 0.0)

    # spot check one edge against direct formula
    idx = np.argwhere(mask)[0]
    i, slot = idx
    j = int(np.asarray(batch.nbr_indices)[i, slot])
    shift = np.asarray(batch.nbr_shifts)[i, slot]
    expected = (
        system.positions[j]
        - system.positions[i]
        + shift @ system.cell
    )
    np.testing.assert_allclose(vectors[i, slot], expected, rtol=1e-5, atol=1e-5)


def test_batch_reverse_edges():
    system = make_crystal(n_cells=1)
    nbr = compute_neighbor_data(system, cutoff=3.0)
    batch = batch_from_systems([system], [nbr])
    vectors, _ = batch.edge_vectors()
    vectors = np.asarray(vectors)
    A, M = batch.nbr_mask.shape
    flat = vectors.reshape(A * M, 3)
    reversed_vectors = flat[np.asarray(batch.nbr_reverse)]
    mask = np.asarray(batch.nbr_mask)
    # edge ji vector is minus edge ij vector
    np.testing.assert_allclose(
        reversed_vectors[mask], -vectors[mask], rtol=1e-5, atol=1e-6
    )


def test_batch_extra_data():
    systems = [make_molecule(4, seed=3), make_molecule(5, seed=4)]
    systems[0].extra["charge"] = np.asarray(1.0)
    systems[1].extra["charge"] = np.asarray(-1.0)
    nbrs = [compute_neighbor_data(s, cutoff=4.0) for s in systems]
    batch = batch_from_systems(systems, nbrs, extra_keys=["charge"])
    charge = np.asarray(batch.extra["charge"])
    assert charge[0] == 1.0 and charge[1] == -1.0

    with pytest.raises(KeyError):
        batch_from_systems(systems, nbrs, extra_keys=["missing"])


def test_nbr_reverse_is_involution_and_vjp_matches():
    """reverse_edges' custom VJP (gather instead of scatter-add) is only
    valid because nbr_reverse is an involutive permutation: check both."""
    import jax
    import jax.numpy as jnp

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.models.pet.modules import (
        _reverse_edges_impl,
        reverse_edges,
    )
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    from conftest import make_crystal

    system = make_crystal(n_cells=2, seed=5)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr])
    rev = np.asarray(batch.nbr_reverse).reshape(-1)

    # permutation + involution
    assert np.array_equal(np.sort(rev), np.arange(rev.size))
    np.testing.assert_array_equal(rev[rev], np.arange(rev.size))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=batch.nbr_indices.shape + (8,)))
    g = jnp.asarray(rng.normal(size=x.shape))

    def loss_custom(x):
        return jnp.sum(
            reverse_edges(x, {"nbr_reverse": batch.nbr_reverse}) * g
        )

    def loss_generic(x):
        return jnp.sum(_reverse_edges_impl(x, batch.nbr_reverse) * g)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(x)),
        np.asarray(jax.grad(loss_generic)(x)),
        rtol=1e-12,
    )
