"""Colored-slot NEF layout + banded reversed-edge permutation kernel.

Validates, against the plain packed layout and the plain flat gather:
- the colored builder emits the same edge SET with an involutive,
  overwhelmingly slot-preserving reverse index;
- the banded kernel (interpret mode) + fixup patch equals
  ``x.reshape(A*M, D)[rev]`` BITWISE for every row;
- the primitive's autodiff transpose is the same permutation;
- PET forward/force results agree between colored and packed batches.

Reference counterpart: the reversed-edge machinery in
``/root/reference/src/metatrain/pet/modules/nef.py:221-251``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatrain_tpu.containers import (
    System,
    batch_from_systems,
    bucket_atoms,
    bucket_neighbors,
)
from metatrain_tpu.containers.system import colored_fixups
from metatrain_tpu.native import native_color_edges
from metatrain_tpu.ops.neighbors import compute_neighbor_data


def _fcc_system(n_cells=8, a=3.6, jitter=0.05, seed=0):
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    rng = np.random.default_rng(seed)
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(n_cells)
            for j in range(n_cells)
            for k in range(n_cells)
        ]
    )
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(
        0, jitter, size=(len(frac), 3)
    )
    return System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )


def _native_available():
    return (
        native_color_edges(
            np.array([0], np.int32), np.array([1], np.int32), 2, 4
        )
        is not None
    )


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native color_edges unavailable"
)


@pytest.fixture(scope="module")
def colored_batch():
    system = _fcc_system()
    nbr = compute_neighbor_data(system, cutoff=4.5, colored=True)
    assert nbr.colored
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=bucket_atoms(len(system), 1.05),
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    return system, nbr, batch


def _edge_set(nbr):
    rows = np.nonzero(nbr.mask)
    return set(
        zip(
            rows[0].tolist(),
            nbr.indices[rows].tolist(),
            map(tuple, nbr.shifts[rows].tolist()),
        )
    )


def test_colored_layout_invariants(colored_batch):
    system, nbr, batch = colored_batch
    plain = compute_neighbor_data(system, cutoff=4.5)
    assert _edge_set(plain) == _edge_set(nbr)

    A, M = nbr.indices.shape
    flat_rev = nbr.reverse.astype(np.int64).reshape(-1)
    assert (flat_rev[flat_rev] == np.arange(A * M)).all()

    col = np.arange(M, dtype=np.int64)[None, :]
    slot_preserving = (
        nbr.reverse.astype(np.int64) == nbr.indices.astype(np.int64) * M + col
    )
    assert slot_preserving[nbr.mask].mean() > 0.99

    assert batch.color_band > 0
    assert batch.nbr_fixup_src.shape == batch.nbr_fixup_dst.shape


@pytest.mark.parametrize(
    "ext,roll", [("0", "0"), ("1", "0"), ("0", "1")]
)
def test_kernel_matches_flat_gather_bitwise(
    colored_batch, ext, roll, monkeypatch
):
    # all three band layouts (wrap-aware DMAs, extended HBM copy, and the
    # rolling ring buffer) are live configurations: bench.py A/Bs them on
    # hardware
    monkeypatch.setenv("MTT_COLOR_EXT", ext)
    monkeypatch.setenv("MTT_COLOR_ROLL", roll)
    from metatrain_tpu.ops.pallas.color_gather import _kernel_impl

    _, _, batch = colored_batch
    A, M = batch.nbr_indices.shape
    D = 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)

    out = np.asarray(
        _kernel_impl(
            x,
            batch.nbr_indices,
            batch.nbr_fixup_src,
            batch.nbr_fixup_dst,
            batch.color_band,
            interpret=True,
        )
    )
    rev = np.asarray(batch.nbr_reverse).reshape(-1)
    ref = np.asarray(x).reshape(A * M, D)[rev].reshape(A, M, D)
    assert (out == ref).all()


def test_transpose_and_grad_of_grad(colored_batch):
    from metatrain_tpu.ops.pallas.color_gather import colored_permute

    _, _, batch = colored_batch
    A, M = batch.nbr_indices.shape
    D = 128
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    rev_flat = batch.nbr_reverse.reshape(-1)

    def perm(x):
        return colored_permute(
            x,
            rev_flat,
            batch.nbr_indices,
            batch.nbr_fixup_src,
            batch.nbr_fixup_dst,
            band=batch.color_band,
        )

    rev = np.asarray(rev_flat)
    g = jax.grad(lambda x: jnp.sum(perm(x) * w))(x)
    gref = np.asarray(w).reshape(A * M, D)[rev].reshape(A, M, D)
    assert (np.asarray(g) == gref).all()

    # grad-of-grad: d/dw of sum(grad * w2) flows through the transpose op
    w2 = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    gg = jax.grad(
        lambda w: jnp.sum(jax.grad(lambda x: jnp.sum(perm(x) * w))(x) * w2)
    )(w)
    ggref = np.asarray(w2).reshape(A * M, D)[rev].reshape(A, M, D)
    assert (np.asarray(gg) == ggref).all()


def test_pet_colored_vs_packed_parity(colored_batch):
    """PET energies+forces must not depend on the NEF slot assignment."""
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.models.pet import PET

    system, nbr_col, batch_col = colored_batch
    nbr_plain = compute_neighbor_data(system, cutoff=4.5)
    batch_plain = batch_from_systems(
        [system],
        [nbr_plain],
        n_atoms_padded=batch_col.n_atoms_padded,
        n_systems_padded=2,
        max_neighbors=batch_col.max_neighbors,
        dtype=jnp.float32,
    )

    dataset_info = DatasetInfo(
        length_unit="angstrom",
        atomic_types=[29],
        targets={
            "energy": get_energy_target_info(
                "eV", add_position_gradients=True
            )
        },
    )
    model = PET(
        {"d_pet": 32, "d_node": 32, "d_feedforward": 64, "num_gnn_layers": 2},
        dataset_info,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    infos = {"energy": dataset_info.targets["energy"]}
    results = []
    for b in (batch_plain, batch_col):
        preds = evaluate_model(
            model.forward, params, b, infos, is_training=False
        )
        block = preds["energy"].block()
        results.append(
            (
                np.asarray(block.values),
                np.asarray(block.gradient("positions").values),
            )
        )
    (e0, f0), (e1, f1) = results
    np.testing.assert_allclose(e1, e0, rtol=1e-5, atol=1e-5)
    # atol covers f32 reduction-order noise between slot layouts on
    # near-zero components (force scale here is ~50 eV/A; the q-side
    # attention regrouping shifts a couple of components by ~2e-5)
    np.testing.assert_allclose(f1, f0, rtol=1e-4, atol=1e-4)
