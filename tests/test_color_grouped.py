"""Grouped-window colored layout: sigma-paired slot groups with
per-group narrow windows (r4 perf lever; STATUS.md r3 design).

Validates:
- the discovery picks the grouped layout for a large ordered crystal
  and emits a well-formed spec (partition, mirrored pairs, overflow
  last);
- the C++ assignment is collision-free and sigma-consistent;
- the grouped kernel (interpret mode) + fixup patch equals
  ``x.reshape(A*M, D)[rev]`` BITWISE on every row a consumer can read
  (all rows except masked slots of non-self-paired groups, whose values
  are unspecified by contract and whose cotangents are exactly zero);
- the primitive's autodiff transpose is the same permutation on those
  rows;
- PET energies+forces agree between the grouped-colored batch and a
  plain packed batch (slot assignment must not change physics).

Reference counterpart: the reversed-edge machinery in
``/root/reference/src/metatrain/pet/modules/nef.py:221-251``.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatrain_tpu.containers import (
    System,
    batch_from_systems,
    bucket_neighbors,
)
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
    not _native_available(), reason="native coloring unavailable"
)


@pytest.fixture(scope="module")
def grouped_batch():
    system = _fcc_system()
    prior = os.environ.get("MTT_COLOR_GROUPED")
    os.environ["MTT_COLOR_GROUPED"] = "1"
    try:
        nbr = compute_neighbor_data(system, cutoff=4.5, colored=True)
    finally:
        if prior is None:
            del os.environ["MTT_COLOR_GROUPED"]
        else:
            os.environ["MTT_COLOR_GROUPED"] = prior
    assert nbr.colored and nbr.color_groups
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=2048,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    assert batch.color_groups, "batch-time cost model rejected the layout"
    return system, nbr, batch


def _dont_care(batch):
    """Masked rows of non-self-paired groups: unspecified kernel values."""
    M = batch.max_neighbors
    selfp = np.zeros(M, bool)
    for gi, (base, cap, _, _, pair) in enumerate(batch.color_groups):
        selfp[base : base + cap] = pair == gi
    return (~np.asarray(batch.nbr_mask)) & (~selfp[None, :])


def test_spec_well_formed(grouped_batch):
    _, nbr, batch = grouped_batch
    groups = batch.color_groups
    M = batch.max_neighbors
    # contiguous partition of [0, M)
    assert groups[0][0] == 0
    for (b0, c0, *_), (b1, *_rest) in zip(groups, groups[1:]):
        assert b1 == b0 + c0
    assert groups[-1][0] + groups[-1][1] == M
    # mirrored pairs
    for gi, (base, cap, delta, width, pair) in enumerate(groups):
        pb, pc, pd, pw, pp = groups[pair]
        assert pc == cap and pd == -delta and pw == width and pp == gi
        assert delta % 8 == 0 and width % 128 == 0
    # overflow last: wide, self-paired, delta 0
    assert groups[-1][2] == 0 and groups[-1][4] == len(groups) - 1
    assert groups[-1][3] >= max(g[3] for g in groups)


def test_sigma_involution_and_servability(grouped_batch):
    _, _, batch = grouped_batch
    A, M = batch.nbr_indices.shape
    rev = np.asarray(batch.nbr_reverse).astype(np.int64).reshape(-1)
    assert (rev[rev] == np.arange(A * M)).all()

    groups = batch.color_groups
    sigma = np.arange(M)
    for base, cap, _, _, pair in groups:
        sigma[base : base + cap] = groups[pair][0] + np.arange(cap)
    # most real rows reverse into the sigma-paired slot
    mask = np.asarray(batch.nbr_mask)
    nbr = np.asarray(batch.nbr_indices).astype(np.int64)
    sig_ok = rev.reshape(A, M) == nbr * M + sigma[None, :]
    assert sig_ok[mask].mean() > 0.9


def test_grouped_kernel_bitwise(grouped_batch):
    from metatrain_tpu.ops.pallas.color_gather import _kernel_impl_grouped

    _, _, batch = grouped_batch
    A, M = batch.nbr_indices.shape
    D = 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    out = np.asarray(
        _kernel_impl_grouped(
            x,
            batch.nbr_indices,
            batch.nbr_fixup_src,
            batch.nbr_fixup_dst,
            batch.color_groups,
            interpret=True,
            # the dst column layout is defined by the split spec: they
            # must always travel together (the primitive carries both)
            fixup_split=batch.color_fixup_split,
        )
    )
    rev = np.asarray(batch.nbr_reverse).reshape(-1)
    ref = np.asarray(x).reshape(A * M, D)[rev].reshape(A, M, D)
    care = ~_dont_care(batch)
    eq = (out == ref).all(axis=-1)
    assert eq[care].all()


def test_transpose_same_permutation(grouped_batch):
    from metatrain_tpu.ops.pallas.color_gather import colored_permute

    _, _, batch = grouped_batch
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
            groups=batch.color_groups,
            fixup_split=batch.color_fixup_split,
        )

    rev = np.asarray(rev_flat)
    g = jax.grad(lambda x: jnp.sum(perm(x) * w))(x)
    gref = np.asarray(w).reshape(A * M, D)[rev].reshape(A, M, D)
    assert (np.asarray(g) == gref).all()  # CPU fallback path is exact


def test_pet_grouped_vs_packed_parity(grouped_batch):
    """PET energies+forces must not depend on the NEF slot assignment."""
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.models.pet import PET

    system, nbr_col, batch_col = grouped_batch
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
    np.testing.assert_allclose(f1, f0, rtol=1e-4, atol=1e-4)
