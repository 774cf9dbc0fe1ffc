"""Ewald electrostatics and the long-range featurizer."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.models.pet import PET
from metatrain_tpu.ops.ewald import (
    ewald_potential_periodic,
    kvectors_for_cell,
)
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


def madelung_nacl_reference():
    """NaCl Madelung constant via brute-force Ewald-free direct sum is slow;
    instead check our Ewald against the known Madelung constant 1.7476."""
    return 1.747565


def test_ewald_nacl_madelung():
    # rock-salt structure, lattice constant 2 (nearest-neighbor distance 1)
    a = 2.0
    positions = []
    charges = []
    for i, j, k in itertools.product(range(2), repeat=3):
        positions.append([i, j, k])
        charges.append((-1.0) ** (i + j + k))
    positions = np.asarray(positions, dtype=np.float64)
    charges = np.asarray(charges, dtype=np.float64)
    cell = np.eye(3) * a

    smearing = 0.35
    k_triples = kvectors_for_cell(cell, kspace_cutoff=22.0)
    phi_recip = ewald_potential_periodic(
        jnp.asarray(positions),
        jnp.asarray(charges),
        jnp.asarray(cell),
        jnp.asarray(k_triples),
        jnp.ones(len(positions), dtype=bool),
        smearing,
    )
    # real-space part: direct sum with complementary error function
    from scipy.special import erfc

    phi_real = np.zeros(len(positions))
    r_cut = 8.0
    n_img = int(np.ceil(r_cut / a)) + 1
    for s in itertools.product(range(-n_img, n_img + 1), repeat=3):
        shift = np.asarray(s) @ cell
        for i in range(len(positions)):
            r = positions + shift - positions[i]
            d = np.linalg.norm(r, axis=1)
            mask = d > 1e-9
            mask &= d < r_cut
            phi_real[i] += np.sum(
                charges[mask] * erfc(d[mask] / (np.sqrt(2) * smearing)) / d[mask]
            )

    phi_total = np.asarray(phi_recip) + phi_real
    # Madelung: phi at a site * site charge = -M / nn_distance
    madelung = -phi_total[0] * charges[0] * 1.0
    np.testing.assert_allclose(madelung, madelung_nacl_reference(), rtol=1e-3)


def test_pet_long_range_runs_and_differentiates():
    info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    model = PET(
        {
            "cutoff": 4.0,
            "d_pet": 16,
            "d_head": 16,
            "d_node": 24,
            "d_feedforward": 16,
            "num_heads": 2,
            "num_attention_layers": 1,
            "num_gnn_layers": 1,
            "long_range": {"enable": True, "smearing": 1.0, "n_kmax": 2},
        },
        info,
    )
    params = model.init_params(jax.random.PRNGKey(0))

    # periodic system
    rng = np.random.default_rng(0)
    cell = np.eye(3) * 6.0
    periodic = System(
        rng.uniform(0, 6, size=(8, 3)), np.full(8, 6), cell, np.ones(3, bool)
    )
    nbr = compute_neighbor_data(periodic, 4.0)
    batch = batch_from_systems([periodic], [nbr])
    out = model.forward(params, batch, ["energy"])
    e = np.asarray(out["energy"].block().values)
    assert np.isfinite(e).all()

    # gradient flows through the Ewald part
    from metatrain_tpu.engine.evaluate import evaluate_model

    preds = evaluate_model(
        model.forward, params, batch, dict(info.targets)
    )
    forces = np.asarray(preds["energy"].block().gradient("positions").values)
    assert np.isfinite(forces).all()

    # non-periodic path also works in the same jitted model
    molecule = make_molecule(6, seed=1)
    nbr_m = compute_neighbor_data(molecule, 4.0)
    batch_m = batch_from_systems([molecule], [nbr_m])
    out_m = model.forward(params, batch_m, ["energy"])
    assert np.isfinite(np.asarray(out_m["energy"].block().values)).all()


def test_pme_matches_dense_ewald():
    """The FFT-mesh PME reciprocal potential agrees with the dense k-space
    Ewald on a random periodic charge distribution."""
    from metatrain_tpu.ops.ewald import pme_potential_periodic

    rng = np.random.default_rng(0)
    n = 14
    cell = np.eye(3) * 7.0
    positions = rng.uniform(0, 7.0, size=(n, 3))
    charges = rng.normal(size=n)
    charges -= charges.mean()  # neutral
    smearing = 1.0

    k_triples = kvectors_for_cell(cell, kspace_cutoff=9.0)
    phi_ref = np.asarray(
        ewald_potential_periodic(
            jnp.asarray(positions),
            jnp.asarray(charges),
            jnp.asarray(cell),
            jnp.asarray(k_triples),
            jnp.ones(n, dtype=bool),
            smearing,
        )
    )
    phi_pme = np.asarray(
        pme_potential_periodic(
            jnp.asarray(positions),
            jnp.asarray(charges),
            jnp.asarray(cell),
            jnp.ones(n, dtype=bool),
            smearing,
            mesh=48,
        )
    )
    scale = np.abs(phi_ref).max()
    np.testing.assert_allclose(phi_pme, phi_ref, atol=5e-3 * scale)


def test_pme_nacl_madelung():
    """PME + real-space sum reproduces the NaCl Madelung constant."""
    from scipy.special import erfc

    from metatrain_tpu.ops.ewald import pme_potential_periodic

    a = 2.0
    positions, charges = [], []
    for i, j, k in itertools.product(range(2), repeat=3):
        positions.append([i, j, k])
        charges.append((-1.0) ** (i + j + k))
    positions = np.asarray(positions, dtype=np.float64)
    charges = np.asarray(charges, dtype=np.float64)
    cell = np.eye(3) * a
    smearing = 0.35

    phi_recip = np.asarray(
        pme_potential_periodic(
            jnp.asarray(positions),
            jnp.asarray(charges),
            jnp.asarray(cell),
            jnp.ones(len(positions), dtype=bool),
            smearing,
            mesh=64,
        )
    )
    phi_real = np.zeros(len(positions))
    r_cut = 8.0
    n_img = int(np.ceil(r_cut / a)) + 1
    for s in itertools.product(range(-n_img, n_img + 1), repeat=3):
        shift = np.asarray(s) @ cell
        for i in range(len(positions)):
            r = positions + shift - positions[i]
            d = np.linalg.norm(r, axis=1)
            mask = (d > 1e-9) & (d < r_cut)
            phi_real[i] += np.sum(
                charges[mask] * erfc(d[mask] / (np.sqrt(2) * smearing)) / d[mask]
            )
    madelung = -(phi_recip[0] + phi_real[0]) * charges[0]
    np.testing.assert_allclose(madelung, madelung_nacl_reference(), rtol=2e-3)


def test_soap_bpnn_long_range_runs_and_differentiates():
    """SOAP-BPNN with the long-range featurizer enabled: finite energy and
    forces on a periodic crystal (both ewald and pme methods)."""
    import jax

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.models.soap_bpnn import SoapBpnn
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    from conftest import make_crystal

    ds_info = DatasetInfo(
        "angstrom",
        [29],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    system = make_crystal(n_cells=2, seed=2)
    for method in ("ewald", "pme"):
        model = SoapBpnn(
            {
                "soap": {
                    "max_angular": 1,
                    "max_radial": 1,
                    "cutoff": {"radius": 4.0},
                },
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
                "long_range": {"enable": True, "method": method, "mesh": 16},
            },
            ds_info,
        )
        params = model.init_params(jax.random.PRNGKey(0))
        nbr = compute_neighbor_data(system, model.cutoff)
        batch = batch_from_systems([system], [nbr])
        preds = evaluate_model(
            model.forward, params, batch, dict(ds_info.targets),
            is_training=False,
        )
        block = preds["energy"].block()
        assert np.isfinite(np.asarray(block.values)).all()
        assert np.isfinite(
            np.asarray(block.gradient("positions").values)
        ).all()
