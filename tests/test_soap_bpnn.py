"""SOAP-BPNN tests: invariances, forces, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer
from metatrain_tpu.ops.neighbors import compute_neighbor_data
from metatrain_tpu.ops.spherical import (
    real_spherical_harmonics,
    reference_real_sph,
)

from conftest import make_molecule


SMALL_HYPERS = {
    "soap": {"max_angular": 3, "max_radial": 3, "cutoff": {"radius": 4.0}},
    "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 16},
}


def _dataset_info(with_forces=True):
    return DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {
            "energy": get_energy_target_info(
                "eV", add_position_gradients=with_forces
            )
        },
    )


def _make_batch(systems, cutoff=4.0, dtype=jnp.float32):
    nbrs = [compute_neighbor_data(s, cutoff=cutoff) for s in systems]
    return batch_from_systems(systems, nbrs, dtype=dtype)


def test_spherical_harmonics_vs_scipy():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mine = real_spherical_harmonics(jnp.asarray(v, dtype=jnp.float64), 6)
    ref = reference_real_sph(v, 6)
    for l in range(7):
        np.testing.assert_allclose(np.asarray(mine[l]), ref[l], atol=1e-12)


def test_spherical_harmonics_pole_gradients():
    """Gradients must be finite on the z-axis (pole)."""
    def f(v):
        u = v / jnp.linalg.norm(v)
        return sum(jnp.sum(y) for y in real_spherical_harmonics(u, 4))

    g = jax.grad(f)(jnp.array([0.0, 0.0, 1.5], dtype=jnp.float64))
    assert np.isfinite(np.asarray(g)).all()


@pytest.fixture(scope="module")
def bpnn_and_params():
    model = SoapBpnn(SMALL_HYPERS, _dataset_info())
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_rotation_invariance(bpnn_and_params):
    """SOAP features are exactly invariant: energies match under O(3)."""
    model, params = bpnn_and_params
    system = make_molecule(8, seed=3)

    def energy_of(s):
        batch = _make_batch([s])
        out = model.forward(params, batch, ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    e0 = energy_of(system)
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    rotated = System(
        system.positions @ q.T, system.types, system.cell, system.pbc
    )
    np.testing.assert_allclose(energy_of(rotated), e0, rtol=1e-4)

    shifted = System(
        system.positions + 3.0, system.types, system.cell, system.pbc
    )
    np.testing.assert_allclose(energy_of(shifted), e0, rtol=1e-4)

    perm = rng.permutation(len(system))
    permuted = System(
        system.positions[perm], system.types[perm], system.cell, system.pbc
    )
    np.testing.assert_allclose(energy_of(permuted), e0, rtol=1e-4)


def test_bpnn_forces_finite_differences():
    model = SoapBpnn(SMALL_HYPERS, _dataset_info(), compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(1))
    system = make_molecule(5, seed=4)
    info = _dataset_info().targets["energy"]

    batch = _make_batch([system], dtype=jnp.float64)
    preds = evaluate_model(model.forward, params, batch, {"energy": info})
    grads = np.asarray(preds["energy"].block().gradient("positions").values)[
        :, :, 0
    ]

    def energy_of(positions):
        s = System(positions, system.types, system.cell, system.pbc)
        b = _make_batch([s], dtype=jnp.float64)
        return float(
            np.asarray(model.forward(params, b, ["energy"])["energy"].block().values)[
                0, 0
            ]
        )

    eps = 1e-5
    for a in range(3):
        for d in range(3):
            pos_p, pos_m = system.positions.copy(), system.positions.copy()
            pos_p[a, d] += eps
            pos_m[a, d] -= eps
            num = (energy_of(pos_p) - energy_of(pos_m)) / (2 * eps)
            np.testing.assert_allclose(grads[a, d], num, rtol=1e-4, atol=1e-8)


def test_bpnn_training_smoke(tmp_path):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(8):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        s.extra["forces"] = rng.normal(size=(len(s), 3))
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {
            "energy": {
                "quantity": "energy",
                "key": "energy",
                "unit": "eV",
                "forces": {"key": "forces"},
            }
        },
    )
    types = sorted({int(t) for s in systems for t in s.types})
    ds_info = DatasetInfo("angstrom", types, infos)
    dataset = Dataset(systems, targets)

    model = SoapBpnn(SMALL_HYPERS, ds_info)
    trainer = SoapBpnnTrainer(
        {"num_epochs": 3, "batch_size": 4, "learning_rate": 3e-3}
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["train loss"]) < float(rows[0]["train loss"])
