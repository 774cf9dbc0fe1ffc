"""Equivariant MACE-family tests: exact rotation invariance, forces."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.augmentation import random_rotation
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.mace import MACE, MACETrainer
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


SMALL_HYPERS = {
    "cutoff": 4.0,
    "num_radial": 4,
    "max_ell": 2,
    "num_channels": 8,
    "num_interactions": 2,
    "mlp_width": 16,
}


def _dataset_info(with_forces=False):
    return DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {
            "energy": get_energy_target_info(
                "eV", add_position_gradients=with_forces
            )
        },
    )


def _batch(systems, dtype=jnp.float64):
    nbrs = [compute_neighbor_data(s, cutoff=4.0) for s in systems]
    return batch_from_systems(systems, nbrs, dtype=dtype)


def test_mace_exact_rotation_invariance():
    model = MACE(SMALL_HYPERS, _dataset_info(), compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(7, seed=1)

    def energy_of(s):
        out = model.forward(params, _batch([s]), ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    e0 = energy_of(system)
    assert abs(e0) > 1e-8  # non-trivial prediction
    rng = np.random.default_rng(0)
    for _ in range(3):
        rotation = random_rotation(rng)
        rotated = System(
            system.positions @ rotation.T, system.types, system.cell, system.pbc
        )
        np.testing.assert_allclose(energy_of(rotated), e0, rtol=1e-9)

    # translation + permutation
    shifted = System(system.positions + 2.0, system.types, system.cell, system.pbc)
    np.testing.assert_allclose(energy_of(shifted), e0, rtol=1e-9)
    perm = rng.permutation(len(system))
    permuted = System(
        system.positions[perm], system.types[perm], system.cell, system.pbc
    )
    np.testing.assert_allclose(energy_of(permuted), e0, rtol=1e-9)


def test_mace_higher_irreps_contribute():
    """max_ell > 0 must change predictions (CG paths actually fire)."""
    info = _dataset_info()
    m0 = MACE(dict(SMALL_HYPERS, max_ell=0), info, compute_dtype=jnp.float64)
    m2 = MACE(SMALL_HYPERS, info, compute_dtype=jnp.float64)
    p0 = m0.init_params(jax.random.PRNGKey(0))
    p2 = m2.init_params(jax.random.PRNGKey(0))
    system = make_molecule(7, seed=2)
    e0 = float(np.asarray(m0.forward(p0, _batch([system]), ["energy"])["energy"].block().values)[0, 0])
    e2 = float(np.asarray(m2.forward(p2, _batch([system]), ["energy"])["energy"].block().values)[0, 0])
    assert abs(e0 - e2) > 1e-10


def test_mace_forces_finite_differences():
    model = MACE(SMALL_HYPERS, _dataset_info(True), compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(1))
    system = make_molecule(5, seed=3)
    info = _dataset_info(True).targets["energy"]

    batch = _batch([system])
    preds = evaluate_model(model.forward, params, batch, {"energy": info})
    grads = np.asarray(preds["energy"].block().gradient("positions").values)[:, :, 0]

    def energy_of(positions):
        s = System(positions, system.types, system.cell, system.pbc)
        out = model.forward(params, _batch([s]), ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    eps = 1e-5
    for a in range(2):
        for d in range(3):
            pos_p, pos_m = system.positions.copy(), system.positions.copy()
            pos_p[a, d] += eps
            pos_m[a, d] -= eps
            num = (energy_of(pos_p) - energy_of(pos_m)) / (2 * eps)
            np.testing.assert_allclose(grads[a, d], num, rtol=1e-4, atol=1e-9)


def test_mace_training_smoke(tmp_path):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(8):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    types = sorted({int(t) for s in systems for t in s.types})
    dataset = Dataset(systems, targets)
    model = MACE(SMALL_HYPERS, DatasetInfo("angstrom", types, infos))
    trainer = MACETrainer({"num_epochs": 2, "batch_size": 4})
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert np.isfinite(float(rows[-1]["train loss"]))


def test_mace_correlation3_invariance_including_inversion():
    """The iterated-CG product basis at correlation 3 stays exactly O(3)
    invariant for scalar targets (rotations AND improper rotations)."""
    hypers = dict(SMALL_HYPERS, correlation=3, num_interactions=1)
    model = MACE(hypers, _dataset_info(), compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(2))
    system = make_molecule(6, seed=4)

    def energy_of(s):
        out = model.forward(params, _batch([s]), ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    e0 = energy_of(system)
    assert abs(e0) > 1e-8
    rng = np.random.default_rng(3)
    for improper in (False, True):
        rotation = random_rotation(rng, improper=improper)
        rotated = System(
            system.positions @ rotation.T, system.types, system.cell, system.pbc
        )
        np.testing.assert_allclose(energy_of(rotated), e0, rtol=1e-9)


def test_mace_vector_target_equivariance():
    """A Cartesian rank-1 target rotates with the system and flips under
    inversion (true-vector behavior) -- the equivariant readout path."""
    from metatrain_tpu.data.target_info import get_generic_target_info

    info = get_generic_target_info(
        "cartesian", rank=1, quantity="dipole", unit="e*A"
    )
    ds_info = DatasetInfo("angstrom", [1, 6, 8], {"dipole": info})
    model = MACE(dict(SMALL_HYPERS, correlation=2), ds_info, jnp.float64)
    params = model.init_params(jax.random.PRNGKey(5))
    system = make_molecule(6, seed=7)

    def dipole_of(s):
        out = model.forward(params, _batch([s]), ["dipole"])
        return np.asarray(out["dipole"].block().values, dtype=np.float64)[0]

    d0 = dipole_of(system)
    assert np.linalg.norm(d0) > 1e-8
    rng = np.random.default_rng(11)
    rotation = random_rotation(rng)
    rotated = System(
        system.positions @ rotation.T, system.types, system.cell, system.pbc
    )
    np.testing.assert_allclose(
        dipole_of(rotated), rotation @ d0, rtol=1e-7, atol=1e-10
    )
    inverted = System(
        -system.positions, system.types, system.cell, system.pbc
    )
    np.testing.assert_allclose(dipole_of(inverted), -d0, rtol=1e-7, atol=1e-10)


def test_mace_spherical_target_equivariance():
    """A lambda=2 spherical target transforms with the real Wigner-D."""
    from metatrain_tpu.data.target_info import get_generic_target_info
    from metatrain_tpu.engine.augmentation import real_wigner_d

    info = get_generic_target_info(
        "spherical",
        quantity="quadrupole",
        irreps=[{"o3_lambda": 2, "o3_sigma": 1}],
    )
    ds_info = DatasetInfo("angstrom", [1, 6, 8], {"quad": info})
    model = MACE(dict(SMALL_HYPERS, correlation=2), ds_info, jnp.float64)
    params = model.init_params(jax.random.PRNGKey(6))
    system = make_molecule(6, seed=9)

    def quad_of(s):
        out = model.forward(params, _batch([s]), ["quad"])
        return np.asarray(out["quad"].block().values, dtype=np.float64)[0]

    q0 = quad_of(system)
    assert np.linalg.norm(q0) > 1e-8
    rng = np.random.default_rng(13)
    rotation = random_rotation(rng)
    rotated = System(
        system.positions @ rotation.T, system.types, system.cell, system.pbc
    )
    wd = real_wigner_d(rotation, 2)
    np.testing.assert_allclose(
        quad_of(rotated), wd @ q0, rtol=1e-6, atol=1e-9
    )
