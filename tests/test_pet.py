"""PET model tests: shapes, physics invariances, training, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.collate import CollateFn
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import (
    DatasetInfo,
    get_energy_target_info,
)
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.pet import PET, PETTrainer
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_crystal, make_molecule


SMALL_HYPERS = {
    "cutoff": 4.0,
    "d_pet": 32,
    "d_head": 32,
    "d_node": 48,
    "d_feedforward": 32,
    "num_heads": 4,
    "num_attention_layers": 1,
    "num_gnn_layers": 2,
}


def _dataset_info(with_forces=True, with_stress=False):
    return DatasetInfo(
        length_unit="angstrom",
        atomic_types=[1, 6, 8, 29],
        targets={
            "energy": get_energy_target_info(
                "eV",
                add_position_gradients=with_forces,
                add_strain_gradients=with_stress,
            )
        },
    )


def _make_batch(systems, cutoff=4.0, dtype=jnp.float32):
    nbrs = [compute_neighbor_data(s, cutoff=cutoff) for s in systems]
    return batch_from_systems(systems, nbrs, dtype=dtype)


@pytest.fixture(scope="module")
def pet_and_params():
    model = PET(SMALL_HYPERS, _dataset_info())
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_pet_forward_shapes(pet_and_params):
    model, params = pet_and_params
    systems = [make_molecule(6, seed=1), make_molecule(9, seed=2)]
    batch = _make_batch(systems)
    out = model.forward(params, batch, ["energy"])
    block = out["energy"].block()
    assert block.values.shape == (batch.n_systems_padded, 1)
    mask = np.asarray(block.mask)
    values = np.asarray(block.values)
    assert mask.sum() == 2
    assert np.isfinite(values).all()
    # padded system rows are exactly zero
    np.testing.assert_allclose(values[~mask], 0.0, atol=1e-6)


def test_pet_padding_invariance(pet_and_params):
    """The same system in differently-padded batches gives the same energy."""
    model, params = pet_and_params
    system = make_molecule(7, seed=5)
    nbr = compute_neighbor_data(system, cutoff=4.0)

    b1 = batch_from_systems([system], [nbr])
    b2 = batch_from_systems(
        [system], [nbr], n_atoms_padded=32, n_systems_padded=5, max_neighbors=16
    )
    e1 = np.asarray(model.forward(params, b1, ["energy"])["energy"].block().values)[0, 0]
    e2 = np.asarray(model.forward(params, b2, ["energy"])["energy"].block().values)[0, 0]
    np.testing.assert_allclose(e1, e2, rtol=2e-5)


def test_pet_batching_invariance(pet_and_params):
    """Energy of a system is independent of its batch companions."""
    model, params = pet_and_params
    s1, s2 = make_molecule(6, seed=1), make_molecule(8, seed=2)
    together = _make_batch([s1, s2])
    alone = _make_batch([s1])
    e_together = np.asarray(
        model.forward(params, together, ["energy"])["energy"].block().values
    )[0, 0]
    e_alone = np.asarray(
        model.forward(params, alone, ["energy"])["energy"].block().values
    )[0, 0]
    np.testing.assert_allclose(e_together, e_alone, rtol=2e-5)


def test_pet_invariances(pet_and_params):
    """Translation + rotation invariance; permutation equivariance."""
    model, params = pet_and_params
    system = make_molecule(8, seed=7)

    def energy_of(s):
        batch = _make_batch([s])
        return float(
            np.asarray(model.forward(params, batch, ["energy"])["energy"].block().values)[0, 0]
        )

    e0 = energy_of(system)

    shifted = System(system.positions + 5.0, system.types, system.cell, system.pbc)
    np.testing.assert_allclose(energy_of(shifted), e0, rtol=1e-5)

    # NOTE: PET is deliberately NOT exactly rotation-invariant -- it consumes
    # raw Cartesian edge vectors and learns equivariance through O3
    # augmentation (reference pet paper / utils/augmentation.py). Only
    # translation and permutation are exact symmetries.
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(system))
    permuted = System(
        system.positions[perm], system.types[perm], system.cell, system.pbc
    )
    np.testing.assert_allclose(energy_of(permuted), e0, rtol=1e-5)


def test_pet_forces_finite_differences():
    """PET forces from the engine match finite differences (f64)."""
    model = PET(SMALL_HYPERS, _dataset_info(), compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(1))
    system = make_molecule(5, seed=9)
    info = _dataset_info().targets["energy"]

    def energy_of(positions):
        s = System(positions, system.types, system.cell, system.pbc)
        batch = _make_batch([s], dtype=jnp.float64)
        out = model.forward(params, batch, ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    batch = _make_batch([system], dtype=jnp.float64)
    preds = evaluate_model(model.forward, params, batch, {"energy": info})
    grads = np.asarray(
        preds["energy"].block().gradient("positions").values
    )[:, :, 0]

    eps = 1e-5
    for a in range(3):
        for d in range(3):
            pos_p = system.positions.copy()
            pos_m = system.positions.copy()
            pos_p[a, d] += eps
            pos_m[a, d] -= eps
            num = (energy_of(pos_p) - energy_of(pos_m)) / (2 * eps)
            np.testing.assert_allclose(grads[a, d], num, rtol=5e-4, atol=1e-7)


def test_pet_smooth_at_cutoff(pet_and_params):
    """Energy is continuous as an atom crosses the cutoff (bump function)."""
    model, params = pet_and_params

    def dimer_energy(r):
        system = System(
            positions=np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]]),
            types=np.array([6, 6]),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        nbr = compute_neighbor_data(system, cutoff=4.0)
        batch = batch_from_systems(
            [system], [nbr], n_atoms_padded=8, n_systems_padded=2, max_neighbors=4
        )
        out = model.forward(params, batch, ["energy"])
        return float(np.asarray(out["energy"].block().values)[0, 0])

    e_inside = dimer_energy(3.999)
    e_outside = dimer_energy(4.001)
    e_isolated = dimer_energy(6.0)
    np.testing.assert_allclose(e_outside, e_isolated, atol=1e-6)
    assert abs(e_inside - e_outside) < 1e-3  # smooth vanishing at cutoff


def test_pet_adaptive_cutoff_runs():
    hypers = dict(SMALL_HYPERS, num_neighbors_adaptive=6)
    model = PET(hypers, _dataset_info())
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _make_batch([make_crystal(n_cells=1)])
    out = model.forward(params, batch, ["energy"])
    assert np.isfinite(np.asarray(out["energy"].block().values)).all()

    # forces still work through the adaptive solver
    info = _dataset_info().targets["energy"]
    preds = evaluate_model(model.forward, params, batch, {"energy": info})
    forces = np.asarray(preds["energy"].block().gradient("positions").values)
    assert np.isfinite(forces).all()


def _training_dataset(n=10):
    rng = np.random.default_rng(0)
    systems, energies, forces = [], [], []
    for i in range(n):
        s = make_molecule(5 + i % 3, seed=i)
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
    return Dataset(systems, targets), ds_info


def test_pet_training_smoke(tmp_path):
    dataset, ds_info = _training_dataset()
    model = PET(SMALL_HYPERS, ds_info)
    trainer = PETTrainer(
        {"num_epochs": 3, "batch_size": 5, "learning_rate": 1e-3, "seed": 0}
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    assert trainer.best_params is not None
    assert (tmp_path / "train.csv").exists()

    # loss went down over epochs
    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert float(rows[-1]["train loss"]) < float(rows[0]["train loss"])


def test_pet_checkpoint_roundtrip(tmp_path):
    dataset, ds_info = _training_dataset(4)
    model = PET(SMALL_HYPERS, ds_info)
    trainer = PETTrainer({"num_epochs": 1, "batch_size": 4})
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    path = str(tmp_path / "model.ckpt")
    trainer.save_checkpoint(model, path)

    from metatrain_tpu.utils.io import model_from_checkpoint

    restored = model_from_checkpoint(path, context="export")
    batch = _make_batch([dataset[0].system], cutoff=model.cutoff)
    original = np.asarray(
        model.forward_eval(model.params, batch, ["energy"])["energy"].block().values
    )
    loaded = np.asarray(
        restored.forward_eval(restored.params, batch, ["energy"])["energy"]
        .block()
        .values
    )
    np.testing.assert_allclose(original, loaded, rtol=1e-6)


def test_pet_eval_adds_composition(tmp_path):
    dataset, ds_info = _training_dataset(6)
    model = PET(SMALL_HYPERS, ds_info)
    trainer = PETTrainer({"num_epochs": 1, "batch_size": 3})
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    batch = _make_batch([dataset[0].system], cutoff=model.cutoff)
    raw = np.asarray(
        model.forward(model.params, batch, ["energy"])["energy"].block().values
    )[0, 0]
    evaled = np.asarray(
        model.forward_eval(model.params, batch, ["energy"])["energy"].block().values
    )[0, 0]
    # composition baseline shifts the eval prediction
    comp = model.composition.predict_host(dataset[0].system)["energy"][0, 0]
    scale = model.scaler.scale_value("energy")[0]
    np.testing.assert_allclose(evaled, raw * scale + comp, rtol=1e-4)
