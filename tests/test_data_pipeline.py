"""Dataset, readers, collate, samplers, loss, metrics."""

import numpy as np
import pytest

from metatrain_tpu.data.collate import CollateFn
from metatrain_tpu.data.dataset import (
    Dataset,
    get_dataset,
    get_dataset_info,
    train_val_test_split,
)
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.readers.extxyz import write_xyz
from metatrain_tpu.data.samplers import (
    BatchSampler,
    CombinedDataLoader,
    DataLoader,
    MaxAtomBatchSampler,
)
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.loss import LossAggregator
from metatrain_tpu.engine.metrics import ErrorAccumulator, get_selected_metric

from conftest import make_crystal, make_molecule


@pytest.fixture
def xyz_dataset(tmp_path):
    rng = np.random.default_rng(42)
    systems = [make_molecule(4 + i % 3, seed=i) for i in range(12)]
    infos = []
    arrays = []
    for s in systems:
        infos.append({"energy": float(rng.normal())})
        arrays.append({"forces": rng.normal(size=(len(s), 3))})
    path = str(tmp_path / "data.xyz")
    write_xyz(path, systems, per_atom_arrays=arrays, info=infos)
    return path, systems, infos, arrays


def test_get_dataset_with_energy_and_forces(xyz_dataset):
    path, systems, infos, arrays = xyz_dataset
    config = {
        "systems": {"read_from": path},
        "targets": {
            "energy": {
                "quantity": "energy",
                "key": "energy",
                "unit": "eV",
                "forces": {"key": "forces"},
            }
        },
    }
    dataset, target_infos = get_dataset(config)
    assert len(dataset) == 12
    info = target_infos["energy"]
    assert info.quantity == "energy"
    assert info.gradients == ["positions"]

    sample = dataset[3]
    block = sample.targets["energy"].block()
    np.testing.assert_allclose(
        np.asarray(block.values), [[infos[3]["energy"]]], atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(block.gradient("positions").values)[:, :, 0],
        -arrays[3]["forces"],
        atol=1e-9,
    )

    ds_info = get_dataset_info([dataset], target_infos, "angstrom")
    assert isinstance(ds_info, DatasetInfo)
    assert set(ds_info.atomic_types) <= {1, 6, 8}


def test_stress_and_virial_conventions(tmp_path):
    system = make_crystal(n_cells=1)
    stress = np.diag([1.0, 2.0, 3.0])
    volume = abs(np.linalg.det(system.cell))
    path = str(tmp_path / "s.xyz")
    write_xyz(path, [system], info=[{"energy": -1.0, "stress": stress.ravel()}])

    _, _ = None, None
    from metatrain_tpu.data.readers import read_systems

    systems = read_systems(path)
    targets, infos = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "stress": {"key": "stress"}}},
    )
    grad = targets["energy"][0].block().gradient("strain")
    np.testing.assert_allclose(
        np.asarray(grad.values)[0, :, :, 0], stress * volume, rtol=1e-9
    )

    targets_v, _ = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "virial": {"key": "stress"}}},
    )
    grad_v = targets_v["energy"][0].block().gradient("strain")
    np.testing.assert_allclose(
        np.asarray(grad_v.values)[0, :, :, 0], -stress, rtol=1e-9
    )


def test_split():
    systems = [make_molecule(4, seed=i) for i in range(20)]
    targets, infos = read_targets(
        [_with_energy(s, i) for i, s in enumerate(systems)],
        {"energy": {"quantity": "energy", "key": "energy"}},
    )
    dataset = Dataset([_with_energy(s, i) for i, s in enumerate(systems)], targets)
    train, val, test = train_val_test_split(
        dataset, val_fraction=0.2, test_fraction=0.1, seed=1
    )
    assert len(train) == 14 and len(val) == 4 and len(test) == 2
    all_energies = sorted(
        float(d.targets["energy"].block().values[0, 0])
        for split in (train, val, test)
        for d in (split[i] for i in range(len(split)))
    )
    assert all_energies == sorted(float(i) for i in range(20))


def _with_energy(system, e):
    system.extra["energy"] = np.asarray(float(e))
    return system


def test_collate_and_loaders(xyz_dataset):
    path, *_ = xyz_dataset
    config = {
        "systems": {"read_from": path},
        "targets": {
            "energy": {
                "quantity": "energy",
                "key": "energy",
                "forces": {"key": "forces"},
            }
        },
    }
    dataset, target_infos = get_dataset(config)
    collate = CollateFn(cutoff=4.0, target_infos=target_infos)
    sampler = BatchSampler(len(dataset), batch_size=5, shuffle=True, seed=0)
    loader = DataLoader(dataset, sampler, collate)
    batches = list(loader)
    assert len(batches) == 3

    batch = batches[0]
    energies = np.asarray(batch.targets["energy"].block().values)
    mask = np.asarray(batch.targets["energy"].block().mask)
    assert mask.sum() == 5
    assert np.isfinite(energies[mask]).all()
    grad = batch.targets["energy"].block().gradient("positions")
    assert np.asarray(grad.mask).sum() == int(batch.systems.n_atoms)

    # deterministic epoch-keyed shuffling
    loader.set_epoch(0)
    first = [np.asarray(b.systems.n_atoms) for b in loader]
    loader.set_epoch(0)
    second = [np.asarray(b.systems.n_atoms) for b in loader]
    assert [int(x) for x in first] == [int(x) for x in second]


def test_max_atom_sampler():
    counts = [10, 20, 5, 8, 30, 2, 50, 7]
    sampler = MaxAtomBatchSampler(counts, max_atoms=40, shuffle=True, seed=0)
    seen = []
    for batch in sampler:
        total = sum(counts[i] for i in batch)
        assert total <= 40
        seen.extend(batch.tolist())
    # 50 dropped (oversized), everything else present exactly once
    assert sorted(seen) == [0, 1, 2, 3, 4, 5, 7]

    # rank sharding: two ranks see disjoint batches
    s0 = MaxAtomBatchSampler(counts, 40, seed=0, num_replicas=2, rank=0)
    s1 = MaxAtomBatchSampler(counts, 40, seed=0, num_replicas=2, rank=1)
    b0 = [tuple(b) for b in s0]
    b1 = [tuple(b) for b in s1]
    assert len(b0) == len(b1)
    assert not (set(b0) & set(b1))


def test_loss_aggregator(xyz_dataset):
    path, *_ = xyz_dataset
    config = {
        "systems": {"read_from": path},
        "targets": {
            "energy": {
                "quantity": "energy",
                "key": "energy",
                "forces": {"key": "forces"},
            }
        },
    }
    dataset, target_infos = get_dataset(config)
    collate = CollateFn(cutoff=4.0, target_infos=target_infos)
    batch = collate([dataset[i] for i in range(4)])

    agg = LossAggregator(target_infos, {"energy": {"type": "mse", "weight": 1.0}})
    assert set(agg.terms) == {"energy", "energy_grad_positions"}

    # loss against itself is zero
    zero = agg.compute(batch.targets, batch.targets)
    np.testing.assert_allclose(float(zero), 0.0, atol=1e-12)

    # shifted predictions give the expected MSE
    shifted = {
        "energy": batch.targets["energy"].map_values(lambda v: v + 1.0)
    }
    val = agg.compute(shifted, batch.targets)
    # energy term: mean((1)^2) = 1; gradient term: mean(1^2) = 1
    np.testing.assert_allclose(float(val), 2.0, rtol=1e-6)

    weighted = LossAggregator(
        target_infos,
        {"energy": {"type": "mse", "weight": 3.0, "gradients": {"positions": {"weight": 0.5}}}},
    )
    val_w = weighted.compute(shifted, batch.targets)
    np.testing.assert_allclose(float(val_w), 3.5, rtol=1e-6)

    # reference user-facing form: forces/stress nest in the target spec
    # (docs/src/concepts/loss-functions.rst), both dict and shorthand
    aliased = LossAggregator(
        target_infos,
        {"energy": {"type": "mse", "weight": 3.0, "forces": {"weight": 0.5}}},
    )
    np.testing.assert_allclose(
        float(aliased.compute(shifted, batch.targets)), 3.5, rtol=1e-6
    )
    shorthand = LossAggregator(
        target_infos, {"energy": {"type": "mse", "forces": "mae"}}
    )
    assert shorthand.terms["energy_grad_positions"].kind == "mae"


def test_metrics_accumulator(xyz_dataset):
    path, *_ = xyz_dataset
    config = {
        "systems": {"read_from": path},
        "targets": {
            "energy": {"quantity": "energy", "key": "energy", "forces": {"key": "forces"}}
        },
    }
    dataset, target_infos = get_dataset(config)
    collate = CollateFn(cutoff=4.0, target_infos=target_infos)
    batch = collate([dataset[i] for i in range(4)])

    acc = ErrorAccumulator()
    shifted = {"energy": batch.targets["energy"].map_values(lambda v: v + 2.0)}
    acc.update(shifted, batch.targets)
    out = acc.finalize(not_per_atom=["positions_gradients"])
    np.testing.assert_allclose(out["energy RMSE (per atom)"], 2.0, rtol=1e-6)
    np.testing.assert_allclose(out["energy MAE (per atom)"], 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        out["forces RMSE"], 2.0, rtol=1e-6
    )

    metrics = dict(out)
    metrics["loss"] = 0.5
    assert get_selected_metric(metrics, "loss") == 0.5
    assert get_selected_metric(metrics, "rmse_prod") == pytest.approx(4.0)


def test_combined_dataloader(xyz_dataset):
    path, *_ = xyz_dataset
    config = {
        "systems": {"read_from": path},
        "targets": {"energy": {"quantity": "energy", "key": "energy"}},
    }
    dataset, target_infos = get_dataset(config)
    collate = CollateFn(cutoff=4.0, target_infos=target_infos)
    l1 = DataLoader(dataset, BatchSampler(len(dataset), 4, seed=0), collate)
    l2 = DataLoader(dataset, BatchSampler(len(dataset), 6, seed=1), collate)
    combined = CombinedDataLoader([l1, l2], shuffle=True, seed=0)
    assert len(combined) == len(l1) + len(l2)
    assert len(list(combined)) == len(combined)


def test_custom_loss_registration(xyz_dataset):
    """register_loss extension point (reference dev-docs/new-loss)."""
    import jax.numpy as jnp

    from metatrain_tpu.engine.loss import _CUSTOM_LOSSES, register_loss

    def quartic(pred, tgt, valid, **kw):
        diff = jnp.where(valid, pred - jnp.nan_to_num(tgt), 0.0)
        return jnp.sum(diff**4), jnp.sum(valid.astype(diff.dtype))

    register_loss("quartic", quartic)
    try:
        path, *_ = xyz_dataset
        config = {
            "systems": {"read_from": path},
            "targets": {"energy": {"quantity": "energy", "key": "energy"}},
        }
        dataset, target_infos = get_dataset(config)
        collate = CollateFn(cutoff=4.0, target_infos=target_infos)
        batch = collate([dataset[i] for i in range(4)])
        agg = LossAggregator(target_infos, {"energy": "quartic"})
        shifted = {
            "energy": batch.targets["energy"].map_values(lambda v: v + 2.0)
        }
        np.testing.assert_allclose(
            float(agg.compute(shifted, batch.targets)), 16.0, rtol=1e-6
        )
    finally:
        _CUSTOM_LOSSES.pop("quartic", None)
