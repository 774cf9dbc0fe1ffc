"""GAP closed-form fit and ZBL baseline."""

import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.gap import GAP, GAPTrainer
from metatrain_tpu.models.zbl import ZBL
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


def _lj_energy(system, epsilon=0.3, sigma=1.8):
    from metatrain_tpu.ops.neighbors import neighbor_pairs

    c, n, s = neighbor_pairs(system.positions, system.cell, system.pbc, 6.0)
    if len(c) == 0:
        return 0.0
    r = np.linalg.norm(
        system.positions[n] - system.positions[c] + s @ system.cell, axis=1
    )
    x6 = (sigma / r) ** 6
    return float(0.5 * (4 * epsilon * (x6**2 - x6)).sum())


def _gap_dataset(n=20):
    systems = []
    for i in range(n):
        s = make_molecule(6, seed=i, types=(6,))
        s.extra["energy"] = np.asarray(_lj_energy(s))
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    ds_info = DatasetInfo("angstrom", [6], infos)
    return Dataset(systems, targets), ds_info


def test_gap_fits_pair_potential(tmp_path):
    dataset, ds_info = _gap_dataset()
    model = GAP(
        {
            "soap": {
                "max_radial": 3,
                "max_angular": 3,
                "cutoff": {"radius": 4.5, "width": 0.5},
            },
            "krr": {"num_sparse_points": 60, "degree": 2, "regularizer": 1e-4},
        },
        ds_info,
    )
    trainer = GAPTrainer({"regularizer": 1e-4})
    trainer.train(model, jnp.float64, [dataset], [dataset], str(tmp_path))

    # in-sample predictions should be close to the targets
    errors = []
    for i in range(len(dataset)):
        system = dataset[i].system
        nbr = compute_neighbor_data(system, model.cutoff)
        batch = batch_from_systems([system], [nbr], dtype=jnp.float64)
        pred = float(
            np.asarray(
                model.forward_eval(model.params, batch, ["energy"])["energy"]
                .block()
                .values
            )[0, 0]
        )
        target = float(np.asarray(dataset[i].targets["energy"].block().values)[0, 0])
        errors.append(abs(pred - target))
    targets = [
        float(np.asarray(dataset[i].targets["energy"].block().values)[0, 0])
        for i in range(len(dataset))
    ]
    rmse = np.sqrt(np.mean(np.square(errors)))
    assert rmse < 0.2 * np.std(targets)

    # forces via the shared engine are finite
    info = get_energy_target_info("eV", add_position_gradients=True)
    system = dataset[0].system
    nbr = compute_neighbor_data(system, model.cutoff)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float64)
    preds = evaluate_model(model.forward, model.params, batch, {"energy": info})
    forces = np.asarray(preds["energy"].block().gradient("positions").values)
    assert np.isfinite(forces).all() and np.abs(forces).max() > 0

    # checkpoint roundtrip
    trainer.save_checkpoint(model, str(tmp_path / "gap.ckpt"))
    from metatrain_tpu.utils.io import model_from_checkpoint

    restored = model_from_checkpoint(str(tmp_path / "gap.ckpt"))
    pred2 = float(
        np.asarray(
            restored.forward_eval(restored.params, batch, ["energy"])["energy"]
            .block()
            .values
        )[0, 0]
    )
    pred1 = float(
        np.asarray(
            model.forward_eval(model.params, batch, ["energy"])["energy"]
            .block()
            .values
        )[0, 0]
    )
    np.testing.assert_allclose(pred1, pred2, rtol=1e-10)


def test_zbl_device_host_consistency():
    ds_info = DatasetInfo(
        "angstrom", [1, 6, 8], {"energy": get_energy_target_info("eV")}
    )
    zbl = ZBL(ds_info, cutoff=4.0)
    system = make_molecule(6, seed=3)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float64)

    device_e = float(
        np.asarray(zbl.forward(batch, ["energy"])["energy"].block().values)[0, 0]
    )
    host = zbl.predict_host(system)
    np.testing.assert_allclose(device_e, host["energy"], rtol=1e-8)

    # host analytic gradient matches finite differences
    eps = 1e-6
    for a in range(2):
        for d in range(3):
            pos_p, pos_m = system.positions.copy(), system.positions.copy()
            pos_p[a, d] += eps
            pos_m[a, d] -= eps
            sp = System(pos_p, system.types, system.cell, system.pbc)
            sm = System(pos_m, system.types, system.cell, system.pbc)
            num = (
                zbl.predict_host(sp)["energy"] - zbl.predict_host(sm)["energy"]
            ) / (2 * eps)
            np.testing.assert_allclose(
                host["position_gradient"][a, d], num, rtol=1e-5, atol=1e-8
            )


def test_zbl_repulsive_and_smooth():
    ds_info = DatasetInfo("angstrom", [6], {"energy": get_energy_target_info("eV")})
    zbl = ZBL(ds_info, cutoff=4.0)

    def dimer(r):
        return System(
            np.array([[0.0, 0, 0], [r, 0, 0]]),
            np.array([6, 6]),
            np.zeros((3, 3)),
            np.zeros(3, dtype=bool),
        )

    e1 = zbl.predict_host(dimer(0.8))["energy"]
    e2 = zbl.predict_host(dimer(1.5))["energy"]
    e3 = zbl.predict_host(dimer(3.99))["energy"]
    e4 = zbl.predict_host(dimer(4.01))["energy"]
    assert e1 > e2 > e3 > 0
    assert e4 == 0.0
    assert e3 < 1e-2  # smoothly vanishing at the cutoff


def _lj_forces(system, epsilon=0.3, sigma=1.8):
    from metatrain_tpu.ops.neighbors import neighbor_pairs

    c, n, s = neighbor_pairs(system.positions, system.cell, system.pbc, 6.0)
    forces = np.zeros_like(system.positions)
    vec = system.positions[n] - system.positions[c] + s @ system.cell
    r = np.linalg.norm(vec, axis=1)
    x6 = (sigma / r) ** 6
    # dE/dr for the 0.5-weighted full pair list
    dedr = 0.5 * 4 * epsilon * (-12 * x6**2 + 6 * x6) / r
    contrib = dedr[:, None] * vec / r[:, None]
    np.add.at(forces, c, contrib)
    np.add.at(forces, n, -contrib)
    return forces


def test_gap_force_rows_improve_forces(tmp_path):
    """Fitting energies AND gradient rows (reference gap/model.py:324,648)
    must materially beat the energy-only fit on force RMSE."""
    import jax

    systems = []
    for i in range(24):
        s = make_molecule(6, seed=100 + i, types=(6,))
        s.extra["energy"] = np.asarray(_lj_energy(s))
        s.extra["forces"] = _lj_forces(s)
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
    ds_info = DatasetInfo("angstrom", [6], infos)
    dataset = Dataset(systems, targets)

    hypers = {"krr": {"num_sparse_points": 40, "degree": 2}}

    def force_rmse(model):
        errs = []
        for i in range(4):
            s = make_molecule(6, seed=500 + i, types=(6,))
            ref = _lj_forces(s)
            nbr = compute_neighbor_data(s, model.cutoff)
            batch = batch_from_systems([s], [nbr], dtype=jnp.float64)
            preds = evaluate_model(
                model.forward_eval,
                model.params,
                batch,
                {"energy": ds_info.targets["energy"]},
                is_training=False,
            )
            grad = np.asarray(
                preds["energy"].block().gradient("positions").values
            )[: len(s), :, 0]
            errs.append(((-grad) - ref) ** 2)
        return float(np.sqrt(np.mean(np.concatenate(errs))))

    # energy-only: strip the gradient from the dataset info/targets
    targets_e, infos_e = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
    )
    ds_info_e = DatasetInfo("angstrom", [6], infos_e)
    model_e = GAP(hypers, ds_info_e)
    GAPTrainer({"seed": 0}).train(
        model_e, jnp.float64, [Dataset(systems, targets_e)], [], str(tmp_path)
    )

    model_f = GAP(hypers, ds_info)
    GAPTrainer({"seed": 0}).train(
        model_f, jnp.float64, [dataset], [], str(tmp_path)
    )

    rmse_e = force_rmse(model_e)
    rmse_f = force_rmse(model_f)
    assert rmse_f < 0.7 * rmse_e, (rmse_f, rmse_e)
