"""LLPR uncertainty wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.models.llpr import LLPRTrainer, LLPRUncertaintyModel
from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


def _trained_base(tmp_path):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(10):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    types = sorted({int(t) for s in systems for t in s.types})
    ds_info = DatasetInfo("angstrom", types, infos)
    dataset = Dataset(systems, targets)

    model = SoapBpnn(
        {
            "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
            "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
        },
        ds_info,
    )
    trainer = SoapBpnnTrainer({"num_epochs": 1, "batch_size": 5})
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    return model, dataset


def test_llpr_uncertainty_pipeline(tmp_path):
    base, dataset = _trained_base(tmp_path)
    llpr = LLPRUncertaintyModel({"ensemble_size": 4}, wrapped=base)
    trainer = LLPRTrainer({"ensemble_size": 4, "seed": 0})
    trainer.train(llpr, jnp.float32, [dataset], [dataset], str(tmp_path))

    assert "energy" in llpr.covariances
    F = base.last_layer_feature_size
    assert llpr.covariances["energy"].shape == (F, F)
    assert llpr.calibration["energy"] > 0

    system = dataset[0].system
    nbr = compute_neighbor_data(system, base.cutoff)
    batch = batch_from_systems([system], [nbr])
    out = llpr.forward(
        llpr.params,
        batch,
        ["energy", "mtt::aux::energy_uncertainty", "mtt::aux::energy_ensemble"],
    )
    unc = np.asarray(out["mtt::aux::energy_uncertainty"].block().values)
    assert unc.shape[1] == 1 and (unc[np.asarray(batch.system_mask)] >= 0).all()
    ens = np.asarray(out["mtt::aux::energy_ensemble"].block().values)
    assert ens.shape[1] == 4

    # ensemble spread should correlate with the predicted variance scale
    mean_pred = np.asarray(out["energy"].block().values)[0, 0]
    assert np.isfinite(ens).all()
    assert abs(ens[0].mean() - mean_pred) < 5 * np.sqrt(max(unc[0, 0], 1e-12)) + 1e-3

    # checkpoint roundtrip
    trainer.save_checkpoint(llpr, str(tmp_path / "llpr.ckpt"))
    from metatrain_tpu.utils.io import model_from_checkpoint

    restored = model_from_checkpoint(str(tmp_path / "llpr.ckpt"))
    out2 = restored.forward(
        restored.params, batch, ["energy", "mtt::aux::energy_uncertainty"]
    )
    np.testing.assert_allclose(
        np.asarray(out2["mtt::aux::energy_uncertainty"].block().values),
        unc,
        rtol=1e-5,
    )


def test_llpr_uncertainty_larger_for_outliers(tmp_path):
    base, dataset = _trained_base(tmp_path)
    llpr = LLPRUncertaintyModel({}, wrapped=base)
    llpr.compute_covariance([dataset])
    llpr.compute_inverse_covariance()
    llpr.init_params()

    # in-distribution molecule
    system_in = dataset[0].system
    # far out of distribution: stretched geometry
    system_out = make_molecule(5, seed=99)
    system_out.positions = system_out.positions * 2.5

    def variance(system):
        nbr = compute_neighbor_data(system, base.cutoff)
        batch = batch_from_systems([system], [nbr])
        out = llpr.forward(llpr.params, batch, ["mtt::aux::energy_uncertainty"])
        return float(
            np.asarray(out["mtt::aux::energy_uncertainty"].block().values)[0, 0]
        )

    assert variance(system_out) > variance(system_in)
