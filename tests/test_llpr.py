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


def test_llpr_ensemble_finetuning_reduces_loss(tmp_path):
    """Gradient-based ensemble finetuning (reference llpr/trainer.py:96-200)
    improves the ensemble's probabilistic fit."""
    base, dataset = _trained_base(tmp_path)
    wrapped = LLPRUncertaintyModel({}, wrapped=base)
    trainer = LLPRTrainer({"ensemble_size": 16, "seed": 0})
    trainer.train(wrapped, jnp.float32, [dataset], [dataset], str(tmp_path))
    w_before = np.asarray(wrapped.ensemble_weights["energy"]).copy()

    wrapped2 = LLPRUncertaintyModel({}, wrapped=base)
    trainer2 = LLPRTrainer(
        {"ensemble_size": 16, "seed": 0, "finetune_epochs": 50,
         "finetune_learning_rate": 1e-2}
    )
    trainer2.train(wrapped2, jnp.float32, [dataset], [dataset], str(tmp_path))
    w_after = np.asarray(wrapped2.ensemble_weights["energy"])
    # weights actually moved
    assert not np.allclose(w_before, w_after)
    assert np.isfinite(w_after).all()


def test_llpr_ensemble_forces(tmp_path):
    """Per-member ensemble energy gradients through the shared autograd
    engine (reference llpr/model.py:719): a multi-property gradient
    target pulled back in one vmapped backward."""
    from metatrain_tpu.data.target_info import get_generic_target_info
    from metatrain_tpu.engine.evaluate import evaluate_model

    base, dataset = _trained_base(tmp_path)
    wrapped = LLPRUncertaintyModel({}, wrapped=base)
    K = 5
    trainer = LLPRTrainer({"ensemble_size": K, "seed": 0})
    trainer.train(wrapped, jnp.float32, [dataset], [dataset], str(tmp_path))

    ens_name = "mtt::aux::energy_ensemble"
    from metatrain_tpu.containers import Labels
    from metatrain_tpu.data.target_info import _empty_block

    info = get_generic_target_info(
        "scalar", num_properties=K, quantity="energy", unit="eV"
    )
    # request per-member position gradients on the layout
    info.layout.block(0).add_gradient(
        "positions",
        _empty_block(
            ["sample", "system", "atom"],
            [Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))],
            info.layout.block(0).properties,
        ),
    )

    system = make_molecule(5, seed=33)
    nbr = compute_neighbor_data(system, wrapped.requested_neighbor_cutoff())
    batch = batch_from_systems([system], [nbr])
    preds = evaluate_model(
        wrapped.forward,
        wrapped.params,
        batch,
        {ens_name: info},
        is_training=False,
    )
    block = preds[ens_name].block(0)
    grads = np.asarray(block.gradient("positions").values)
    assert grads.shape == (batch.n_atoms_padded, 3, K)
    assert np.isfinite(grads).all()
    # member columns differ (distinct ensemble members)
    assert not np.allclose(grads[..., 0], grads[..., 1])

    # each member's gradient equals the gradient of that member's energy
    def member_energy(positions, k):
        out = wrapped.forward(
            wrapped.params, batch.replace(positions=positions), [ens_name]
        )
        return jnp.sum(out[ens_name].block(0).values[:1, k])

    g0 = np.asarray(jax.grad(lambda p: member_energy(p, 0))(batch.positions))
    np.testing.assert_allclose(grads[..., 0], g0, rtol=1e-4, atol=1e-6)


def test_llpr_variance_nonnegative_and_calibration_recovers_noise(tmp_path):
    """The variance path must be PSD-safe (sum of squares of a triangular
    solve, reference llpr/model.py:460-466): rank-deficient covariances
    (few samples, many features) must never yield negative variances, and
    with targets = model + noise the calibrated sigma on a training frame
    recovers the injected noise scale."""
    base, dataset = _trained_base(tmp_path)

    rng = np.random.default_rng(3)
    noise = 0.05
    systems, energies = [], []
    from metatrain_tpu.containers import Labels, TensorBlock, TensorMap

    for i in range(12):
        s = make_molecule(5, seed=50 + i)
        nbr = compute_neighbor_data(s, base.cutoff)
        b = batch_from_systems([s], [nbr])
        e = float(
            np.asarray(
                base.forward_eval(base.params, b, ["energy"])["energy"]
                .block()
                .values
            )[0, 0]
        )
        systems.append(s)
        energies.append(
            TensorMap(
                Labels.single(),
                [
                    TensorBlock(
                        values=np.array([[e + rng.normal(0, noise)]]),
                        samples=Labels.range("system", 1),
                        components=(),
                        properties=Labels.range("energy", 1),
                    )
                ],
            )
        )
    train = Dataset(systems, {"energy": energies})

    llpr = LLPRUncertaintyModel({}, wrapped=base)
    llpr.init_params(None)
    llpr.compute_covariance([train])
    llpr.compute_inverse_covariance()
    llpr.calibrate(train, method="ratio")

    sigmas = []
    for i in range(6):
        nbr = compute_neighbor_data(systems[i], base.cutoff)
        b = batch_from_systems([systems[i]], [nbr])
        v = llpr._raw_variance(b, "energy") * llpr.calibration["energy"]
        v = float(np.asarray(jax.device_get(v))[0])
        assert v >= 0.0  # PSD by construction
        sigmas.append(np.sqrt(v))
    mean_sigma = float(np.mean(sigmas))
    # in-distribution calibrated sigma tracks the injected noise scale
    assert noise / 5 < mean_sigma < noise * 5
