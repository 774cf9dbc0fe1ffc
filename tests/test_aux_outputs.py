"""Auxiliary outputs: features, last-layer features, conditioning, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.loss import block_loss_terms
from metatrain_tpu.containers import Labels, TensorBlock
from metatrain_tpu.models.pet import PET
from metatrain_tpu.models.soap_bpnn import SoapBpnn
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


PET_HYPERS = {
    "cutoff": 4.0,
    "d_pet": 16,
    "d_head": 16,
    "d_node": 24,
    "d_feedforward": 16,
    "num_heads": 2,
    "num_attention_layers": 1,
    "num_gnn_layers": 1,
}


def _info():
    return DatasetInfo(
        "angstrom", [1, 6, 8], {"energy": get_energy_target_info("eV")}
    )


def _batch(model, systems):
    nbrs = [
        compute_neighbor_data(s, model.requested_neighbor_cutoff())
        for s in systems
    ]
    return batch_from_systems(
        systems, nbrs, extra_keys=list(model.requested_extra_system_keys())
    )


def test_pet_features_and_ll_outputs():
    model = PET(PET_HYPERS, _info())
    params = model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(6, seed=1)
    batch = _batch(model, [system])
    out = model.forward(
        params,
        batch,
        ["energy", "features", "mtt::aux::energy_last_layer_features"],
    )
    feats = out["features"].block()
    assert feats.values.shape[0] == batch.n_atoms_padded
    assert np.asarray(feats.mask).sum() == 6
    ll = out["mtt::aux::energy_last_layer_features"].block()
    assert ll.values.shape[-1] == model.last_layer_feature_size
    assert np.isfinite(np.asarray(ll.values)).all()


def test_soap_bpnn_features_output():
    model = SoapBpnn(
        {
            "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
            "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
        },
        _info(),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(model, [make_molecule(5, seed=2)])
    out = model.forward(params, batch, ["features", "energy"])
    assert "features" in out and "energy" in out


def test_pet_conditioning_changes_predictions():
    model = PET(dict(PET_HYPERS, system_conditioning=True), _info())
    params = model.init_params(jax.random.PRNGKey(0))
    # perturb the zero-init gate so conditioning flows
    params = jax.tree_util.tree_map(
        lambda x: x + 0.1 if x.ndim == 2 else x, params
    )
    system = make_molecule(6, seed=3)
    system.extra["charge"] = np.asarray(0.0)
    system.extra["spin_multiplicity"] = np.asarray(1.0)
    b_neutral = _batch(model, [system])

    charged = make_molecule(6, seed=3)
    charged.extra["charge"] = np.asarray(1.0)
    charged.extra["spin_multiplicity"] = np.asarray(2.0)
    b_charged = _batch(model, [charged])

    e0 = float(np.asarray(model.forward(params, b_neutral, ["energy"])["energy"].block().values)[0, 0])
    e1 = float(np.asarray(model.forward(params, b_charged, ["energy"])["energy"].block().values)[0, 0])
    assert abs(e0 - e1) > 1e-8


def _scalar_block(values, mask=None):
    values = jnp.asarray(values)
    return TensorBlock(
        values=values,
        samples=Labels.range("system", values.shape[0]),
        components=[],
        properties=Labels.range("p", values.shape[-1]),
        mask=None if mask is None else jnp.asarray(mask),
    )


def test_shift_agnostic_mse():
    target = _scalar_block(np.array([[1.0, 2.0, 3.0]]))
    shifted_pred = _scalar_block(np.array([[11.0, 12.0, 13.0]]))
    s, c = block_loss_terms("shift_agnostic_mse", shifted_pred, target)
    np.testing.assert_allclose(float(s), 0.0, atol=1e-10)

    not_shifted = _scalar_block(np.array([[1.0, 2.0, 4.0]]))
    s2, _ = block_loss_terms("shift_agnostic_mse", not_shifted, target)
    assert float(s2) > 0


def test_gaussian_nll_and_crps():
    rng = np.random.default_rng(0)
    ensemble = _scalar_block(rng.normal(size=(4, 8)))
    target = _scalar_block(np.zeros((4, 8)))  # target broadcast over members
    s, c = block_loss_terms("gaussian_nll", ensemble, target)
    assert np.isfinite(float(s)) and float(c) == 4

    s2, c2 = block_loss_terms("crps", ensemble, target)
    assert float(s2) > 0 and float(c2) == 4
    # CRPS decreases when the ensemble is centered on the target
    centered = _scalar_block(rng.normal(size=(4, 8)) * 0.01)
    s3, _ = block_loss_terms("crps", centered, target)
    assert float(s3) < float(s2)


@pytest.fixture
def pet_model_batch():
    model = PET(PET_HYPERS, _info())
    model.init_params(jax.random.PRNGKey(0))
    batch = _batch(model, [make_molecule(6, seed=1)])
    return model, batch


def test_diagnostic_feature_outputs(pet_model_batch):
    """mtt::feature:: intermediate capture (reference
    pet/modules/diagnostic.py): node-like and edge-like tensors."""
    import numpy as np

    model, batch = pet_model_batch
    node_name = "mtt::feature::backbone.gnn_layer_0.layer_0.0"
    edge_name = "mtt::feature::backbone.gnn_layer_0.layer_0.1"
    out = model.forward(model.params, batch, [node_name, edge_name])

    node_map = out[node_name].block()
    assert node_map.values.ndim == 2
    assert node_map.values.shape[0] == batch.n_atoms_padded
    assert list(node_map.samples.names) == ["system", "atom"]
    assert np.isfinite(np.asarray(node_map.values)).all()

    edge_map = out[edge_name].block()
    A, M = batch.nbr_indices.shape
    assert edge_map.values.shape[0] == A * M
    assert list(edge_map.samples.names) == [
        "system", "first_atom", "second_atom",
        "cell_shift_a", "cell_shift_b", "cell_shift_c",
    ]
    # masked (padded) edges are zeroed
    em = np.asarray(edge_map.mask)
    assert (np.asarray(edge_map.values)[~em] == 0).all()


def test_diagnostic_unknown_path_raises(pet_model_batch):
    import pytest

    model, batch = pet_model_batch
    with pytest.raises(KeyError, match="not found"):
        model.forward(
            model.params, batch, ["mtt::feature::backbone.nope"]
        )


def test_pet_cutoff_stats_output(pet_model_batch):
    """mtt::aux::cutoff_stats (reference pet/model.py:125-133)."""
    model, batch = pet_model_batch
    out = model.forward(
        model.params, batch, ["energy", "mtt::aux::cutoff_stats"]
    )
    stats = out["mtt::aux::cutoff_stats"].block()
    assert stats.values.shape == (batch.n_atoms_padded, 2)
    vals = np.asarray(stats.values)
    m = np.asarray(stats.mask)
    # fixed cutoff model: column 0 equals the cutoff radius
    np.testing.assert_allclose(vals[m, 0], model.cutoff)
    # smoothed neighbor counts are positive and bounded by real neighbors
    assert (vals[m, 1] > 0).all()
    assert (vals[m, 1] <= np.asarray(batch.nbr_mask).sum(1)[m] + 1e-6).all()
