"""FlashMD: direct MD-step prediction."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.models.flashmd import FlashMD, FlashMDTrainer
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


SMALL_HYPERS = {
    "cutoff": 4.0,
    "d_pet": 16,
    "d_head": 16,
    "d_node": 24,
    "d_feedforward": 16,
    "num_heads": 2,
    "num_attention_layers": 1,
    "num_gnn_layers": 1,
}


def _md_dataset(n=6):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(n):
        s = make_molecule(5, seed=i)
        momenta = rng.normal(size=(5, 3))
        s.extra["momenta"] = momenta
        s.extra["masses"] = np.full(5, 12.0)
        # fake MD step: drift + noise
        s.extra["future_positions"] = s.positions + 0.1 * momenta
        s.extra["future_momenta"] = momenta * 0.95
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {
            "positions": {
                "key": "future_positions",
                "quantity": "",
                "unit": "angstrom",
                "per_atom": True,
                "type": {"cartesian": {"rank": 1}},
            },
            "momenta": {
                "key": "future_momenta",
                "quantity": "",
                "unit": "",
                "per_atom": True,
                "type": {"cartesian": {"rank": 1}},
            },
        },
    )
    types = sorted({int(t) for s in systems for t in s.types})
    return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)


def test_flashmd_forward_shapes():
    dataset, ds_info = _md_dataset()
    model = FlashMD(SMALL_HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))

    system = dataset[0].system
    nbr = compute_neighbor_data(system, model.cutoff)
    batch = batch_from_systems(
        [system], [nbr], extra_keys=["momenta", "masses"]
    )
    out = model.forward(params, batch, ["positions", "momenta"])
    pos_block = out["positions"].block()
    assert pos_block.values.shape == (batch.n_atoms_padded, 3, 1)
    assert np.isfinite(np.asarray(pos_block.values)).all()

    # eval adds the current positions back (PositionAdditive semantics)
    out_eval = model.forward_eval(params, batch, ["positions"])
    raw = np.asarray(out["positions"].block().values)[:, :, 0]
    evaled = np.asarray(out_eval["positions"].block().values)[:, :, 0]
    scale = model.scaler.scale_value("positions")[0]
    np.testing.assert_allclose(
        evaled,
        raw * scale + np.asarray(batch.positions),
        rtol=1e-5,
        atol=1e-5,
    )


def test_flashmd_momentum_conditioning_matters():
    dataset, ds_info = _md_dataset()
    model = FlashMD(SMALL_HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))
    # break the zero-init gate so conditioning actually flows
    import jax.tree_util as jtu

    params = jtu.tree_map(
        lambda x: x + 0.05 if x.ndim >= 2 else x, params
    )

    system = dataset[0].system
    nbr = compute_neighbor_data(system, model.cutoff)
    b1 = batch_from_systems([system], [nbr], extra_keys=["momenta", "masses"])
    system2 = dataset[1].system  # different momenta
    system2.positions = system.positions.copy()
    system2.types = system.types.copy()
    nbr2 = compute_neighbor_data(system2, model.cutoff)
    b2 = batch_from_systems([system2], [nbr2], extra_keys=["momenta", "masses"])

    o1 = np.asarray(model.forward(params, b1, ["momenta"])["momenta"].block().values)
    o2 = np.asarray(model.forward(params, b2, ["momenta"])["momenta"].block().values)
    assert not np.allclose(o1, o2)


def test_flashmd_training_smoke(tmp_path):
    dataset, ds_info = _md_dataset()
    model = FlashMD(SMALL_HYPERS, ds_info)
    trainer = FlashMDTrainer(
        {"num_epochs": 2, "batch_size": 3, "learning_rate": 1e-3}
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert np.isfinite(float(rows[-1]["train loss"]))


def test_forward_eval_accepts_positional_selected_atoms():
    """Wrappers (LLPR) call forward_eval with 4 positional args;
    regression: the override dropped the selected_atoms parameter."""
    dataset, ds_info = _md_dataset()
    model = FlashMD(SMALL_HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))
    system = dataset[0].system
    nbr = compute_neighbor_data(system, model.cutoff)
    batch = batch_from_systems(
        [system], [nbr], extra_keys=["momenta", "masses"]
    )
    out = model.forward_eval(params, batch, ["positions"], None)
    assert "positions" in out
