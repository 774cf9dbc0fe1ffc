"""FlashMD-symplectic: the step map must be exactly symplectic."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.models.flashmd_symplectic import (
    FlashMDSymplectic,
    FlashMDSymplecticTrainer,
)
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
    "effective_timestep": 0.3,
}


def _md_dataset(n=4):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(n):
        s = make_molecule(4, seed=i)
        momenta = rng.normal(size=(4, 3)) * 0.1
        s.extra["momenta"] = momenta
        s.extra["masses"] = np.full(4, 12.0)
        s.extra["future_positions"] = s.positions + 0.05 * momenta
        s.extra["future_momenta"] = momenta * 0.9
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {
            "positions": {
                "key": "future_positions",
                "per_atom": True,
                "type": {"cartesian": {"rank": 1}},
            },
            "momenta": {
                "key": "future_momenta",
                "per_atom": True,
                "type": {"cartesian": {"rank": 1}},
            },
        },
    )
    types = sorted({int(t) for s in systems for t in s.types})
    return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)


def test_step_map_is_symplectic():
    dataset, ds_info = _md_dataset()
    model = FlashMDSymplectic(SMALL_HYPERS, ds_info, compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(0))

    system = dataset[0].system
    nbr = compute_neighbor_data(system, model.cutoff)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=4,  # no padding: the Jacobian must be square on
        n_systems_padded=2,  # the real phase space
        extra_keys=["momenta", "masses"],
        dtype=jnp.float64,
    )
    phase_map = model.step_map(params, batch)

    q0 = batch.positions
    p0 = jnp.asarray(batch.extra["momenta"], dtype=jnp.float64)
    n = q0.size

    def flat_map(z):
        q = z[:n].reshape(q0.shape)
        p = z[n:].reshape(p0.shape)
        q1, p1 = phase_map(q, p)
        return jnp.concatenate([q1.reshape(-1), p1.reshape(-1)])

    z0 = jnp.concatenate([q0.reshape(-1), p0.reshape(-1)])
    J = jax.jacfwd(flat_map)(z0)
    omega = np.block(
        [
            [np.zeros((n, n)), np.eye(n)],
            [-np.eye(n), np.zeros((n, n))],
        ]
    )
    residual = np.asarray(J).T @ omega @ np.asarray(J) - omega
    assert np.abs(residual).max() < 1e-8  # exact symplecticity (f64)

    # and the map is non-trivial
    q1, p1 = phase_map(q0, p0)
    assert not np.allclose(np.asarray(q1), np.asarray(q0))


def test_symplectic_training_smoke(tmp_path):
    dataset, ds_info = _md_dataset()
    model = FlashMDSymplectic(SMALL_HYPERS, ds_info)
    trainer = FlashMDSymplecticTrainer(
        {"num_epochs": 2, "batch_size": 2, "learning_rate": 1e-3}
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert np.isfinite(float(rows[-1]["train loss"]))
