"""Data-parallel training on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer
from metatrain_tpu.parallel.slurm import expand_first_host, slurm_world

from conftest import make_molecule


def _dataset(n=48):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(n):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    types = sorted({int(t) for s in systems for t in s.types})
    return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)


HYPERS = {
    "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
    "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
}


def test_dp_training_runs_and_learns(tmp_path):
    assert jax.local_device_count() == 8
    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    trainer = SoapBpnnTrainer(
        {
            "num_epochs": 3,
            "batch_size": 3,  # 16 batches/epoch -> 2 DP super-steps of 8
            "learning_rate": 5e-3,
            "data_parallel": True,
            "o3_augmentation": False,
        }
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    import csv

    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert np.isfinite(float(rows[-1]["train loss"]))
    assert float(rows[-1]["train loss"]) < float(rows[0]["train loss"])


def test_dp_matches_single_device_when_loss_converges(tmp_path):
    """DP and single-device runs start from the same init and both learn."""
    dataset, ds_info = _dataset(32)

    def run(data_parallel, out):
        model = SoapBpnn(HYPERS, ds_info)
        trainer = SoapBpnnTrainer(
            {
                "num_epochs": 2,
                "batch_size": 2,
                "learning_rate": 1e-3,
                "data_parallel": data_parallel,
                "o3_augmentation": False,
                "seed": 0,
            }
        )
        trainer.train(model, jnp.float32, [dataset], [dataset], str(out))
        return model

    m_dp = run(True, tmp_path / "dp")
    m_single = run(False, tmp_path / "single")
    # both produced finite, trained parameters
    leaves_dp = jax.tree_util.tree_leaves(m_dp.params)
    leaves_s = jax.tree_util.tree_leaves(m_single.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves_dp)
    assert len(leaves_dp) == len(leaves_s)


def test_slurm_nodelist_parsing():
    assert expand_first_host("node1,node2") == "node1"
    assert expand_first_host("node[001-004]") == "node001"
    assert expand_first_host("gpu[3,7-9]") == "gpu3"
    assert expand_first_host("a[1-2]b") == "a1b"


def test_slurm_world_from_env(monkeypatch):
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "2")
    monkeypatch.setenv("SLURM_LOCALID", "0")
    monkeypatch.setenv("SLURM_JOB_NODELIST", "tpu[01-04]")
    world = slurm_world()
    assert world["num_processes"] == 4
    assert world["process_id"] == 2
    assert world["coordinator"] == "tpu01"

    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert slurm_world() is None
