"""Optional wandb logging: stubbed-module behavior + graceful degrade."""

import sys
import types

from metatrain_tpu.utils.wandb_logging import WandbLogger


def test_wandb_logger_degrades_without_wandb(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    logger = WandbLogger({"project": "x"}, {"seed": 1})
    assert not logger.active
    logger.log({"loss": 1.0}, step=0)  # no-op, no crash
    logger.finish()


def test_wandb_logger_forwards_to_stub(monkeypatch):
    calls = {"init": None, "log": [], "finished": False}

    class FakeRun:
        def log(self, metrics, step=None):
            calls["log"].append((dict(metrics), step))

        def finish(self):
            calls["finished"] = True

    stub = types.ModuleType("wandb")

    def init(config=None, **kwargs):
        calls["init"] = {"config": config, "kwargs": kwargs}
        return FakeRun()

    stub.init = init
    monkeypatch.setitem(sys.modules, "wandb", stub)

    options = {"seed": 7, "architecture": {"name": "pet"}}
    logger = WandbLogger({"project": "proj", "name": "run"}, options)
    assert logger.active
    assert calls["init"]["config"] == options
    assert calls["init"]["kwargs"] == {"project": "proj", "name": "run"}

    logger.log({"train loss": 0.5}, step=3)
    assert calls["log"] == [({"train loss": 0.5}, 3)]
    logger.finish()
    assert calls["finished"]
    assert not logger.active


def test_trainer_emits_wandb_metrics(monkeypatch, tmp_path):
    """The NN trainer logs per-epoch metrics through an attached logger."""
    import jax
    import numpy as np

    from metatrain_tpu.data.dataset import Dataset
    from metatrain_tpu.data.readers import read_targets
    from metatrain_tpu.data.target_info import DatasetInfo
    from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

    from conftest import make_molecule

    rng = np.random.default_rng(0)
    systems = []
    for i in range(6):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
    )
    types = sorted({int(t) for s in systems for t in s.types})
    dataset = Dataset(systems, targets)
    model = SoapBpnn(
        {
            "soap": {"max_angular": 1, "max_radial": 1,
                     "cutoff": {"radius": 4.0}},
            "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 4},
        },
        DatasetInfo("angstrom", types, infos),
    )

    logged = []

    class FakeLogger:
        active = True

        def log(self, metrics, step=None):
            logged.append((metrics, step))

        def finish(self):
            pass

    trainer = SoapBpnnTrainer({"num_epochs": 2, "batch_size": 3})
    trainer.wandb_logger = FakeLogger()
    trainer.train(model, jax.numpy.float32, [dataset], [dataset], str(tmp_path))
    assert logged, "trainer never called the wandb logger"
    metrics, _ = logged[-1]
    assert any("loss" in key for key in metrics)
