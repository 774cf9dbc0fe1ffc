"""CLI integration tests: the full train -> export -> eval path."""

import subprocess
import sys

import numpy as np
import pytest
import yaml

from metatrain_tpu.data.readers.extxyz import write_xyz
from metatrain_tpu.utils.config import (
    MetatrainConfigError,
    expand_dataset_config,
    validate_base_options,
)

from conftest import make_molecule


@pytest.fixture
def dataset_file(tmp_path):
    rng = np.random.default_rng(0)
    systems, infos, arrays = [], [], []
    for i in range(12):
        s = make_molecule(4 + i % 3, seed=i)
        systems.append(s)
        infos.append({"energy": float(rng.normal())})
        arrays.append({"forces": rng.normal(size=(len(s), 3))})
    path = str(tmp_path / "data.xyz")
    write_xyz(path, systems, per_atom_arrays=arrays, info=infos)
    return path


def test_expand_dataset_config_shorthands(dataset_file):
    expanded = expand_dataset_config(dataset_file)
    assert expanded["systems"]["read_from"] == dataset_file
    assert "energy" in expanded["targets"]
    energy = expanded["targets"]["energy"]
    assert energy["quantity"] == "energy"
    assert energy["unit"] == "eV"
    assert energy["forces"] is None

    expanded2 = expand_dataset_config(
        {
            "systems": dataset_file,
            "targets": {"energy": {"forces": "on", "stress": False}},
        }
    )
    assert expanded2["targets"]["energy"]["forces"] == {"key": "forces"}
    assert expanded2["targets"]["energy"]["stress"] is None


def test_validate_base_options_errors(dataset_file):
    with pytest.raises(MetatrainConfigError):
        validate_base_options({"architecture": {"name": "nope"}, "training_set": dataset_file})
    with pytest.raises(MetatrainConfigError):
        validate_base_options(
            {
                "architecture": {"name": "pet"},
                "training_set": dataset_file,
                "base_precision": 8,
            }
        )
    with pytest.raises(MetatrainConfigError):
        validate_base_options(
            {
                "architecture": {"name": "pet"},
                "training_set": dataset_file,
                "validation_set": 1.5,
            }
        )


def test_train_eval_export_cli(tmp_path, dataset_file, monkeypatch):
    options = {
        "seed": 0,
        "architecture": {
            "name": "soap_bpnn",
            "model": {
                "soap": {
                    "max_angular": 2,
                    "max_radial": 2,
                    "cutoff": {"radius": 4.0},
                },
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
            },
            "training": {"num_epochs": 2, "batch_size": 6},
        },
        "training_set": {
            "systems": {"read_from": dataset_file, "length_unit": "angstrom"},
            "targets": {
                "energy": {"key": "energy", "unit": "eV", "forces": "on"}
            },
        },
        "validation_set": 0.2,
        "test_set": 0.0,
    }
    options_path = tmp_path / "options.yaml"
    with open(options_path, "w") as f:
        yaml.safe_dump(options, f)

    monkeypatch.chdir(tmp_path)
    from metatrain_tpu.__main__ import main

    assert main(["train", str(options_path)]) == 0

    out_dirs = list((tmp_path / "outputs").glob("*/*"))
    assert len(out_dirs) == 1
    assert (out_dirs[0] / "model.ckpt").exists()
    assert (out_dirs[0] / "options_restart.yaml").exists()
    assert (out_dirs[0] / "train.csv").exists()
    assert (tmp_path / "model.mtt").exists()

    # eval the exported model on the same dataset
    eval_options = {
        "systems": {"read_from": dataset_file},
        "targets": {"energy": {"key": "energy", "forces": "on"}},
    }
    eval_path = tmp_path / "eval.yaml"
    with open(eval_path, "w") as f:
        yaml.safe_dump(eval_options, f)
    assert (
        main(
            [
                "eval",
                str(tmp_path / "model.mtt"),
                str(eval_path),
                "-o",
                str(tmp_path / "predictions.xyz"),
            ]
        )
        == 0
    )
    assert (tmp_path / "predictions.xyz").exists()
    from metatrain_tpu.data.readers.extxyz import read_xyz

    predictions = read_xyz(str(tmp_path / "predictions.xyz"))
    assert len(predictions) == 12
    assert "energy" in predictions[0].extra
    assert "energy_forces" in predictions[0].extra

    # export from the checkpoint
    assert (
        main(
            [
                "export",
                str(out_dirs[0] / "model.ckpt"),
                "-o",
                str(tmp_path / "exported2.mtt"),
            ]
        )
        == 0
    )
    assert (tmp_path / "exported2.mtt").exists()


def test_restart_continues_training(tmp_path, dataset_file, monkeypatch):
    options = {
        "architecture": {
            "name": "soap_bpnn",
            "model": {
                "soap": {
                    "max_angular": 1,
                    "max_radial": 1,
                    "cutoff": {"radius": 4.0},
                },
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 4},
            },
            "training": {"num_epochs": 2, "batch_size": 6},
        },
        "training_set": {
            "systems": {"read_from": dataset_file, "length_unit": "angstrom"},
            "targets": {"energy": {"key": "energy"}},
        },
        "validation_set": 0.2,
    }
    options_path = tmp_path / "options.yaml"
    with open(options_path, "w") as f:
        yaml.safe_dump(options, f)

    monkeypatch.chdir(tmp_path)
    from metatrain_tpu.__main__ import main

    assert main(["train", str(options_path)]) == 0
    # restart with more epochs
    assert (
        main(
            [
                "train",
                str(options_path),
                "--restart",
                "auto",
                "-r",
                "architecture.training.num_epochs=4",
            ]
        )
        == 0
    )
    out_dirs = sorted((tmp_path / "outputs").glob("*/*"))
    assert len(out_dirs) == 2


def test_eval_metrics_match_training_metrics(tmp_path):
    """evaluate_datasets and the training loop must report the SAME
    per-atom RMSE on the same data and model (regression: eval used to
    skip per-atom averaging, silently reporting per-structure numbers)."""
    import csv

    import numpy as np

    from metatrain_tpu.cli.eval import evaluate_datasets
    from metatrain_tpu.data.dataset import Dataset
    from metatrain_tpu.data.readers import read_targets
    from metatrain_tpu.data.target_info import DatasetInfo
    from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

    from conftest import make_molecule

    rng = np.random.default_rng(0)
    systems = []
    for i in range(10):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
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
    trainer = SoapBpnnTrainer(
        {"num_epochs": 2, "batch_size": 5, "o3_augmentation": False,
         "data_parallel": False}
    )
    import jax.numpy as jnp

    trainer.train(model, jnp.float64, [dataset], [dataset], str(tmp_path))
    with open(tmp_path / "train.csv") as f:
        rows = list(csv.DictReader(f))
    loop_rmse = float(rows[-1]["val energy RMSE (per atom)"])
    eval_rmse = evaluate_datasets(model, dataset, ds_info)[
        "energy RMSE (per atom)"
    ]
    np.testing.assert_allclose(eval_rmse, loop_rmse, rtol=1e-5)


def test_multi_dataset_training(tmp_path, monkeypatch):
    """training_set as a LIST of dataset sections trains on all of them
    (reference canonical list expansion + CombinedDataLoader)."""
    import numpy as np

    rng = np.random.default_rng(0)
    paths = []
    for d in range(2):
        systems, infos = [], []
        for i in range(8):
            s = make_molecule(4 + i % 2, seed=10 * d + i)
            systems.append(s)
            infos.append({"energy": float(rng.normal())})
        path = str(tmp_path / f"data{d}.xyz")
        write_xyz(path, systems, info=infos)
        paths.append(path)

    options = {
        "seed": 0,
        "architecture": {
            "name": "soap_bpnn",
            "model": {
                "soap": {"max_angular": 1, "max_radial": 1,
                         "cutoff": {"radius": 4.0}},
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 4},
            },
            "training": {"num_epochs": 1, "batch_size": 4},
        },
        "training_set": [
            {
                "systems": {"read_from": p, "length_unit": "angstrom"},
                "targets": {"energy": {"key": "energy", "unit": "eV"}},
            }
            for p in paths
        ],
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    options_path = tmp_path / "multi.yaml"
    with open(options_path, "w") as f:
        yaml.safe_dump(options, f)
    monkeypatch.chdir(tmp_path)
    from metatrain_tpu.__main__ import main

    assert main(["train", str(options_path), "-o", "multi.mtt"]) == 0
    assert (tmp_path / "multi.mtt").exists()
    log = (
        list((tmp_path / "outputs").glob("*/*/train.log"))[0].read_text()
    )
    assert "Training dataset #0" in log
    assert "Training dataset #1" in log


def test_defaults_subcommand(tmp_path, capsys, monkeypatch):
    """`mtt-tpu defaults` lists architectures; with a name it prints a
    valid options skeleton whose hypers pass train-time validation."""
    monkeypatch.chdir(tmp_path)
    from metatrain_tpu.__main__ import main

    assert main(["defaults"]) == 0
    listing = capsys.readouterr().out.split()
    assert "pet" in listing and "soap_bpnn" in listing

    assert main(["defaults", "pet", "-o", "skeleton.yaml"]) == 0
    with open("skeleton.yaml") as f:
        skeleton = yaml.safe_load(f)
    assert skeleton["architecture"]["name"] == "pet"
    assert skeleton["architecture"]["model"]["cutoff"] == 4.5
    assert "training_set" in skeleton

    from metatrain_tpu.utils.config import validate_base_options

    validate_base_options(skeleton)
