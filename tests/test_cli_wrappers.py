"""CLI integration for the wrapper/closed-form architectures: GAP,
LLPR (uncertainty) and the classifier, end-to-end through options files
(the per-model math is covered in their own test files; this locks the
options -> train -> export wiring, where `model_checkpoint` hypers flow)."""

import numpy as np
import pytest
import yaml

from metatrain_tpu.__main__ import main
from metatrain_tpu.data.readers.extxyz import write_xyz
from metatrain_tpu.utils.io import load_model

from conftest import make_molecule


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli_wrappers")
    rng = np.random.default_rng(0)
    systems, infos, arrays = [], [], []
    for i in range(12):
        s = make_molecule(4 + i % 3, seed=i)
        systems.append(s)
        onehot = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        infos.append({"energy": float(rng.normal()), "label": onehot})
        arrays.append({"forces": rng.normal(size=(len(s), 3))})
    write_xyz(
        str(path / "data.xyz"), systems, per_atom_arrays=arrays, info=infos
    )
    return path


@pytest.fixture(scope="module")
def backbone_ckpt(workdir):
    options = {
        "seed": 0,
        "architecture": {
            "name": "soap_bpnn",
            "model": {
                "soap": {"max_angular": 1, "max_radial": 1,
                         "cutoff": {"radius": 4.0}},
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
            },
            "training": {"num_epochs": 1, "batch_size": 6},
        },
        "training_set": {
            "systems": {"read_from": str(workdir / "data.xyz"),
                        "length_unit": "angstrom"},
            "targets": {"energy": {"key": "energy", "unit": "eV"}},
        },
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    opath = workdir / "bpnn.yaml"
    yaml.safe_dump(options, open(opath, "w"))
    import os

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        assert main(["train", str(opath)]) == 0
    finally:
        os.chdir(cwd)
    ckpts = sorted((workdir / "outputs").glob("*/*/model.ckpt"))
    return str(ckpts[-1])


def test_gap_cli_train_eval(workdir, monkeypatch):
    options = {
        "seed": 0,
        "architecture": {
            "name": "gap",
            "model": {
                "soap": {"max_angular": 1, "max_radial": 1,
                         "cutoff": {"radius": 4.0}},
                "krr": {"num_sparse_points": 6},
            },
        },
        "training_set": {
            "systems": {"read_from": str(workdir / "data.xyz"),
                        "length_unit": "angstrom"},
            "targets": {"energy": {"key": "energy", "unit": "eV",
                                   "forces": "on"}},
        },
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    yaml.safe_dump(options, open(workdir / "gap.yaml", "w"))
    monkeypatch.chdir(workdir)
    assert main(["train", "gap.yaml", "-o", "gap.mtt"]) == 0

    yaml.safe_dump(
        {
            "systems": {"read_from": str(workdir / "data.xyz")},
            "targets": {"energy": {"key": "energy", "forces": "on"}},
        },
        open(workdir / "gap_eval.yaml", "w"),
    )
    assert main(["eval", "gap.mtt", "gap_eval.yaml"]) == 0


def test_llpr_cli_train(workdir, backbone_ckpt, monkeypatch):
    options = {
        "seed": 0,
        "architecture": {
            "name": "llpr",
            "model": {"model_checkpoint": backbone_ckpt},
            "training": {"ensemble_size": 3},
        },
        "training_set": {
            "systems": {"read_from": str(workdir / "data.xyz"),
                        "length_unit": "angstrom"},
            "targets": {"energy": {"key": "energy", "unit": "eV"}},
        },
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    yaml.safe_dump(options, open(workdir / "llpr.yaml", "w"))
    monkeypatch.chdir(workdir)
    assert main(["train", "llpr.yaml", "-o", "llpr.mtt"]) == 0
    model = load_model(str(workdir / "llpr.mtt"))
    outputs = set(model.supported_outputs())
    assert "mtt::aux::energy_uncertainty" in outputs
    assert "mtt::aux::energy_ensemble" in outputs


def test_classifier_cli_train(workdir, backbone_ckpt, monkeypatch):
    options = {
        "seed": 0,
        "architecture": {
            "name": "experimental.classifier",
            "model": {
                "model_checkpoint": backbone_ckpt,
                "num_neurons_per_layer": 8,
            },
            "training": {"num_epochs": 3, "batch_size": 6},
        },
        "training_set": {
            "systems": {"read_from": str(workdir / "data.xyz"),
                        "length_unit": "angstrom"},
            "targets": {"mtt::label": {"key": "label", "num_subtargets": 2}},
        },
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    yaml.safe_dump(options, open(workdir / "cls.yaml", "w"))
    monkeypatch.chdir(workdir)
    assert main(["train", "cls.yaml", "-o", "cls.mtt"]) == 0

    model = load_model(str(workdir / "cls.mtt"))
    assert list(model.supported_outputs()) == ["mtt::label"]

    # forward_eval produces probabilities summing to 1 on real systems
    import jax

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    s = make_molecule(5, seed=50)
    nbr = compute_neighbor_data(s, model.requested_neighbor_cutoff())
    batch = batch_from_systems([s], [nbr])
    if model.params is None:
        model.init_params(jax.random.PRNGKey(0))
    out = model.forward_eval(model.params, batch, ["mtt::label"])
    block = out["mtt::label"].block(0)
    probs = np.asarray(block.values)[np.asarray(block.mask)]
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
