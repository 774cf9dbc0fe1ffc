"""MACE foundation-model import: a synthetic mace-torch module pickle
(same tree/naming as ``mace.modules.models.MACE``) converts into a native
checkpoint with the reference's baseline/scale extraction semantics
(``/root/reference/src/metatrain/experimental/mace/model.py:141-183``)
and finetunes end-to-end."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from metatrain_tpu.interop.mace_foundation import (  # noqa: E402
    convert_mace_foundation,
    extract_baseline_and_scale,
    load_mace_foundation_state,
)

ATOMIC_NUMBERS = [1, 8]
R_MAX = 4.0
NUM_RADIAL = 4
CHANNELS = 8
ATOMIC_ENERGIES = [-13.6, -2040.0]
SCALE = 0.85
SHIFT = -1.25


def _build_fake_mace_module():
    """A torch module tree with mace-torch's names: node_embedding.linear,
    radial_embedding.bessel_fn, interactions.{i}.*, products.{i}.*,
    readouts, scale_shift, atomic_energies_fn."""

    class FakeMACE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            n_sp = len(ATOMIC_NUMBERS)
            self.register_buffer(
                "atomic_numbers", torch.tensor(ATOMIC_NUMBERS)
            )
            self.register_buffer("r_max", torch.tensor(R_MAX))

            self.node_embedding = torch.nn.Module()
            self.node_embedding.linear = torch.nn.Module()
            self.node_embedding.linear.weight = torch.nn.Parameter(
                torch.arange(n_sp * CHANNELS, dtype=torch.float64) * 0.01
            )

            self.radial_embedding = torch.nn.Module()
            self.radial_embedding.bessel_fn = torch.nn.Module()
            self.radial_embedding.bessel_fn.bessel_weights = (
                torch.nn.Parameter(torch.ones(NUM_RADIAL, dtype=torch.float64))
            )

            self.interactions = torch.nn.ModuleList()
            for _ in range(2):
                inter = torch.nn.Module()
                inter.linear_up = torch.nn.Linear(CHANNELS, CHANNELS)
                self.interactions.append(inter)

            self.products = torch.nn.ModuleList()
            for _ in range(2):
                prod = torch.nn.Module()
                sc = torch.nn.Module()
                contr = torch.nn.Module()
                contr.weights_max = torch.nn.Parameter(
                    torch.zeros(len(ATOMIC_NUMBERS), 3, CHANNELS)
                )
                contr.weights = torch.nn.ParameterList(
                    [  # nu = 1, 2 -> correlation 3 (mace-torch layout)
                        torch.nn.Parameter(torch.zeros(1)),
                        torch.nn.Parameter(torch.zeros(1)),
                    ]
                )
                sc.contractions = torch.nn.ModuleList([contr])
                prod.symmetric_contractions = sc
                self.products.append(prod)

            self.scale_shift = torch.nn.Module()
            self.scale_shift.register_buffer(
                "scale", torch.tensor(SCALE, dtype=torch.float64)
            )
            self.scale_shift.register_buffer(
                "shift", torch.tensor(SHIFT, dtype=torch.float64)
            )

            self.atomic_energies_fn = torch.nn.Module()
            self.atomic_energies_fn.register_buffer(
                "atomic_energies",
                torch.tensor(ATOMIC_ENERGIES, dtype=torch.float64),
            )

    return FakeMACE()


@pytest.fixture()
def foundation_file(tmp_path):
    """Pickle the fake module under the 'mace.modules.models' name, then
    remove the fake package so loading exercises the tolerant-stub path
    (mace-torch is not installed in this environment)."""
    import types

    module = _build_fake_mace_module()
    fake_pkg = types.ModuleType("mace")
    fake_modules = types.ModuleType("mace.modules")
    fake_models = types.ModuleType("mace.modules.models")
    cls = type(module)
    cls.__module__ = "mace.modules.models"
    cls.__qualname__ = "MACE"
    fake_models.MACE = cls
    # pickle by the class's qualified name
    setattr(fake_models, cls.__name__, cls)
    sys.modules["mace"] = fake_pkg
    sys.modules["mace.modules"] = fake_modules
    sys.modules["mace.modules.models"] = fake_models
    path = tmp_path / "foundation.pt"
    try:
        torch.save(module, str(path))
    finally:
        for name in ("mace.modules.models", "mace.modules", "mace"):
            sys.modules.pop(name, None)
    return str(path)


def test_state_walk_collects_all_tensors(foundation_file):
    state = load_mace_foundation_state(foundation_file)
    assert "atomic_numbers" in state
    assert "node_embedding.linear.weight" in state
    assert "scale_shift.scale" in state
    assert "atomic_energies_fn.atomic_energies" in state
    assert "interactions.0.linear_up.weight" in state
    assert "interactions.1.linear_up.bias" in state


def test_baseline_and_scale_extraction(foundation_file):
    state = load_mace_foundation_state(foundation_file)
    baseline, scale = extract_baseline_and_scale(state)
    # reference semantics: shift folded into every species' baseline
    np.testing.assert_allclose(
        baseline, np.asarray(ATOMIC_ENERGIES) + SHIFT
    )
    assert scale == pytest.approx(SCALE)


def test_multihead_slicing():
    state = {
        "atomic_numbers": np.asarray(ATOMIC_NUMBERS),
        "atomic_energies_fn.atomic_energies": np.asarray(
            [[1.0, 2.0], [10.0, 20.0]]
        ),
        "scale_shift.scale": np.asarray([0.5, 0.7]),
        "scale_shift.shift": np.asarray([0.1, 0.2]),
    }
    b0, s0 = extract_baseline_and_scale(state, 0)
    b1, s1 = extract_baseline_and_scale(state, 1)
    np.testing.assert_allclose(b0, [1.1, 2.1])
    np.testing.assert_allclose(b1, [10.2, 20.2])
    assert (s0, s1) == (pytest.approx(0.5), pytest.approx(0.7))


def test_convert_and_finetune(foundation_file, tmp_path):
    import jax.numpy as jnp

    from conftest import make_molecule
    from metatrain_tpu.data.dataset import Dataset
    from metatrain_tpu.data.readers import read_targets
    from metatrain_tpu.utils.io import model_from_checkpoint

    checkpoint = convert_mace_foundation(foundation_file)
    assert checkpoint["hypers"]["cutoff"] == pytest.approx(R_MAX)
    assert checkpoint["hypers"]["num_radial"] == NUM_RADIAL
    assert checkpoint["hypers"]["num_interactions"] == 2
    assert checkpoint["hypers"]["correlation"] == 3
    # complete tensor inventory preserved
    assert "node_embedding.linear.weight" in checkpoint["foundation_state"]

    model = model_from_checkpoint(checkpoint, context="finetune")
    # composition carries the extracted baselines (sorted species order)
    w = model.composition.weights["energy"]
    np.testing.assert_allclose(
        np.ravel(w), np.asarray(ATOMIC_ENERGIES) + SHIFT
    )
    assert model.get_fixed_composition_weights()["energy"][8] == (
        pytest.approx(ATOMIC_ENERGIES[1] + SHIFT)
    )

    # finetune end-to-end on a tiny dataset; the fixed baseline must
    # survive the trainer's composition fit
    rng = np.random.default_rng(0)
    systems = []
    for i in range(6):
        s = make_molecule(4, seed=i, types=(1, 8))
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
    )
    dataset = Dataset(systems, targets)
    from metatrain_tpu.models.mace import MACETrainer

    trainer = MACETrainer({"num_epochs": 1, "batch_size": 3})
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
    np.testing.assert_allclose(
        np.ravel(model.composition.weights["energy"]),
        np.asarray(ATOMIC_ENERGIES) + SHIFT,
    )
