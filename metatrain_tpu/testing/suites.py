"""The shared architecture test suites (reference ``utils/testing/``)."""

from __future__ import annotations

import csv
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ..containers import System, batch_from_systems
from ..data.dataset import Dataset
from ..data.readers import read_targets
from ..data.target_info import DatasetInfo, get_energy_target_info
from ..engine.evaluate import evaluate_model
from ..ops.neighbors import compute_neighbor_data
from ..utils.architectures import get_default_hypers, import_architecture
from ..utils.io import model_from_checkpoint


def _molecule(n_atoms=6, seed=0, types=(1, 6, 8)):
    rng = np.random.default_rng(seed)
    return System(
        positions=rng.uniform(-3, 3, size=(n_atoms, 3)),
        types=rng.choice(types, size=n_atoms),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, dtype=bool),
    )


class ArchitectureTests:
    """Fixture farm + shared suites (reference ``testing/architectures.py``).

    Subclass attributes:

    - ``architecture``: registry name.
    - ``minimal_model_hypers``: small hypers for fast runs.
    - ``supports_forces``: whether position gradients are supported.
    - ``trainer_overrides``: extra trainer hypers for smoke runs.
    """

    architecture: str = ""
    minimal_model_hypers: Dict[str, Any] = {}
    supports_forces: bool = True
    trainer_overrides: Dict[str, Any] = {}

    # -- fixtures -----------------------------------------------------------

    @pytest.fixture(scope="class")
    def arch_module(self):
        return import_architecture(self.architecture)

    @pytest.fixture(scope="class")
    def dataset_and_info(self):
        rng = np.random.default_rng(0)
        systems = []
        for i in range(10):
            s = _molecule(5 + i % 2, seed=i)
            s.extra["energy"] = np.asarray(rng.normal())
            s.extra["forces"] = rng.normal(size=(len(s), 3))
            systems.append(s)
        target_config = {
            "energy": {"quantity": "energy", "key": "energy", "unit": "eV"}
        }
        if self.supports_forces:
            target_config["energy"]["forces"] = {"key": "forces"}
        targets, infos = read_targets(systems, target_config)
        types = sorted({int(t) for s in systems for t in s.types})
        return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)

    @pytest.fixture(scope="class")
    def model_and_params(self, arch_module, dataset_and_info):
        _, ds_info = dataset_and_info
        model = arch_module.__model__(self.minimal_model_hypers, ds_info)
        params = model.init_params(jax.random.PRNGKey(0))
        return model, params

    def _batch(self, model, systems, dtype=jnp.float32):
        cutoff = model.requested_neighbor_cutoff() or 5.0
        nbrs = [compute_neighbor_data(s, cutoff=cutoff) for s in systems]
        return batch_from_systems(
            systems,
            nbrs,
            dtype=dtype,
            extra_keys=list(model.requested_extra_system_keys())
            if hasattr(model, "requested_extra_system_keys")
            else [],
        )

    # -- OutputTests ----------------------------------------------------------

    def test_output_shapes_and_masks(self, model_and_params):
        model, params = model_and_params
        systems = [_molecule(5, seed=1), _molecule(6, seed=2)]
        batch = self._batch(model, systems)
        out = model.forward(params, batch, ["energy"])
        block = out["energy"].block(0)
        values = np.asarray(block.values)
        mask = np.asarray(block.mask)
        assert np.isfinite(values).all()
        info = model.supported_outputs()["energy"]
        if info.per_atom:
            assert mask.sum() == 11
        else:
            assert mask.sum() == 2
            np.testing.assert_allclose(values[~mask], 0.0, atol=1e-5)

    def test_batching_invariance(self, model_and_params):
        model, params = model_and_params
        s1, s2 = _molecule(5, seed=3), _molecule(7, seed=4)
        e_pair = np.asarray(
            model.forward(params, self._batch(model, [s1, s2]), ["energy"])[
                "energy"
            ]
            .block(0)
            .values
        )[0]
        e_alone = np.asarray(
            model.forward(params, self._batch(model, [s1]), ["energy"])[
                "energy"
            ]
            .block(0)
            .values
        )[0]
        np.testing.assert_allclose(e_pair, e_alone, rtol=5e-4, atol=1e-5)

    # -- AutogradTests ----------------------------------------------------------

    def test_forces_vs_finite_differences(self, arch_module, dataset_and_info):
        if not self.supports_forces:
            pytest.skip("architecture does not support forces")
        _, ds_info = dataset_and_info
        try:
            model = arch_module.__model__(
                self.minimal_model_hypers, ds_info, compute_dtype=jnp.float64
            )
        except TypeError:
            model = arch_module.__model__(self.minimal_model_hypers, ds_info)
        params = model.init_params(jax.random.PRNGKey(1))
        system = _molecule(4, seed=5)
        info = get_energy_target_info("eV", add_position_gradients=True)
        batch = self._batch(model, [system], dtype=jnp.float64)
        preds = evaluate_model(model.forward, params, batch, {"energy": info})
        grads = np.asarray(
            preds["energy"].block(0).gradient("positions").values
        )[:, :, 0]

        def energy_of(positions):
            s = System(positions, system.types, system.cell, system.pbc)
            b = self._batch(model, [s], dtype=jnp.float64)
            return float(
                np.asarray(model.forward(params, b, ["energy"])["energy"].block(0).values).sum()
            )

        eps = 1e-5
        for a in range(2):
            for d in range(3):
                pos_p, pos_m = system.positions.copy(), system.positions.copy()
                pos_p[a, d] += eps
                pos_m[a, d] -= eps
                num = (energy_of(pos_p) - energy_of(pos_m)) / (2 * eps)
                np.testing.assert_allclose(
                    grads[a, d], num, rtol=5e-4, atol=1e-7
                )

    # -- TrainingTests ------------------------------------------------------------

    def test_training_runs(self, arch_module, dataset_and_info, tmp_path):
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(self.minimal_model_hypers, ds_info)
        trainer_hypers = {
            "num_epochs": 2,
            "batch_size": 5,
            **self.trainer_overrides,
        }
        trainer = arch_module.__trainer__(trainer_hypers)
        trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
        csv_path = tmp_path / "train.csv"
        if csv_path.exists():
            with open(csv_path) as f:
                rows = list(csv.DictReader(f))
            assert np.isfinite(float(rows[-1]["train loss"]))

    # -- CheckpointTests ------------------------------------------------------------

    def test_checkpoint_roundtrip(self, arch_module, dataset_and_info, tmp_path):
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(self.minimal_model_hypers, ds_info)
        trainer_hypers = {
            "num_epochs": 1,
            "batch_size": 5,
            **self.trainer_overrides,
        }
        trainer = arch_module.__trainer__(trainer_hypers)
        trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))
        path = str(tmp_path / "roundtrip.ckpt")
        trainer.save_checkpoint(model, path)
        restored = model_from_checkpoint(path, context="export")

        system = dataset[0].system
        batch = self._batch(model, [system])
        fwd = getattr(model, "forward_eval", model.forward)
        fwd_restored = getattr(restored, "forward_eval", restored.forward)
        original = np.asarray(
            fwd(model.params, batch, ["energy"])["energy"].block(0).values
        )
        loaded = np.asarray(
            fwd_restored(restored.params, batch, ["energy"])["energy"]
            .block(0)
            .values
        )
        np.testing.assert_allclose(original, loaded, rtol=1e-5, atol=1e-6)

        # checkpoint version is recorded and upgradable
        from ..utils.io import load_checkpoint_file

        raw = load_checkpoint_file(path)
        assert raw["model_ckpt_version"] == type(model).__checkpoint_version__
