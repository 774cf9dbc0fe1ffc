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
    supports_stress: bool = True
    supports_restart: bool = True
    # name of the output checked by the generic shape/roundtrip/export
    # suites; "energy" for potentials, the model's own target otherwise
    primary_output: str = "energy"
    # False for architectures whose primary target is not a per-structure
    # scalar energy (FlashMD, classifier): gates the energy-semantics
    # suites (FD forces/stress, O3 invariance, batching invariance)
    has_scalar_energy: bool = True
    # True for closed-form-fit models whose forward needs a completed fit
    # (GAP): the model/params fixture runs the trainer first
    train_before_forward: bool = False
    # False for architectures that are NOT O(3)-invariant by construction
    # and learn invariance through augmentation (PET, reference design)
    is_o3_invariant: bool = True
    # target kinds the architecture can train on beyond system scalars
    # (reference fixture matrix, ``utils/testing/architectures.py:159-438``)
    supported_target_types: tuple = ("scalar",)
    # target kinds whose outputs are exactly O(3)-equivariant
    equivariant_target_types: tuple = ()
    # relative tolerance for O(3) energy invariance (f64 architectures can
    # use much tighter bounds)
    invariance_rtol: float = 1e-5
    trainer_overrides: Dict[str, Any] = {}

    # -- fixtures -----------------------------------------------------------

    @pytest.fixture(scope="class")
    def arch_module(self):
        return import_architecture(self.architecture)

    @pytest.fixture(scope="class")
    def model_extra_hypers(self, tmp_path_factory):
        """Extra model hypers resolved at fixture time. Wrapper
        architectures (LLPR, classifier) override this to train a small
        backbone and return ``{"model_checkpoint": path}``."""
        return {}

    def decorate_system(self, system):
        """Hook: attach architecture-required extra per-system data
        (e.g. FlashMD's momenta/masses) to a bare test system."""
        return system

    def _model_hypers(self, extra):
        return {**self.minimal_model_hypers, **extra}

    @pytest.fixture(scope="class")
    def dataset_and_info(self):
        rng = np.random.default_rng(0)
        systems = []
        for i in range(10):
            s = self.decorate_system(_molecule(5 + i % 2, seed=i))
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
    def model_and_params(
        self, arch_module, dataset_and_info, model_extra_hypers, tmp_path_factory
    ):
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(
            self._model_hypers(model_extra_hypers), ds_info
        )
        params = model.init_params(jax.random.PRNGKey(0))
        if self.train_before_forward:
            trainer = arch_module.__trainer__(dict(self.trainer_overrides))
            trainer.train(
                model, jnp.float32, [dataset], [dataset],
                str(tmp_path_factory.mktemp("prefit")),
            )
            params = model.params
        return model, params

    def _batch(self, model, systems, dtype=jnp.float32):
        systems = [self.decorate_system(s) for s in systems]
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
        name = self.primary_output
        systems = [_molecule(5, seed=1), _molecule(6, seed=2)]
        batch = self._batch(model, systems)
        out = model.forward(params, batch, [name])
        block = out[name].block(0)
        values = np.asarray(block.values)
        mask = np.asarray(block.mask)
        assert np.isfinite(values).all()
        info = model.supported_outputs()[name]
        if info.per_atom:
            assert mask.sum() == 11
        else:
            assert mask.sum() == 2
            np.testing.assert_allclose(values[~mask], 0.0, atol=1e-5)

    def test_batching_invariance(self, model_and_params):
        if not self.has_scalar_energy:
            pytest.skip("no per-structure scalar energy output")
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

    def test_forces_vs_finite_differences(
        self, arch_module, dataset_and_info, model_extra_hypers
    ):
        if not (self.supports_forces and self.has_scalar_energy):
            pytest.skip("architecture does not support forces")
        dataset, ds_info = dataset_and_info
        hypers = self._model_hypers(model_extra_hypers)
        try:
            model = arch_module.__model__(
                hypers, ds_info, compute_dtype=jnp.float64
            )
        except TypeError:
            model = arch_module.__model__(hypers, ds_info)
        params = model.init_params(jax.random.PRNGKey(1))
        if self.train_before_forward:
            trainer = arch_module.__trainer__(dict(self.trainer_overrides))
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                trainer.train(model, jnp.float64, [dataset], [dataset], td)
            params = model.params
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

    # -- Equivariance / invariance (reference ``testing/output.py``) ---------

    def test_energy_invariance_under_O3(self, model_and_params):
        """Scalar predictions are exactly invariant under rotations AND
        improper rotations (reference equivariance checks)."""
        if not (self.is_o3_invariant and self.has_scalar_energy):
            pytest.skip(
                "architecture learns invariance via augmentation or has "
                "no scalar energy output"
            )
        from ..engine.augmentation import random_rotation

        model, params = model_and_params
        system = _molecule(6, seed=11)

        def energy_of(s):
            out = model.forward(params, self._batch(model, [s]), ["energy"])
            return np.asarray(out["energy"].block(0).values).sum()

        e0 = energy_of(system)
        rng = np.random.default_rng(7)
        for improper in (False, True):
            rotation = random_rotation(rng, improper=improper)
            rotated = System(
                system.positions @ rotation.T,
                system.types,
                system.cell,
                system.pbc,
            )
            np.testing.assert_allclose(
                energy_of(rotated), e0, rtol=self.invariance_rtol
            )

    def test_single_atom(self, model_and_params):
        """A single isolated atom (zero neighbors) evaluates finitely and
        exerts no force on itself (reference ``output.py:812``)."""
        model, params = model_and_params
        system = System(
            positions=np.zeros((1, 3)),
            types=np.asarray([6]),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        batch = self._batch(model, [system])
        out = model.forward(params, batch, [self.primary_output])
        values = np.asarray(out[self.primary_output].block(0).values)
        assert np.isfinite(values).all()
        if self.supports_forces and self.has_scalar_energy:
            info = get_energy_target_info("eV", add_position_gradients=True)
            preds = evaluate_model(
                model.forward, params, batch, {"energy": info},
                is_training=False,
            )
            forces = np.asarray(
                preds["energy"].block(0).gradient("positions").values
            )[0]
            np.testing.assert_allclose(forces, 0.0, atol=1e-5)

    def test_stress_vs_finite_differences(
        self, arch_module, dataset_and_info, model_extra_hypers
    ):
        """Strain gradients from the autograd engine match finite
        differences of the deformed periodic cell (reference periodic
        stress checks; strain trick per ``evaluate_model.py:296-350``)."""
        if not (
            self.supports_forces
            and self.supports_stress
            and self.has_scalar_energy
        ):
            pytest.skip("architecture does not support strain gradients")
        _, ds_info = dataset_and_info
        try:
            model = arch_module.__model__(
                self._model_hypers(model_extra_hypers),
                ds_info,
                compute_dtype=jnp.float64,
            )
        except TypeError:
            pytest.skip("architecture does not run in float64")

        # small periodic crystal with one atom type from the dataset
        rng = np.random.default_rng(3)
        cell = np.eye(3) * 3.5
        frac = np.array(
            [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]
        )
        positions = frac @ cell + rng.normal(0, 0.05, size=(4, 3))
        system = System(
            positions=positions,
            types=np.full(4, ds_info.atomic_types[0]),
            cell=cell,
            pbc=np.ones(3, dtype=bool),
        )
        params = model.init_params(jax.random.PRNGKey(2))
        if self.train_before_forward:
            dataset = dataset_and_info[0]
            trainer = arch_module.__trainer__(dict(self.trainer_overrides))
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                trainer.train(model, jnp.float64, [dataset], [dataset], td)
            params = model.params
        info = get_energy_target_info("eV", add_strain_gradients=True)
        batch = self._batch(model, [system], dtype=jnp.float64)
        preds = evaluate_model(model.forward, params, batch, {"energy": info})
        d_strain = np.asarray(
            preds["energy"].block(0).gradient("strain").values
        )[0, :, :, 0]

        def energy_of(strain):
            deformation = np.eye(3) + strain
            s = System(
                system.positions @ deformation,
                system.types,
                system.cell @ deformation,
                system.pbc,
            )
            b = self._batch(model, [s], dtype=jnp.float64)
            return float(
                np.asarray(
                    model.forward(params, b, ["energy"])["energy"]
                    .block(0)
                    .values
                ).sum()
            )

        eps = 1e-6
        for i in range(3):
            for j in range(3):
                sp, sm = np.zeros((3, 3)), np.zeros((3, 3))
                sp[i, j] += eps
                sm[i, j] -= eps
                num = (energy_of(sp) - energy_of(sm)) / (2 * eps)
                np.testing.assert_allclose(
                    d_strain[i, j], num, rtol=5e-4, atol=1e-6
                )

    # -- Target-type matrix (reference ``architectures.py:159-438``) --------

    @pytest.fixture(
        scope="class",
        params=["per_atom_scalar", "multi_property", "cartesian_rank1",
                "cartesian_rank2", "spherical_l2", "multispherical",
                "spherical_atomic_basis", "spherical_rank2_product"],
    )
    def typed_dataset(self, request):
        kind = request.param
        if kind not in self.supported_target_types:
            pytest.skip(f"{self.architecture} does not support {kind}")
        from ..data.target_info import get_generic_target_info

        rng = np.random.default_rng(1)
        systems, values = [], []
        for i in range(8):
            s = _molecule(5, seed=20 + i)
            systems.append(s)
        if kind == "spherical_rank2_product":
            # rank-2 spherical tensor in the uncoupled product basis
            # (reference ``utils/testing/architectures.py:300-336``:
            # product="cartesian", keys o3_lambda_1/2, o3_sigma_1/2)
            info = get_generic_target_info(
                "spherical", 2, "", "rank2",
                irreps=[{"o3_lambda": 2, "o3_sigma": 1}],
                product="cartesian",
            )
            from ..containers import Labels, TensorBlock, TensorMap

            target_maps = []
            for s_ in systems:
                blocks = []
                for layout_key, layout_block in info.layout.items():
                    shape = (1,) + tuple(
                        len(c) for c in layout_block.components
                    ) + (len(layout_block.properties),)
                    blocks.append(
                        TensorBlock(
                            values=jnp.asarray(rng.normal(size=shape)),
                            samples=Labels(
                                ["system"], np.zeros((1, 1), dtype=np.int32)
                            ),
                            components=tuple(layout_block.components),
                            properties=layout_block.properties,
                        )
                    )
                target_maps.append(TensorMap(info.layout.keys, blocks))
            types = sorted({int(t) for s_ in systems for t in s_.types})
            dataset = Dataset(systems, {"target": target_maps})
            return kind, dataset, DatasetInfo(
                "angstrom", types, {"target": info}
            )
        if kind == "spherical_atomic_basis":
            # per-type irrep basis (reference ``utils/testing/
            # architectures.py:339-386``): blocks keyed (lambda, sigma,
            # atom_type), each carrying only that type's atoms, with the
            # ``num`` multiplicity on the property axis
            ab_irreps = {
                1: [{"num": 2, "o3_lambda": 0, "o3_sigma": 1},
                    {"num": 1, "o3_lambda": 1, "o3_sigma": 1}],
                6: [{"num": 3, "o3_lambda": 0, "o3_sigma": 1},
                    {"num": 1, "o3_lambda": 2, "o3_sigma": 1}],
                8: [{"num": 2, "o3_lambda": 0, "o3_sigma": 1},
                    {"num": 1, "o3_lambda": 1, "o3_sigma": 1}],
            }
            info = get_generic_target_info(
                "spherical", 1, "", "ab", per_atom=True, irreps=ab_irreps
            )
            from ..containers import Labels, TensorBlock, TensorMap

            key_names = list(info.layout.keys.names)
            lam_col = key_names.index("o3_lambda")
            type_col = key_names.index("atom_type")
            target_maps = []
            for s in systems:
                blocks = []
                for layout_key, layout_block in info.layout.items():
                    lam = int(layout_key[lam_col])
                    z = int(layout_key[type_col])
                    atoms = np.nonzero(np.asarray(s.types) == z)[0]
                    n_props = len(layout_block.properties)
                    blocks.append(
                        TensorBlock(
                            values=jnp.asarray(
                                rng.normal(
                                    size=(len(atoms), 2 * lam + 1, n_props)
                                )
                            ),
                            samples=Labels(
                                ["system", "atom"],
                                np.stack(
                                    [np.zeros(len(atoms), dtype=np.int32),
                                     atoms.astype(np.int32)],
                                    axis=1,
                                ),
                            ),
                            components=tuple(layout_block.components),
                            properties=layout_block.properties,
                        )
                    )
                target_maps.append(TensorMap(info.layout.keys, blocks))
            types = sorted({int(t) for s in systems for t in s.types})
            dataset = Dataset(systems, {"target": target_maps})
            return kind, dataset, DatasetInfo(
                "angstrom", types, {"target": info}
            )
        if kind == "multispherical":
            # one target with several irrep blocks (reference
            # ``utils/testing/output.py`` multispherical matrix)
            info = get_generic_target_info(
                "spherical",
                1,
                "",
                "multi",
                irreps=[
                    {"o3_lambda": 0, "o3_sigma": 1},
                    {"o3_lambda": 2, "o3_sigma": 1},
                ],
            )
            from ..containers import Labels, TensorBlock, TensorMap

            target_maps = []
            for s in systems:
                blocks = []
                for layout_key, layout_block in info.layout.items():
                    lam = int(layout_key[info.layout.keys.names.index(
                        "o3_lambda")])
                    blocks.append(
                        TensorBlock(
                            values=jnp.asarray(
                                rng.normal(size=(1, 2 * lam + 1, 1))
                            ),
                            samples=Labels(
                                ["system"],
                                np.zeros((1, 1), dtype=np.int32),
                            ),
                            components=tuple(layout_block.components),
                            properties=layout_block.properties,
                        )
                    )
                target_maps.append(TensorMap(info.layout.keys, blocks))
            types = sorted({int(t) for s in systems for t in s.types})
            dataset = Dataset(systems, {"target": target_maps})
            return kind, dataset, DatasetInfo(
                "angstrom", types, {"target": info}
            )
        if kind == "per_atom_scalar":
            info = get_generic_target_info(
                "scalar", 1, "eV", "energy", per_atom=True
            )
            values = [rng.normal(size=(len(s), 1)) for s in systems]
        elif kind == "multi_property":
            info = get_generic_target_info("scalar", 3, "", "generic")
            values = [rng.normal(size=(1, 3)) for _ in systems]
        elif kind == "cartesian_rank1":
            info = get_generic_target_info(
                "cartesian", 1, "", "dipole", rank=1
            )
            values = [rng.normal(size=(1, 3, 1)) for _ in systems]
        elif kind == "cartesian_rank2":
            info = get_generic_target_info(
                "cartesian", 1, "", "polarizability", rank=2
            )
            values = [rng.normal(size=(1, 3, 3, 1)) for _ in systems]
        else:  # spherical_l2
            info = get_generic_target_info(
                "spherical",
                1,
                "",
                "quad",
                irreps=[{"o3_lambda": 2, "o3_sigma": 1}],
            )
            values = [rng.normal(size=(1, 5, 1)) for _ in systems]

        from ..containers import Labels, TensorBlock, TensorMap

        target_maps = []
        for s, v in zip(systems, values):
            layout_block = info.layout.block(0)
            if kind == "per_atom_scalar":
                samples = Labels(
                    ["system", "atom"],
                    np.stack(
                        [np.zeros(len(s), dtype=np.int32),
                         np.arange(len(s), dtype=np.int32)],
                        axis=1,
                    ),
                )
            else:
                samples = Labels(
                    ["system"], np.zeros((1, 1), dtype=np.int32)
                )
            block = TensorBlock(
                values=jnp.asarray(v),
                samples=samples,
                components=tuple(layout_block.components),
                properties=layout_block.properties,
            )
            target_maps.append(TensorMap(info.layout.keys, [block]))
        types = sorted({int(t) for s in systems for t in s.types})
        dataset = Dataset(systems, {"target": target_maps})
        return kind, dataset, DatasetInfo(
            "angstrom", types, {"target": info}
        )

    def test_target_type_outputs_and_training(
        self, arch_module, typed_dataset, model_extra_hypers, tmp_path
    ):
        kind, dataset, ds_info = typed_dataset
        model = arch_module.__model__(
            self._model_hypers(model_extra_hypers), ds_info
        )
        params = model.init_params(jax.random.PRNGKey(0))
        batch = self._batch(model, [dataset[0].system, dataset[1].system])
        out_map = model.forward(params, batch, ["target"])["target"]
        layout = ds_info.targets["target"].layout
        for bi, (_, layout_block) in enumerate(layout.items()):
            values = np.asarray(out_map.block(bi).values)
            assert np.isfinite(values).all()
            expected_trailing = tuple(
                len(c) for c in layout_block.components
            ) + (len(layout_block.properties),)
            assert values.shape[1:] == expected_trailing

        trainer = arch_module.__trainer__(
            {"num_epochs": 1, "batch_size": 4, **self.trainer_overrides}
        )
        trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    def test_equivariant_target_types(
        self, arch_module, typed_dataset, model_extra_hypers
    ):
        kind, dataset, ds_info = typed_dataset
        if kind not in self.equivariant_target_types:
            pytest.skip(f"{kind} equivariance not claimed")
        from ..engine.augmentation import random_rotation, real_wigner_d

        try:
            model = arch_module.__model__(
                self._model_hypers(model_extra_hypers),
                ds_info,
                compute_dtype=jnp.float64,
            )
        except TypeError:
            pytest.skip("architecture does not run in float64")
        params = model.init_params(jax.random.PRNGKey(4))
        system = dataset[0].system

        def predict(s):
            out = model.forward(
                params, self._batch(model, [s], dtype=jnp.float64), ["target"]
            )
            return np.asarray(out["target"].block(0).values)[0]

        p0 = predict(system)
        rng = np.random.default_rng(5)
        for improper in (False, True):
            rotation = random_rotation(rng, improper=improper)
            rotated = System(
                system.positions @ rotation.T,
                system.types,
                system.cell,
                system.pbc,
            )
            p_rot = predict(rotated)
            det = float(np.linalg.det(rotation))
            proper_part = rotation * det  # strip the inversion
            if kind == "cartesian_rank1":
                # a true (polar) vector transforms with R, inversion incl.
                expected = np.einsum("ij,jp->ip", rotation, p0)
            elif kind == "cartesian_rank2":
                expected = np.einsum(
                    "ij,jkp,lk->ilp", rotation, p0, rotation
                )
            elif kind == "spherical_l2":
                # (lambda=2, sigma=1): inversion factor sigma*(-1)^lambda
                # = +1, so only the proper part rotates the components
                expected = np.einsum(
                    "ij,jp->ip", real_wigner_d(proper_part, 2), p0
                )
            else:
                expected = p0
            np.testing.assert_allclose(
                p_rot, expected, rtol=1e-6, atol=1e-9,
                err_msg=f"improper={improper}",
            )

    # -- Restart continuation (reference ``testing/training.py:193-370``) ----

    def test_restart_continuation_matches_uninterrupted(
        self, arch_module, dataset_and_info, model_extra_hypers, tmp_path
    ):
        """k epochs + checkpoint + restart to N epochs == N straight epochs
        (epoch-keyed samplers, restored optimizer state, LR schedule)."""
        if not self.supports_restart:
            pytest.skip("architecture has no SGD restart semantics")
        dataset, ds_info = dataset_and_info
        hypers = {
            "num_epochs": 4,
            "batch_size": 5,
            "o3_augmentation": False,
            "data_parallel": False,
            **self.trainer_overrides,
        }

        model_hypers = self._model_hypers(model_extra_hypers)
        model_a = arch_module.__model__(model_hypers, ds_info)
        trainer_a = arch_module.__trainer__(dict(hypers))
        trainer_a.train(
            model_a, jnp.float32, [dataset], [dataset], str(tmp_path / "a")
        )

        # "interrupt" run B via its periodic epoch-2 snapshot (it keeps
        # training to epoch 4, but the snapshot is exactly the state an
        # interruption would leave behind)
        model_b = arch_module.__model__(model_hypers, ds_info)
        trainer_b = arch_module.__trainer__(
            dict(hypers, checkpoint_interval=2)
        )
        trainer_b.train(
            model_b, jnp.float32, [dataset], [dataset], str(tmp_path / "b")
        )
        ckpt = tmp_path / "b" / "model_2.ckpt"

        from ..utils.io import trainer_from_checkpoint

        model_c = model_from_checkpoint(str(ckpt), context="restart")
        trainer_c = trainer_from_checkpoint(
            str(ckpt), dict(hypers), context="restart"
        )
        trainer_c.train(
            model_c, jnp.float32, [dataset], [dataset], str(tmp_path / "c")
        )

        leaves_a = jax.tree_util.tree_leaves(model_a.params)
        leaves_c = jax.tree_util.tree_leaves(model_c.params)
        assert len(leaves_a) == len(leaves_c)
        for a, c in zip(leaves_a, leaves_c):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5
            )

    # -- TrainingTests ------------------------------------------------------------

    def test_training_runs(
        self, arch_module, dataset_and_info, model_extra_hypers, tmp_path
    ):
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(
            self._model_hypers(model_extra_hypers), ds_info
        )
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

    def test_forward_eval_accepts_selected_atoms(self, model_and_params):
        """Every forward/forward_eval takes the 4-positional-arg calling
        convention wrappers use (LLPR passes selected_atoms positionally;
        regression: FlashMD/classifier overrides dropped the param)."""
        model, params = model_and_params
        batch = self._batch(model, [_molecule(5, seed=7)])
        name = next(iter(model.supported_outputs()))
        fwd = getattr(model, "forward_eval", model.forward)
        out = fwd(params, batch, [name], None)
        assert name in out

    # -- InputTests (reference ``utils/testing/input.py``) -------------------

    def test_atomic_baseline_accepted(self, arch_module):
        """Valid fixed atomic baselines are accepted by the trainer."""
        trainer_cls = arch_module.__trainer__
        if "atomic_baseline" not in getattr(trainer_cls, "DEFAULT_HYPERS", {}):
            pytest.skip("trainer does not use atomic_baseline")
        trainer_cls({"atomic_baseline": {"energy": {1: 1.0, 6: 0.0, 8: 3000.0}}})
        trainer_cls({"atomic_baseline": {"energy": 0.0}})

    def test_atomic_baseline_error(self, arch_module):
        """Symbolic species keys are rejected with a clear error
        (reference ``input.py:67``: 'Input should be a valid integer')."""
        trainer_cls = arch_module.__trainer__
        if "atomic_baseline" not in getattr(trainer_cls, "DEFAULT_HYPERS", {}):
            pytest.skip("trainer does not use atomic_baseline")
        with pytest.raises(ValueError, match="atomic numbers"):
            trainer_cls({"atomic_baseline": {"energy": {"H": 300.0}}})

    # -- ExportedTests (reference ``utils/testing/exported.py``) -------------

    def test_exported_dtype_conversion(self, arch_module, dataset_and_info,
                                       model_extra_hypers, tmp_path):
        """An exported model evaluates in every supported compute dtype
        with consistent energies (the ``.to(dtype=...)`` contract)."""
        dataset, ds_info = dataset_and_info
        model_cls = arch_module.__model__
        hypers = self._model_hypers(model_extra_hypers)
        model = model_cls(hypers, ds_info)
        model.init_params(jax.random.PRNGKey(0))
        if self.train_before_forward:
            trainer = arch_module.__trainer__(dict(self.trainer_overrides))
            trainer.train(
                model, jnp.float32, [dataset], [dataset],
                str(tmp_path / "prefit"),
            )

        from ..cli.export import export_model_object, load_exported_model

        path = str(tmp_path / "model.mtt")
        export_model_object(model, None, path)
        loaded = load_exported_model(path)

        system = dataset[0].system
        batch = self._batch(model, [system])
        reference_values = None
        name = self.primary_output
        for dtype in type(model).__supported_dtypes__:
            try:
                converted = model_cls(hypers, ds_info, compute_dtype=dtype)
            except TypeError:
                pytest.skip("architecture has a fixed compute dtype")
            converted.params = loaded.params
            values = np.asarray(
                converted.forward(converted.params, batch, [name])[name]
                .block(0)
                .values,
                dtype=np.float64,
            )
            assert np.isfinite(values).all()
            if reference_values is None:
                reference_values = values
            else:
                np.testing.assert_allclose(
                    values, reference_values, rtol=0.05, atol=0.05
                )

    # -- CheckpointTests ------------------------------------------------------------

    def test_checkpoint_roundtrip(
        self, arch_module, dataset_and_info, model_extra_hypers, tmp_path
    ):
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(
            self._model_hypers(model_extra_hypers), ds_info
        )
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
        name = self.primary_output
        fwd = getattr(model, "forward_eval", model.forward)
        fwd_restored = getattr(restored, "forward_eval", restored.forward)
        original = np.asarray(
            fwd(model.params, batch, [name])[name].block(0).values
        )
        loaded = np.asarray(
            fwd_restored(restored.params, batch, [name])[name]
            .block(0)
            .values
        )
        np.testing.assert_allclose(original, loaded, rtol=1e-5, atol=1e-6)

        # checkpoint version is recorded and upgradable
        from ..utils.io import load_checkpoint_file

        raw = load_checkpoint_file(path)
        assert raw["model_ckpt_version"] == type(model).__checkpoint_version__

    def test_selected_atoms_sum_semantics(self, model_and_params):
        """Per-structure outputs with a selected-atoms mask sum ONLY the
        selected atoms' contributions (reference ``output.py:470-501``):
        selecting everything equals no selection, and for local additive
        models the two complementary halves sum to the total."""
        if not self.has_scalar_energy:
            pytest.skip("no scalar energy output")
        model, params = model_and_params
        batch = self._batch(model, [_molecule(6, seed=81)])
        name = self.primary_output
        amask = np.asarray(batch.atom_mask)

        import jax.numpy as jnp_

        def total(selection):
            out = model.forward(
                params, batch, [name],
                None if selection is None else jnp_.asarray(selection),
            )
            return float(np.asarray(out[name].block(0).values).sum())

        full = total(None)
        np.testing.assert_allclose(total(amask), full, rtol=1e-6)
        half = amask.copy()
        idx = np.nonzero(amask)[0]
        half[idx[: len(idx) // 2]] = False
        other = amask & ~half
        if getattr(self, "is_local", True):
            np.testing.assert_allclose(
                total(half) + total(other), full, rtol=1e-4, atol=1e-6
            )

    def test_supported_outputs_contract(self, model_and_params):
        """``supported_outputs`` exposes every dataset target with its
        TargetInfo (unit/quantity/layout) -- the capability surface the
        exporter and MD engines read."""
        model, params = model_and_params
        outputs = model.supported_outputs()
        for name, info in model.dataset_info.targets.items():
            assert name in outputs, name
            assert outputs[name].unit == info.unit
            assert outputs[name].quantity == info.quantity

    def test_checkpoint_has_required_fields(self, model_and_params):
        """Every checkpoint carries the loader contract fields
        (reference checkpoint schema, ``utils/io.py:190-258``)."""
        model, params = model_and_params
        model.params = params
        ckpt = model.get_checkpoint()
        for field in (
            "architecture_name",
            "model_ckpt_version",
            "hypers",
            "dataset_info",
        ):
            assert field in ckpt, field
        assert ckpt["architecture_name"] == self.architecture

    # -- Physics sanity (reference OutputTests extensions) -------------------

    def test_translation_invariance(self, model_and_params):
        """Rigid translation leaves a scalar energy exactly invariant
        (no augmentation involved -- translation invariance is
        structural: only relative positions enter)."""
        if not self.has_scalar_energy:
            pytest.skip("no scalar energy output")
        model, params = model_and_params
        system = _molecule(6, seed=31)
        shifted = System(
            system.positions + np.array([1.7, -2.3, 0.9]),
            system.types,
            system.cell,
            system.pbc,
        )
        name = self.primary_output
        e0 = np.asarray(
            model.forward(params, self._batch(model, [system]), [name])[
                name
            ].block(0).values
        )
        e1 = np.asarray(
            model.forward(params, self._batch(model, [shifted]), [name])[
                name
            ].block(0).values
        )
        np.testing.assert_allclose(e1, e0, rtol=1e-5, atol=1e-6)

    def test_energy_extensivity(self, model_and_params):
        """Two molecules far outside each other's cutoff predict the sum
        of their individual energies (locality of the model)."""
        if not self.has_scalar_energy or not getattr(self, "is_local", True):
            pytest.skip("not a local scalar-energy model")
        model, params = model_and_params
        a = _molecule(5, seed=41)
        b = _molecule(6, seed=42)
        cutoff = model.requested_neighbor_cutoff() or 5.0
        b_far = System(
            b.positions + np.array([10.0 * cutoff, 0.0, 0.0]),
            b.types,
            b.cell,
            b.pbc,
        )
        combined = System(
            np.concatenate([a.positions, b_far.positions]),
            np.concatenate([a.types, b_far.types]),
            a.cell,
            a.pbc,
        )
        name = self.primary_output

        def energy(systems):
            out = model.forward(
                params, self._batch(model, systems), [name]
            )[name].block(0)
            return float(np.asarray(out.values).sum())

        e_sum = energy([a]) + energy([b_far])
        e_combined = energy([combined])
        np.testing.assert_allclose(e_combined, e_sum, rtol=1e-4, atol=1e-5)

    def test_padding_invariance(self, model_and_params):
        """Predictions must not depend on the batch padding sizes
        (masked atoms/systems contribute exactly nothing)."""
        model, params = model_and_params
        system = _molecule(6, seed=51)
        name = self.primary_output
        tight = self._batch(model, [system])
        systems = [self.decorate_system(_molecule(6, seed=51))]
        cutoff = model.requested_neighbor_cutoff() or 5.0
        nbrs = [compute_neighbor_data(s, cutoff=cutoff) for s in systems]
        loose = batch_from_systems(
            systems,
            nbrs,
            n_atoms_padded=tight.n_atoms_padded + 128,
            n_systems_padded=tight.n_systems_padded + 2,
            max_neighbors=tight.max_neighbors + 16,
            dtype=jnp.float32,
            extra_keys=list(model.requested_extra_system_keys())
            if hasattr(model, "requested_extra_system_keys")
            else [],
        )
        out_t = model.forward(params, tight, [name])[name].block(0)
        out_l = model.forward(params, loose, [name])[name].block(0)
        vt = np.asarray(out_t.values)
        vl = np.asarray(out_l.values)
        # compare the REAL rows (leading: real systems/atoms come first)
        n = min(vt.shape[0], vl.shape[0])
        real = np.asarray(
            (tight.system_mask if vt.shape[0] == tight.n_systems_padded
             else tight.atom_mask)
        )[:n]
        np.testing.assert_allclose(
            vl[:n][real], vt[:n][real], rtol=1e-4, atol=1e-5
        )

    def test_supported_dtypes_forward(
        self, arch_module, dataset_and_info, model_extra_hypers
    ):
        """The model evaluates finitely in every declared compute dtype
        (reference ``__supported_dtypes__`` contract)."""
        _, ds_info = dataset_and_info
        model_cls = arch_module.__model__
        if self.train_before_forward:
            pytest.skip("fit-based model: covered by exported-dtype suite")
        for dtype in model_cls.__supported_dtypes__:
            try:
                model = model_cls(
                    self._model_hypers(model_extra_hypers),
                    ds_info,
                    compute_dtype=dtype,
                )
            except TypeError:
                pytest.skip("architecture has a fixed compute dtype")
            params = model.init_params(jax.random.PRNGKey(1))
            name = self.primary_output
            batch = self._batch(model, [_molecule(5, seed=61)], dtype=dtype)
            out = model.forward(params, batch, [name])[name].block(0)
            assert np.isfinite(np.asarray(out.values)).all(), dtype

    # -- Features / last-layer features (reference ``output.py:608-759``) ----

    def test_features_output(self, model_and_params):
        """The generic ``"features"`` auxiliary output: a per-atom
        TensorMap with a consistent feature width, zero on padding."""
        model, params = model_and_params
        batch = self._batch(model, [_molecule(6, seed=71)])
        try:
            out = model.forward(params, batch, ["features"])
        except (NotImplementedError, KeyError):
            pytest.skip("architecture exposes no per-atom features")
        if "features" not in out:
            pytest.skip("architecture exposes no per-atom features")
        block = out["features"].block(0)
        values = np.asarray(block.values)
        assert values.ndim == 2 and values.shape[1] > 0
        amask = np.asarray(batch.atom_mask)
        assert np.isfinite(values).all()
        assert np.all(values[~amask] == 0.0)

    def test_last_layer_features_output(self, model_and_params):
        """``mtt::aux::{target}_last_layer_features`` matches the
        declared ``last_layer_feature_size`` (LLPR contract)."""
        model, params = model_and_params
        name = self.primary_output
        aux = f"mtt::aux::{name}_last_layer_features"
        batch = self._batch(model, [_molecule(6, seed=72)])
        try:
            size = model.last_layer_feature_size
            out = model.forward(params, batch, [aux])
        except (NotImplementedError, KeyError, AttributeError):
            pytest.skip("architecture exposes no last-layer features")
        values = np.asarray(out[aux].block(0).values)
        assert values.shape[1] == size
        assert np.isfinite(values).all()

    # -- Finetune epoch accounting (reference ``training.py:193-370``) -------

    def test_finetune_epoch_accounting(
        self, arch_module, dataset_and_info, model_extra_hypers, tmp_path
    ):
        """Finetune context restarts the epoch counter at zero (fresh
        trainer state), while restart context continues -- the reference
        continuation semantics."""
        if not self.supports_restart:
            pytest.skip("architecture does not checkpoint trainer state")
        dataset, ds_info = dataset_and_info
        model = arch_module.__model__(
            self._model_hypers(model_extra_hypers), ds_info
        )
        trainer_hypers = {
            "num_epochs": 2,
            "batch_size": 5,
            **self.trainer_overrides,
        }
        trainer = arch_module.__trainer__(trainer_hypers)
        trainer.train(
            model, jnp.float32, [dataset], [dataset], str(tmp_path / "a")
        )
        path = str(tmp_path / "fin.ckpt")
        trainer.save_checkpoint(model, path)
        trained_epoch = getattr(trainer, "epoch", None)

        # finetune: model weights load, trainer state does NOT -- the
        # finetune run counts its own epochs from zero
        finetuned = model_from_checkpoint(path, context="finetune")
        trainer2 = arch_module.__trainer__(trainer_hypers)
        assert getattr(trainer2, "epoch", 0) == 0
        trainer2.train(
            finetuned, jnp.float32, [dataset], [dataset],
            str(tmp_path / "b"),
        )
        if trained_epoch is not None:
            assert getattr(trainer2, "epoch", 0) <= trained_epoch + 1

    # -- r5 checks (reference ``output.py``/``checkpoints.py`` parity) -------

    def test_no_output(self, model_and_params):
        """A forward with no requested outputs returns nothing and does
        not error (reference ``output.py:156-177``)."""
        model, params = model_and_params
        batch = self._batch(model, [_molecule(5, seed=91)])
        out = model.forward(params, batch, [])
        assert len(out) == 0

    def test_failed_checkpoint_upgrade(self, arch_module, model_and_params):
        """A checkpoint claiming a future version is refused with a clear
        error instead of silently loading (reference
        ``checkpoints.py:269-299``)."""
        model, params = model_and_params
        model.params = params
        ckpt = model.get_checkpoint()
        ckpt["model_ckpt_version"] = 99999999999999
        with pytest.raises((ValueError, RuntimeError), match="version|newer"):
            model_from_checkpoint(ckpt, context="restart")

    def test_last_layer_features_selected_atoms(self, model_and_params):
        """Last-layer feature outputs honor the selected-atoms mask:
        unselected real atoms read exactly zero (reference
        ``output.py:759-810``)."""
        model, params = model_and_params
        name = self.primary_output
        aux = f"mtt::aux::{name}_last_layer_features"
        batch = self._batch(model, [_molecule(6, seed=92)])
        amask = np.asarray(batch.atom_mask)
        selection = amask.copy()
        idx = np.nonzero(amask)[0]
        selection[idx[::2]] = False  # drop every other real atom
        try:
            out = model.forward(
                params, batch, [aux], jnp.asarray(selection)
            )
        except (NotImplementedError, KeyError, AttributeError):
            pytest.skip("architecture exposes no last-layer features")
        if aux not in out:
            pytest.skip("architecture exposes no last-layer features")
        block = out[aux].block(0)
        values = np.asarray(block.values)
        assert np.isfinite(values).all()
        dropped = amask & ~selection
        assert np.all(values[dropped] == 0.0)
        kept = amask & selection
        assert np.any(values[kept] != 0.0)

    def test_prediction_energy_subset_atoms(self, model_and_params):
        """Selecting exactly one system's atoms in a two-system batch
        reproduces that system's solo prediction (reference
        ``output.py:test_prediction_energy_subset_atoms``)."""
        if not self.has_scalar_energy:
            pytest.skip("no scalar energy output")
        model, params = model_and_params
        s1, s2 = _molecule(5, seed=95), _molecule(6, seed=96)
        batch = self._batch(model, [s1, s2])
        sel = np.asarray(batch.system_index) == 0
        sel &= np.asarray(batch.atom_mask)
        out = model.forward(
            params, batch, [self.primary_output], jnp.asarray(sel)
        )[self.primary_output].block(0)
        e_sel = float(np.asarray(out.values).ravel()[0])
        solo = model.forward(
            params, self._batch(model, [s1]), [self.primary_output]
        )[self.primary_output].block(0)
        e_solo = float(np.asarray(solo.values).ravel()[0])
        if getattr(self, "is_local", True):
            np.testing.assert_allclose(e_sel, e_solo, rtol=5e-4, atol=1e-5)
        else:
            assert np.isfinite(e_sel)

    def test_eval_applies_baselines(self, model_and_params):
        """``forward_eval`` = scaler x forward + additive baselines: with
        identity scales and zero composition weights it must equal the
        raw forward (the eval contract every MD engine relies on)."""
        model, params = model_and_params
        name = self.primary_output
        batch = self._batch(model, [_molecule(5, seed=97)])
        fwd = getattr(model, "forward_eval", None)
        if fwd is None:
            pytest.skip("architecture exposes no forward_eval")
        raw = np.asarray(
            model.forward(params, batch, [name])[name].block(0).values
        )
        ev = np.asarray(fwd(params, batch, [name], None)[name].block(0).values)
        comp = getattr(model, "composition", None)
        scaler = getattr(model, "scaler", None)
        extra_additives = bool(
            getattr(model, "extra_removal_transforms", lambda: [])()
        )
        untouched = (
            not extra_additives
            and comp is not None
            and all(
                not np.any(np.asarray(w))
                for w in getattr(comp, "weights", {}).values()
            )
            and scaler is not None
            and all(
                np.allclose(np.asarray(v), 1.0)
                for v in getattr(scaler, "per_target", {}).values()
            )
        )
        if untouched:
            np.testing.assert_allclose(ev, raw, rtol=1e-5, atol=1e-6)
        else:
            assert np.isfinite(ev).all()

    def test_prediction_energy_subset_elements(self, model_and_params):
        """A model trained on several atomic types predicts on a system
        containing only a subset of them (reference
        ``output.py:470-500``)."""
        model, params = model_and_params
        subset_type = model.dataset_info.atomic_types[-1]
        system = System(
            positions=np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.2]]),
            types=np.full(2, subset_type, dtype=np.int32),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        batch = self._batch(model, [system])
        name = self.primary_output
        out = model.forward(params, batch, [name])[name].block(0)
        assert np.isfinite(np.asarray(out.values)).all()
