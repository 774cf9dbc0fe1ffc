"""Shared architecture suites instantiated per architecture
(reference pattern: ``pet/tests/test_basic.py:18-35``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.testing import ArchitectureTests

from conftest import make_molecule


class TestPET(ArchitectureTests):
    architecture = "pet"
    minimal_model_hypers = {
        "cutoff": 4.5,
        "d_pet": 16,
        "d_head": 16,
        "d_node": 24,
        "d_feedforward": 16,
        "num_heads": 2,
        "num_attention_layers": 1,
        "num_gnn_layers": 1,
    }
    supports_forces = True
    is_o3_invariant = False  # PET learns invariance via O3 augmentation
    supported_target_types = ("scalar", "per_atom_scalar", "multi_property")


class TestPETResidual(ArchitectureTests):
    architecture = "pet"
    minimal_model_hypers = dict(
        TestPET.minimal_model_hypers, featurizer_type="residual", num_gnn_layers=2
    )
    supports_forces = True
    is_o3_invariant = False


class TestSoapBpnn(ArchitectureTests):
    architecture = "soap_bpnn"
    minimal_model_hypers = {
        "soap": {"max_angular": 2, "max_radial": 2, "cutoff": {"radius": 4.5}},
        "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
    }
    supports_forces = True
    supported_target_types = (
        "scalar", "per_atom_scalar", "multi_property", "cartesian_rank1",
        "cartesian_rank2", "spherical_l2", "multispherical",
        "spherical_atomic_basis",
    )
    equivariant_target_types = (
        "cartesian_rank1", "cartesian_rank2", "spherical_l2"
    )


class TestSoapBpnnAlchemical(ArchitectureTests):
    architecture = "soap_bpnn"
    minimal_model_hypers = dict(TestSoapBpnn.minimal_model_hypers, legacy=False)
    supports_forces = True


class TestMACE(ArchitectureTests):
    architecture = "experimental.mace"
    minimal_model_hypers = {
        "cutoff": 4.5,
        "num_radial": 3,
        "max_ell": 1,
        "num_channels": 8,
        "num_interactions": 1,
        "mlp_width": 8,
    }
    supports_forces = True
    supported_target_types = (
        "scalar", "multi_property", "cartesian_rank1", "spherical_l2",
        "multispherical", "spherical_atomic_basis",
    )
    equivariant_target_types = ("cartesian_rank1", "spherical_l2")


class TestSPACE(ArchitectureTests):
    architecture = "experimental.space"
    minimal_model_hypers = {
        "cutoff": 4.5,
        "num_radial": 3,
        "k_max_l": [8, 4, 4],
        # 2 layers populate the L>0 features, exercising every coupling
        # path (improper-rotation equivariance needs the parity filter)
        "num_message_passing": 2,
        "mlp_width": 8,
    }
    supports_forces = True
    supported_target_types = (
        "scalar",
        "per_atom_scalar",
        "multi_property",
        "cartesian_rank1",
        "cartesian_rank2",
        "spherical_l2",
        "multispherical",
        "spherical_atomic_basis",
    )
    equivariant_target_types = (
        "cartesian_rank1", "cartesian_rank2", "spherical_l2"
    )


class TestSPACELEBasis(ArchitectureTests):
    """SPACE with the Laplacian-eigenstate per-l radial basis (the
    physical-basis budget scheme)."""

    architecture = "experimental.space"
    minimal_model_hypers = dict(
        TestSPACE.minimal_model_hypers,
        radial_basis={"type": "le", "E_max": 25.0},
    )
    supports_forces = True
    supported_target_types = ("scalar",)


class TestSPACEPhysical(ArchitectureTests):
    """SPACE with the splined physical radial basis AND the probe-grid
    adaptive cutoff (reference space/modules/{physical_basis,
    adaptive_cutoff}.py)."""

    architecture = "experimental.space"
    minimal_model_hypers = dict(
        TestSPACE.minimal_model_hypers,
        radial_basis={"type": "physical", "E_max": 25.0},
        num_neighbors_adaptive=6.0,
    )
    supports_forces = True
    supported_target_types = ("scalar",)


class TestDPA3(ArchitectureTests):
    architecture = "experimental.dpa3"
    minimal_model_hypers = {
        "cutoff": 4.5,
        "num_radial": 3,
        "d_edge": 8,
        "num_layers": 1,
        "num_angular": 2,
        "mlp_width": 8,
    }
    supports_forces = True
    # reference DPA3 adds a fitting net for every dataset target
    # (experimental/dpa3/model.py:196-197): the generic-target matrix
    # runs on the native invariant head (non-equivariant, like the
    # reference's learned-equivariance design)
    supported_target_types = (
        "scalar", "per_atom_scalar", "multi_property", "cartesian_rank1",
        "cartesian_rank2", "spherical_l2", "multispherical",
        "spherical_atomic_basis", "spherical_rank2_product",
    )


class TestGAP(ArchitectureTests):
    """GAP: closed-form SOR fit (no SGD restart semantics)."""

    architecture = "gap"
    minimal_model_hypers = {
        "soap": {
            "max_angular": 1,
            "max_radial": 1,
            "cutoff": {"radius": 4.5, "width": 1.0},
        },
        "krr": {"degree": 2, "num_sparse_points": 8, "regularizer": 1e-3},
    }
    supports_restart = False
    train_before_forward = True


class TestComposition(ArchitectureTests):
    """Composition as a standalone architecture (per-species linear fit)."""

    architecture = "composition"
    supports_forces = False
    supports_stress = False
    supports_restart = False
    train_before_forward = True


class TestScaler(ArchitectureTests):
    """Scaler as a standalone architecture (per-target RMS scales)."""

    architecture = "scaler"
    supports_forces = False
    supports_stress = False
    supports_restart = False
    train_before_forward = True
    # the standalone scaler predicts a per-structure statistic, not a
    # sum of local atomic contributions
    is_local = False


class TestLLPR(ArchitectureTests):
    """LLPR uncertainty wrapper around a trained SOAP-BPNN backbone."""

    architecture = "llpr"
    supports_forces = False  # ensemble gradients covered in test_llpr.py
    supports_stress = False
    supports_restart = False
    train_before_forward = True

    @pytest.fixture(scope="class")
    def model_extra_hypers(self, dataset_and_info, tmp_path_factory):
        dataset, ds_info = dataset_and_info
        from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

        backbone = SoapBpnn(
            {
                "soap": {"max_angular": 1, "max_radial": 1,
                         "cutoff": {"radius": 4.0}},
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
            },
            ds_info,
        )
        trainer = SoapBpnnTrainer({"num_epochs": 1, "batch_size": 5})
        path = tmp_path_factory.mktemp("llpr_backbone")
        trainer.train(backbone, jnp.float32, [dataset], [dataset], str(path))
        ckpt = str(path / "backbone.ckpt")
        trainer.save_checkpoint(backbone, ckpt)
        return {"model_checkpoint": ckpt}


class TestClassifier(ArchitectureTests):
    """Frozen-backbone classifier on a one-hot class target."""

    architecture = "experimental.classifier"
    primary_output = "mtt::label"
    has_scalar_energy = False
    supports_forces = False
    supports_stress = False
    supports_restart = False
    supported_target_types = ()

    @pytest.fixture(scope="class")
    def dataset_and_info(self):
        rng = np.random.default_rng(0)
        systems = []
        for i in range(10):
            s = make_molecule(5 + i % 2, seed=i)
            s.extra["label"] = np.asarray(
                [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
            )
            systems.append(s)
        targets, infos = read_targets(
            systems,
            {"mtt::label": {"key": "label", "num_subtargets": 2}},
        )
        types = sorted({int(t) for s in systems for t in s.types})
        return (
            Dataset(systems, targets),
            DatasetInfo("angstrom", types, infos),
        )

    @pytest.fixture(scope="class")
    def model_extra_hypers(self, dataset_and_info, tmp_path_factory):
        _, ds_info = dataset_and_info
        from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

        rng = np.random.default_rng(1)
        systems = []
        for i in range(8):
            s = make_molecule(5, seed=40 + i)
            s.extra["energy"] = np.asarray(rng.normal())
            systems.append(s)
        e_targets, e_infos = read_targets(
            systems,
            {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
        )
        e_info = DatasetInfo("angstrom", ds_info.atomic_types, e_infos)
        backbone = SoapBpnn(
            {
                "soap": {"max_angular": 1, "max_radial": 1,
                         "cutoff": {"radius": 4.0}},
                "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
            },
            e_info,
        )
        trainer = SoapBpnnTrainer({"num_epochs": 1, "batch_size": 4})
        path = tmp_path_factory.mktemp("cls_backbone")
        trainer.train(
            backbone, jnp.float32,
            [Dataset(systems, e_targets)], [Dataset(systems, e_targets)],
            str(path),
        )
        ckpt = str(path / "backbone.ckpt")
        trainer.save_checkpoint(backbone, ckpt)
        return {"model_checkpoint": ckpt}


class _FlashMDBase(ArchitectureTests):
    """Shared fixtures for the FlashMD family (positions+momenta targets)."""

    primary_output = "positions"
    has_scalar_energy = False
    supports_forces = False
    supports_stress = False
    supported_target_types = ()
    minimal_model_hypers = {
        "cutoff": 4.0,
        "d_pet": 16,
        "d_head": 16,
        "d_node": 24,
        "d_feedforward": 16,
        "num_heads": 2,
        "num_attention_layers": 1,
        "num_gnn_layers": 1,
    }

    def decorate_system(self, system):
        if "momenta" not in system.extra:
            rng = np.random.default_rng(len(system))
            system.extra["momenta"] = rng.normal(size=(len(system), 3))
            system.extra["masses"] = np.full(len(system), 12.0)
        return system

    @pytest.fixture(scope="class")
    def dataset_and_info(self):
        rng = np.random.default_rng(0)
        systems = []
        for i in range(8):
            s = self.decorate_system(make_molecule(5, seed=i))
            s.extra["future_positions"] = (
                s.positions + 0.1 * s.extra["momenta"]
            )
            s.extra["future_momenta"] = s.extra["momenta"] * (
                0.95 + 0.01 * rng.normal()
            )
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
        return (
            Dataset(systems, targets),
            DatasetInfo("angstrom", types, infos),
        )


class TestFlashMD(_FlashMDBase):
    architecture = "experimental.flashmd"


class TestFlashMDSymplectic(_FlashMDBase):
    architecture = "experimental.flashmd_symplectic"
