"""Shared architecture suites instantiated per architecture
(reference pattern: ``pet/tests/test_basic.py:18-35``)."""

from metatrain_tpu.testing import ArchitectureTests


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
        "cartesian_rank2", "spherical_l2",
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
        "scalar", "multi_property", "cartesian_rank1", "spherical_l2"
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
