"""Direct numerical parity: reference torch PET vs our JAX PET.

Builds the upstream ``PETBackend`` (pure torch, native deps stubbed),
converts its randomly-initialized state dict through
``interop.torch_ckpt``, and runs BOTH models on the same molecule in
float64. Energies and forces must agree to machine precision -- this is
the strongest possible evidence that the JAX re-design computes the same
function as the reference (reference ``pet/modules/backend.py``,
``pet/modules/transformer.py``).

Skipped when /root/reference is not present (e.g. user installs).
"""

import numpy as np
import pytest

from tests._reference_torch import import_reference_backend, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source tree not available"
)

ATOMIC_TYPES = [1, 6, 7, 8]

BASE_HYPERS = {
    "cutoff": 4.5,
    "num_neighbors_adaptive": None,
    "adaptive_cutoff_method": "solver",
    "cutoff_function": "Bump",
    "cutoff_width": 0.5,
    "cutoff_width_adaptive": 1.0,
    "d_pet": 32,
    "d_head": 16,
    "d_node": 32,
    "d_feedforward": 64,
    "num_heads": 4,
    "num_attention_layers": 2,
    "num_gnn_layers": 2,
    "normalization": "RMSNorm",
    "activation": "SwiGLU",
    "attention_temperature": 1.0,
    "transformer_type": "PreLN",
    "featurizer_type": "feedforward",
    "zbl": False,
    "long_range": {
        "enable": False,
        "use_ewald": False,
        "smearing": 1.4,
        "kspace_resolution": 1.33,
        "interpolation_nodes": 5,
    },
    "system_conditioning": False,
    "max_charge": 10,
    "max_spin_multiplicity": 10,
}


def _molecule(n=12, seed=3):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-3.0, 3.0, size=(n, 3))
    species = rng.choice(ATOMIC_TYPES, size=n)
    return pos, species


def _run_reference(hypers, pos, species):
    """Energy, forces and state dict of the reference torch PET."""
    import torch

    from metatrain_tpu.ops.neighbors import neighbor_pairs

    PETBackend = import_reference_backend()
    torch.manual_seed(1)
    backend = PETBackend(hypers, ATOMIC_TYPES)
    backend.add_output("energy", {"energy___0": [1]})
    backend = backend.double().eval()

    c, nb, sh = neighbor_pairs(
        pos, np.zeros((3, 3)), np.zeros(3, bool), hypers["cutoff"], full_list=True
    )
    positions = torch.tensor(pos, dtype=torch.float64, requires_grad=True)
    cells = torch.zeros((1, 3, 3), dtype=torch.float64)
    sysidx = torch.zeros(len(pos), dtype=torch.long)
    bd = backend.preprocess(
        positions,
        torch.tensor(c),
        torch.tensor(nb),
        torch.tensor(species.astype(np.int64)),
        cells,
        torch.tensor(sh, dtype=torch.long),
        sysidx,
        float(hypers["cutoff_width_adaptive"]),
    )
    node_f, edge_f = backend.calculate_features(bd)
    preds, _, _ = backend.predict(node_f, edge_f, bd, cells, sysidx, ["energy"])
    energy = preds["energy"][0].sum()
    (grad,) = torch.autograd.grad(energy, positions)
    state = {("backend." + k): v for k, v in backend.state_dict().items()}
    return float(energy.detach()), grad.numpy(), state


def _run_ours(hypers, pos, species, state):
    """Energy and position gradients of our JAX PET with converted weights."""
    import jax
    import jax.numpy as jnp

    from metatrain_tpu.containers import System, batch_from_systems
    from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.interop.torch_ckpt import convert_torch_checkpoint
    from metatrain_tpu.models.pet import PET
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    di = DatasetInfo(
        length_unit="angstrom",
        atomic_types=ATOMIC_TYPES,
        targets={
            "energy": get_energy_target_info("eV", add_position_gradients=True)
        },
    )
    conv = convert_torch_checkpoint(
        {
            "architecture_name": "pet",
            "model_ckpt_version": 16,
            "model_data": {"model_hypers": hypers, "dataset_info": di},
            "model_state_dict": state,
            "best_model_state_dict": None,
        }
    )
    model = PET(conv["hypers"], di, compute_dtype=jnp.float64)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), conv["params"])

    system = System(
        positions=pos,
        types=species.astype(np.int32),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, bool),
    )
    nbr = compute_neighbor_data(system, cutoff=hypers["cutoff"])
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=16,
        n_systems_padded=2,
        max_neighbors=nbr.max_neighbors + 1,
        dtype=jnp.float64,
    )
    preds = evaluate_model(
        model.forward,
        params,
        batch,
        {"energy": di.targets["energy"]},
        is_training=False,
    )
    block = preds["energy"].block()
    energy = float(np.asarray(block.values)[0, 0])
    grad = np.asarray(block.gradient("positions").values).reshape(-1, 3)[: len(pos)]
    return energy, grad


CONFIGS = {
    "base": {},
    "expanded_node": {"d_node": 48},
    "layernorm_postln": {"normalization": "LayerNorm", "transformer_type": "PostLN"},
    "residual_featurizer": {"featurizer_type": "residual"},
    "cosine_cutoff": {"cutoff_function": "Cosine"},
}


@pytest.mark.parametrize("config", CONFIGS.keys())
def test_pet_energy_force_parity(config):
    hypers = {**BASE_HYPERS, **CONFIGS[config]}
    pos, species = _molecule()
    ref_e, ref_g, state = _run_reference(hypers, pos, species)
    our_e, our_g = _run_ours(hypers, pos, species, state)

    rel_e = abs(our_e - ref_e) / abs(ref_e)
    max_g = np.abs(our_g - ref_g).max()
    scale_g = np.abs(ref_g).max()
    assert rel_e < 1e-10, f"energy mismatch: {our_e} vs {ref_e} (rel {rel_e:.2e})"
    assert max_g < 1e-9 * max(scale_g, 1.0), f"force mismatch: {max_g:.2e}"


def test_pet_periodic_virial_parity():
    """PERIODIC cell: energies, forces AND the strain gradient (virial)
    agree with the upstream torch backend at machine precision -- the
    north-star parity condition's virial channel, cross-framework
    (PARITY.md section 3). The torch side applies the same strain trick
    the reference's ``evaluate_model`` uses
    (``utils/evaluate_model.py:296-350``)."""
    import torch

    from metatrain_tpu.ops.neighbors import neighbor_pairs

    hypers = dict(BASE_HYPERS)
    rng = np.random.default_rng(7)
    cell_np = np.eye(3) * 5.2
    frac = np.array(
        [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.5, 0.0, 0.5],
         [0.0, 0.5, 0.5], [0.25, 0.25, 0.25], [0.75, 0.75, 0.25]]
    )
    pos = frac @ cell_np + rng.normal(0, 0.08, size=(6, 3))
    species = rng.choice(ATOMIC_TYPES, size=6)

    # ---- reference torch backend with the strain trick ---------------
    PETBackend = import_reference_backend()
    torch.manual_seed(1)
    backend = PETBackend(hypers, ATOMIC_TYPES)
    backend.add_output("energy", {"energy___0": [1]})
    backend = backend.double().eval()

    c, nb, sh = neighbor_pairs(
        pos, cell_np, np.ones(3, bool), hypers["cutoff"], full_list=True
    )
    pos0 = torch.tensor(pos, dtype=torch.float64, requires_grad=True)
    eps = torch.zeros((3, 3), dtype=torch.float64, requires_grad=True)
    deformation = torch.eye(3, dtype=torch.float64) + eps
    pos_def = pos0 @ deformation
    cells_def = (
        torch.tensor(cell_np, dtype=torch.float64) @ deformation
    )[None]
    sysidx = torch.zeros(len(pos), dtype=torch.long)
    bd = backend.preprocess(
        pos_def,
        torch.tensor(c),
        torch.tensor(nb),
        torch.tensor(species.astype(np.int64)),
        cells_def,
        torch.tensor(sh, dtype=torch.long),
        sysidx,
        float(hypers["cutoff_width_adaptive"]),
    )
    node_f, edge_f = backend.calculate_features(bd)
    preds, _, _ = backend.predict(
        node_f, edge_f, bd, cells_def, sysidx, ["energy"]
    )
    energy_t = preds["energy"][0].sum()
    ref_g, ref_dstrain = torch.autograd.grad(energy_t, (pos0, eps))
    ref_e = float(energy_t.detach())
    ref_g = ref_g.numpy()
    ref_dstrain = ref_dstrain.numpy()
    state = {("backend." + k): v for k, v in backend.state_dict().items()}

    # ---- ours: the shared autograd engine ----------------------------
    import jax
    import jax.numpy as jnp

    from metatrain_tpu.containers import System, batch_from_systems
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.interop.torch_ckpt import convert_torch_checkpoint
    from metatrain_tpu.models.pet import PET
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    di = DatasetInfo(
        length_unit="angstrom",
        atomic_types=ATOMIC_TYPES,
        targets={
            "energy": get_energy_target_info(
                "eV",
                add_position_gradients=True,
                add_strain_gradients=True,
            )
        },
    )
    conv = convert_torch_checkpoint(
        {
            "architecture_name": "pet",
            "model_ckpt_version": 16,
            "model_data": {"model_hypers": hypers, "dataset_info": di},
            "model_state_dict": state,
            "best_model_state_dict": None,
        }
    )
    model = PET(conv["hypers"], di, compute_dtype=jnp.float64)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float64), conv["params"]
    )
    system = System(
        positions=pos,
        types=species.astype(np.int32),
        cell=cell_np,
        pbc=np.ones(3, bool),
    )
    nbr = compute_neighbor_data(system, cutoff=hypers["cutoff"])
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=16,
        n_systems_padded=2,
        max_neighbors=nbr.max_neighbors + 1,
        dtype=jnp.float64,
    )
    preds = evaluate_model(
        model.forward,
        params,
        batch,
        {"energy": di.targets["energy"]},
        is_training=False,
    )
    block = preds["energy"].block()
    our_e = float(np.asarray(block.values)[0, 0])
    our_g = np.asarray(block.gradient("positions").values).reshape(-1, 3)[
        : len(pos)
    ]
    our_dstrain = np.asarray(block.gradient("strain").values)[0, :, :, 0]

    rel_e = abs(our_e - ref_e) / abs(ref_e)
    assert rel_e < 1e-10, f"energy mismatch (rel {rel_e:.2e})"
    max_g = np.abs(our_g - ref_g).max()
    assert max_g < 1e-9 * max(np.abs(ref_g).max(), 1.0)
    max_v = np.abs(our_dstrain - ref_dstrain).max()
    assert max_v < 1e-9 * max(np.abs(ref_dstrain).max(), 1.0), (
        f"virial/strain mismatch: {max_v:.2e}\n"
        f"ours:\n{our_dstrain}\nref:\n{ref_dstrain}"
    )
