"""selected_atoms subset evaluation (reference
``utils/testing/output.py:470-501`` + ``pet/model.py:278``)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.target_info import (
    DatasetInfo,
    get_energy_target_info,
)
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.nn_base import selection_mask
from metatrain_tpu.models.pet import PET
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


def _setup(per_atom=False):
    info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {
            "energy": get_energy_target_info(
                "eV", add_position_gradients=True, per_atom=per_atom
            )
        },
    )
    model = PET(
        {
            "cutoff": 4.0,
            "d_pet": 16,
            "d_head": 16,
            "d_node": 24,
            "d_feedforward": 16,
            "num_heads": 2,
            "num_attention_layers": 1,
            "num_gnn_layers": 1,
        },
        info,
    )
    model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(7, seed=4)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr])
    return model, batch, info


def test_energy_additivity_under_complementary_selections():
    """E(selected) + E(complement) == E(all): per-structure outputs sum
    only the selected atoms' contributions."""
    model, batch, _ = _setup()
    n_real = int(np.asarray(batch.atom_mask).sum())
    sel = np.zeros(batch.n_atoms_padded, bool)
    sel[: n_real // 2] = True
    sel = jnp.asarray(sel)

    full = model.forward(model.params, batch, ["energy"])
    e_full = np.asarray(full["energy"].block().values)[0, 0]
    part1 = model.forward(model.params, batch, ["energy"], sel)
    part2 = model.forward(model.params, batch, ["energy"], ~sel)
    e1 = np.asarray(part1["energy"].block().values)[0, 0]
    e2 = np.asarray(part2["energy"].block().values)[0, 0]
    np.testing.assert_allclose(e1 + e2, e_full, rtol=1e-5)
    assert abs(e1) > 0 and abs(e2) > 0


def test_per_atom_output_restricted_to_selection():
    model, batch, _ = _setup(per_atom=True)
    sel_pairs = [(0, 1), (0, 3)]
    mask = selection_mask(batch, sel_pairs)

    full = model.forward(model.params, batch, ["energy"])
    part = model.forward(model.params, batch, ["energy"], mask)
    v_full = np.asarray(full["energy"].block().values)
    v_part = np.asarray(part["energy"].block().values)
    m = np.asarray(mask)
    np.testing.assert_allclose(v_part[m], v_full[m], rtol=1e-6)
    np.testing.assert_array_equal(v_part[~m], 0.0)
    np.testing.assert_array_equal(
        np.asarray(part["energy"].block().mask), m
    )


def test_subset_forces_differ_from_full_forces():
    """Gradients follow the restricted sum: forces from a subset energy
    are the subset's force contributions, not the full forces."""
    model, batch, info = _setup()
    n_real = int(np.asarray(batch.atom_mask).sum())
    sel = np.zeros(batch.n_atoms_padded, bool)
    sel[: n_real // 2] = True
    sel = jnp.asarray(sel)

    infos = {"energy": info.targets["energy"]}
    full = evaluate_model(
        model.forward, model.params, batch, infos, is_training=False
    )
    part1 = evaluate_model(
        model.forward, model.params, batch, infos,
        is_training=False, selected_atoms=sel,
    )
    part2 = evaluate_model(
        model.forward, model.params, batch, infos,
        is_training=False, selected_atoms=~sel,
    )
    f_full = np.asarray(full["energy"].block().gradient("positions").values)
    f1 = np.asarray(part1["energy"].block().gradient("positions").values)
    f2 = np.asarray(part2["energy"].block().gradient("positions").values)
    # linearity of the gradient: contributions add to the full forces
    np.testing.assert_allclose(f1 + f2, f_full, rtol=1e-4, atol=1e-7)
    assert not np.allclose(f1, f_full)
