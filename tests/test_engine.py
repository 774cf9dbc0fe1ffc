"""Autograd engine tests: forces/stress vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import (
    Labels,
    System,
    TensorBlock,
    TensorMap,
    batch_from_systems,
)
from metatrain_tpu.data.target_info import get_energy_target_info
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.ops.neighbors import compute_neighbor_data
from metatrain_tpu.ops.segment import sum_over_atoms

from conftest import make_crystal, make_molecule


CUTOFF = 3.5


def pair_energy_forward(params, batch, outputs):
    """Toy smooth pair potential: E = sum_ij exp(-r_ij) * fc(r_ij)."""
    vectors, distances = batch.edge_vectors()
    x = jnp.clip(distances / CUTOFF, 0.0, 1.0)
    fc = 0.5 * (1.0 + jnp.cos(jnp.pi * x))
    pair_e = jnp.exp(-distances) * fc
    pair_e = jnp.where(batch.nbr_mask, pair_e, 0.0)
    atom_e = 0.5 * jnp.sum(pair_e, axis=1) * params["scale"]
    system_e = sum_over_atoms(
        atom_e, batch.system_index, batch.n_systems_padded, batch.atom_mask
    )
    block = TensorBlock(
        values=system_e[:, None],
        samples=Labels.range("system", batch.n_systems_padded),
        components=[],
        properties=Labels(["energy"], np.zeros((1, 1), dtype=np.int32)),
        mask=batch.system_mask,
    )
    return {"energy": TensorMap(Labels.single(), [block])}


def _make_batch(systems, dtype=jnp.float64):
    nbrs = [compute_neighbor_data(s, cutoff=CUTOFF) for s in systems]
    return batch_from_systems(systems, nbrs, dtype=dtype)


def _total_energy(systems, positions_list=None, cells_list=None):
    systems2 = []
    for i, s in enumerate(systems):
        pos = positions_list[i] if positions_list else s.positions
        cell = cells_list[i] if cells_list else s.cell
        systems2.append(System(pos, s.types, cell, s.pbc))
    batch = _make_batch(systems2)
    out = pair_energy_forward({"scale": 1.0}, batch, ["energy"])
    values = np.asarray(out["energy"].block().values)
    mask = np.asarray(out["energy"].block().mask)
    return values[mask].sum()


def test_forces_match_finite_differences():
    systems = [make_molecule(6, seed=11), make_crystal(n_cells=1)]
    batch = _make_batch(systems)
    info = get_energy_target_info("eV", add_position_gradients=True)

    preds = evaluate_model(
        pair_energy_forward, {"scale": 1.0}, batch, {"energy": info}
    )
    grad_block = preds["energy"].block().gradient("positions")
    grads = np.asarray(grad_block.values)[:, :, 0]
    atom_mask = np.asarray(batch.atom_mask)

    eps = 1e-6
    offset = 0
    for sys_i, system in enumerate(systems):
        for a in range(min(len(system), 4)):  # a few atoms is enough
            for d in range(3):
                pos_p = [s.positions.copy() for s in systems]
                pos_m = [s.positions.copy() for s in systems]
                pos_p[sys_i][a, d] += eps
                pos_m[sys_i][a, d] -= eps
                num = (
                    _total_energy(systems, positions_list=pos_p)
                    - _total_energy(systems, positions_list=pos_m)
                ) / (2 * eps)
                ana = grads[offset + a, d]
                np.testing.assert_allclose(ana, num, rtol=1e-5, atol=1e-7)
        offset += len(system)
    # padded rows carry no gradient signal
    np.testing.assert_allclose(grads[~atom_mask], 0.0, atol=1e-12)


def test_strain_gradient_matches_finite_differences():
    system = make_crystal(n_cells=1)
    batch = _make_batch([system])
    info = get_energy_target_info(
        "eV", add_position_gradients=True, add_strain_gradients=True
    )

    preds = evaluate_model(
        pair_energy_forward, {"scale": 1.0}, batch, {"energy": info}
    )
    d_strain = np.asarray(
        preds["energy"].block().gradient("strain").values
    )[0, :, :, 0]

    eps = 1e-6
    for i in range(3):
        for j in range(3):
            strain_p = np.eye(3)
            strain_p[i, j] += eps
            strain_m = np.eye(3)
            strain_m[i, j] -= eps
            e_p = _total_energy(
                [system],
                positions_list=[system.positions @ strain_p],
                cells_list=[system.cell @ strain_p],
            )
            e_m = _total_energy(
                [system],
                positions_list=[system.positions @ strain_m],
                cells_list=[system.cell @ strain_m],
            )
            num = (e_p - e_m) / (2 * eps)
            np.testing.assert_allclose(d_strain[i, j], num, rtol=1e-4, atol=1e-7)


def test_double_backward_through_engine():
    """Training with forces: grad of force-dependent loss w.r.t. params."""
    system = make_molecule(5, seed=3)
    batch = _make_batch([system])
    info = get_energy_target_info("eV", add_position_gradients=True)

    def loss_fn(params):
        preds = evaluate_model(
            pair_energy_forward, params, batch, {"energy": info}
        )
        forces = preds["energy"].block().gradient("positions").values
        return jnp.sum(forces**2)

    g = jax.grad(loss_fn)({"scale": 1.5})
    # loss = scale^2 * const => dloss/dscale = 2 * scale * const
    base = loss_fn({"scale": 1.0})
    np.testing.assert_allclose(float(g["scale"]), float(2 * 1.5 * base), rtol=1e-6)


def test_engine_without_gradients_skips_vjp():
    system = make_molecule(5, seed=3)
    batch = _make_batch([system])
    info = get_energy_target_info("eV")
    preds = evaluate_model(
        pair_energy_forward, {"scale": 1.0}, batch, {"energy": info}
    )
    assert preds["energy"].block().gradients_list() == []
