"""SOAP-BPNN spherical/vector targets: exact equivariance via CG basis."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.target_info import (
    DatasetInfo,
    get_generic_target_info,
)
from metatrain_tpu.engine.augmentation import random_rotation, real_wigner_d
from metatrain_tpu.models.soap_bpnn import SoapBpnn
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from conftest import make_molecule


HYPERS = {
    "soap": {"max_angular": 3, "max_radial": 2, "cutoff": {"radius": 4.0}},
    "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
}


def _predict(model, params, system, name):
    nbr = compute_neighbor_data(system, model.cutoff)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float64)
    out = model.forward(params, batch, [name])[name].block(0)
    values = np.asarray(out.values)
    mask = np.asarray(out.mask)
    return values[mask][0] if values.ndim == 3 else values[mask]


def test_spherical_target_equivariance():
    info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {
            "mtt::polarizability": get_generic_target_info(
                "spherical",
                num_properties=2,
                irreps=[
                    {"o3_lambda": 0, "o3_sigma": 1},
                    {"o3_lambda": 2, "o3_sigma": 1},
                ],
            )
        },
    )
    model = SoapBpnn(HYPERS, info, compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(6, seed=1)

    rng = np.random.default_rng(0)
    rotation = random_rotation(rng)
    rotated = System(
        system.positions @ rotation.T, system.types, system.cell, system.pbc
    )

    def blocks_of(s):
        nbr = compute_neighbor_data(s, model.cutoff)
        batch = batch_from_systems([s], [nbr], dtype=jnp.float64)
        tmap = model.forward(params, batch, ["mtt::polarizability"])[
            "mtt::polarizability"
        ]
        mask = np.asarray(batch.system_mask)
        return [np.asarray(b.values)[mask][0] for b in tmap.blocks()]

    b0, b2 = blocks_of(system)
    b0_rot, b2_rot = blocks_of(rotated)

    assert np.abs(b0).max() > 1e-10  # non-trivial
    # lambda=0: invariant
    np.testing.assert_allclose(b0_rot, b0, rtol=1e-8, atol=1e-12)
    # lambda=2: transforms with the Wigner-D matrix
    d2 = real_wigner_d(rotation, 2)
    np.testing.assert_allclose(
        b2_rot, np.einsum("mn,np->mp", d2, b2), rtol=1e-7, atol=1e-10
    )


def test_cartesian_vector_target_equivariance():
    info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {
            "mtt::dipole": get_generic_target_info(
                "cartesian", num_properties=1, rank=1
            )
        },
    )
    model = SoapBpnn(HYPERS, info, compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(1))
    system = make_molecule(6, seed=2)

    rng = np.random.default_rng(1)
    rotation = random_rotation(rng)
    rotated = System(
        system.positions @ rotation.T, system.types, system.cell, system.pbc
    )

    v = _predict(model, params, system, "mtt::dipole")[:, 0]
    v_rot = _predict(model, params, rotated, "mtt::dipole")[:, 0]
    assert np.abs(v).max() > 1e-10
    np.testing.assert_allclose(v_rot, rotation @ v, rtol=1e-7, atol=1e-10)
