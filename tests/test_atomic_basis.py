"""Atomic-basis spherical targets (reference
``utils/data/target_info.py:615-680`` + ``utils/testing/architectures.py:
339-386``): per-type irrep lists, blocks keyed (lambda, sigma, atom_type),
subset-sample collation and type-masked assembly."""

import numpy as np
import pytest

import jax.numpy as jnp

from metatrain_tpu.containers import Labels, TensorBlock, TensorMap
from metatrain_tpu.data.collate import batch_targets
from metatrain_tpu.data.target_info import (
    DatasetInfo,
    get_generic_target_info,
)

from conftest import make_molecule


AB_IRREPS = {
    1: [{"num": 2, "o3_lambda": 0, "o3_sigma": 1},
        {"num": 1, "o3_lambda": 1, "o3_sigma": 1}],
    6: [{"num": 1, "o3_lambda": 0, "o3_sigma": 1}],
}


def test_layout_keys_and_sizes():
    info = get_generic_target_info(
        "spherical", 2, "", "ab", per_atom=True, irreps=AB_IRREPS
    )
    assert info.is_spherical and info.is_atomic_basis and info.per_atom
    keys = np.asarray(info.layout.keys.values)
    assert list(info.layout.keys.names) == ["o3_lambda", "o3_sigma", "atom_type"]
    # sorted by type, then irrep order: (0,1,1), (1,1,1), (0,1,6)
    assert keys.tolist() == [[0, 1, 1], [1, 1, 1], [0, 1, 6]]
    blocks = info.layout.blocks()
    # num multiplies the property axis (num * num_properties)
    assert len(blocks[0].properties) == 4  # num=2 x 2 props
    assert len(blocks[1].properties) == 2
    assert blocks[1].values.shape[1] == 3  # o3_mu for lambda=1
    assert len(blocks[2].properties) == 2


def test_requires_per_atom():
    with pytest.raises(ValueError, match="per-atom"):
        get_generic_target_info("spherical", 1, irreps=AB_IRREPS)


def _per_system_map(info, system, rng):
    key_names = list(info.layout.keys.names)
    blocks = []
    for key, layout_block in info.layout.items():
        lam = int(key[key_names.index("o3_lambda")])
        z = int(key[key_names.index("atom_type")])
        atoms = np.nonzero(np.asarray(system.types) == z)[0]
        blocks.append(
            TensorBlock(
                values=jnp.asarray(
                    rng.normal(
                        size=(len(atoms), 2 * lam + 1,
                              len(layout_block.properties))
                    )
                ),
                samples=Labels(
                    ["system", "atom"],
                    np.stack(
                        [np.zeros(len(atoms), np.int32),
                         atoms.astype(np.int32)],
                        axis=1,
                    ),
                ),
                components=tuple(layout_block.components),
                properties=layout_block.properties,
            )
        )
    return TensorMap(info.layout.keys, blocks)


def test_collate_scatters_subset_blocks():
    rng = np.random.default_rng(0)
    info = get_generic_target_info(
        "spherical", 1, "", "ab", per_atom=True, irreps=AB_IRREPS
    )
    systems = [make_molecule(5, seed=1, types=(1, 6)),
               make_molecule(4, seed=2, types=(1, 6))]
    maps = [_per_system_map(info, s, rng) for s in systems]
    A, S = 16, 3
    batched = batch_targets(maps, info, systems, A, S, jnp.float64)

    offsets = [0, len(systems[0])]
    for bi, (key, _) in enumerate(info.layout.items()):
        z = int(key[2])
        block = batched.block(bi)
        mask = np.asarray(block.mask)
        vals = np.asarray(block.values)
        expect_mask = np.zeros(A, dtype=bool)
        for si, s in enumerate(systems):
            atoms = np.nonzero(np.asarray(s.types) == z)[0]
            expect_mask[offsets[si] + atoms] = True
            src = np.asarray(maps[si].block(bi).values)
            np.testing.assert_allclose(
                vals[offsets[si] + atoms], src, rtol=1e-12
            )
        np.testing.assert_array_equal(mask, expect_mask)
        # unmasked rows are zero
        assert np.all(vals[~expect_mask] == 0.0)


def test_model_assembly_masks_by_type():
    """A generic-head model produces atomic-basis blocks whose mask is
    exactly (real atoms) & (type == block's atom_type)."""
    import jax

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.models.dpa3 import DPA3
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    info = get_generic_target_info(
        "spherical", 1, "", "ab", per_atom=True, irreps=AB_IRREPS
    )
    ds_info = DatasetInfo("angstrom", [1, 6], {"target": info})
    model = DPA3(
        {"cutoff": 4.0, "num_radial": 2, "d_edge": 4, "num_layers": 1,
         "num_angular": 1, "mlp_width": 4},
        ds_info,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(6, seed=3, types=(1, 6))
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float32)
    out = model.forward(params, batch, ["target"])["target"]
    types = np.asarray(batch.types)
    amask = np.asarray(batch.atom_mask)
    for bi, (key, layout_block) in enumerate(info.layout.items()):
        z = int(key[2])
        block = out.block(bi)
        np.testing.assert_array_equal(
            np.asarray(block.mask), amask & (types == z)
        )
        vals = np.asarray(block.values)
        assert vals.shape[1:] == (
            2 * int(key[0]) + 1, len(layout_block.properties)
        )
        assert np.all(vals[~np.asarray(block.mask)] == 0.0)
        assert np.isfinite(vals).all()
