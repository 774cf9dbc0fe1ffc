"""Scaler: per-target / per-block / per-property / per-type RMS scales
(reference ``scaler/_base_scaler.py`` + ``scaler/model.py:188-232``)."""

import jax.numpy as jnp
import numpy as np

from metatrain_tpu.containers import Labels, TensorBlock, TensorMap
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.target_info import (
    DatasetInfo,
    get_generic_target_info,
)
from metatrain_tpu.models.scaler import Scaler

from conftest import make_molecule


def _scalar_map(values):
    values = np.atleast_2d(np.asarray(values, np.float64))
    return TensorMap(
        Labels.single(),
        [
            TensorBlock(
                values=values,
                samples=Labels.range("system", values.shape[0]),
                components=(),
                properties=Labels.range("property", values.shape[1]),
            )
        ],
    )


def _per_atom_map(values):
    values = np.asarray(values, np.float64)
    return TensorMap(
        Labels.single(),
        [
            TensorBlock(
                values=values,
                samples=Labels(
                    ["system", "atom"],
                    np.stack(
                        [np.zeros(len(values), np.int64),
                         np.arange(len(values))], axis=1
                    ),
                ),
                components=(),
                properties=Labels.range("property", values.shape[1]),
            )
        ],
    )


def test_per_property_scales_multi_property_target():
    info = get_generic_target_info("scalar", num_properties=2)
    ds_info = DatasetInfo("angstrom", [1, 6], {"t": info})
    systems = [make_molecule(4, seed=i) for i in range(50)]
    rng = np.random.default_rng(0)
    targets = [
        _scalar_map([[rng.normal() * 2.0, rng.normal() * 8.0]])
        for _ in systems
    ]
    scaler = Scaler({}, ds_info)
    scaler.fit([Dataset(systems, {"t": targets})])

    full = scaler.scales["t"][0][0]  # (P,)
    assert full[1] > 2.5 * full[0]  # property RMS ratio preserved
    target_scale = scaler.per_target["t"][0]
    per_prop = scaler._block_factor("t", 0, False, True)[0]
    # decomposition: full == per_target * per_property
    np.testing.assert_allclose(target_scale * per_prop, full, rtol=1e-12)

    # apply/remove roundtrip on a device prediction
    pred = {"t": TensorMap(Labels.single(), [
        TensorBlock(
            values=jnp.ones((3, 2)),
            samples=Labels.range("system", 3),
            components=(),
            properties=Labels.range("property", 2),
        )
    ])}
    scaled = scaler.apply_scales(pred)
    unscaled = scaler.apply_scales(scaled, remove=True)
    np.testing.assert_allclose(
        np.asarray(unscaled["t"].block().values), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scaled["t"].block().values), np.tile(full, (3, 1)), rtol=1e-6
    )


def test_per_type_scales_for_per_atom_targets():
    """Per-atom targets get one scale row per atomic type
    (reference _base_scaler.py per-type accumulation)."""
    info = get_generic_target_info("scalar", num_properties=1, per_atom=True)
    ds_info = DatasetInfo("angstrom", [1, 6], {"t": info})
    rng = np.random.default_rng(1)
    systems, targets = [], []
    for i in range(40):
        s = make_molecule(6, seed=100 + i, types=(1, 6))
        systems.append(s)
        vals = np.where(
            (s.types == 1)[:, None], rng.normal(size=(6, 1)) * 1.0,
            rng.normal(size=(6, 1)) * 10.0,
        )
        targets.append(_per_atom_map(vals))
    scaler = Scaler({}, ds_info)
    scaler.fit([Dataset(systems, {"t": targets})])

    s_by_type = scaler.scales["t"][0][:, 0]  # (n_types,)
    idx_h = ds_info.atomic_types.index(1)
    idx_c = ds_info.atomic_types.index(6)
    assert s_by_type[idx_c] > 5 * s_by_type[idx_h]

    # collate removal divides each atom's row by its type's scale
    from metatrain_tpu.data.dataset import Sample

    sample = Sample(systems[0], {"t": targets[0]}, {})
    (removed,) = scaler.remove_transform([sample])
    orig = np.asarray(targets[0].block().values)
    new = np.asarray(removed.targets["t"].block().values)
    expected = orig / np.where(
        (systems[0].types == 1)[:, None],
        s_by_type[idx_h],
        s_by_type[idx_c],
    )
    np.testing.assert_allclose(new, expected, rtol=1e-12)


def test_v1_checkpoint_scales_still_load():
    info = get_generic_target_info("scalar", num_properties=2)
    ds_info = DatasetInfo("angstrom", [1], {"t": info})
    ckpt = {
        "architecture_name": "scaler",
        "model_ckpt_version": 1,
        "hypers": {},
        "dataset_info": ds_info.to_dict(),
        "scales": {"t": np.array([2.0, 4.0])},
    }
    scaler = Scaler.load_checkpoint(ckpt)
    np.testing.assert_allclose(scaler.scales["t"][0][0], [2.0, 4.0])
