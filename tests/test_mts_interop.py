"""metatensor/metatomic interop: .mts / .mta / reference DiskDataset zips.

The byte format is the metatensor serialization layout (stored zip of
npy members); fixtures written by the REAL metatensor library live in
``/root/reference/tests/resources`` and are read when present (format
ground truth); everything else round-trips through our own writer.
"""

import io
import os
import zipfile
from pathlib import Path

import numpy as np
import pytest

from metatrain_tpu.containers import Labels, System, TensorBlock, TensorMap
from metatrain_tpu.data.readers.mts import (
    load_mta_bytes,
    load_mts,
    load_mts_bytes,
    mta_bytes,
    mts_bytes,
    read_mts_target,
    save_mts,
    split_by_system,
)

REFERENCE_ZIP = "/root/reference/tests/resources/spherical_disk_dataset.zip"


def _energy_tensormap(n_systems=3, n_atoms=4, with_gradients=True, seed=0):
    rng = np.random.default_rng(seed)
    blocks = []
    values = rng.normal(size=(n_systems, 1))
    samples = Labels(
        ["system"], np.arange(n_systems, dtype=np.int32).reshape(-1, 1)
    )
    props = Labels(["energy"], np.zeros((1, 1), np.int32))
    block = TensorBlock(values, samples, [], props)
    if with_gradients:
        xyz = Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))
        g_samples = []
        for s in range(n_systems):
            for a in range(n_atoms):
                g_samples.append([s, s, a])
        grad = TensorBlock(
            rng.normal(size=(n_systems * n_atoms, 3, 1)),
            Labels(["sample", "system", "atom"], np.asarray(g_samples, np.int32)),
            [xyz],
            props,
        )
        block.add_gradient("positions", grad)
    blocks.append(block)
    return TensorMap(Labels.single(), blocks)


def test_mts_roundtrip_scalar_with_gradients(tmp_path):
    tmap = _energy_tensormap()
    path = str(tmp_path / "energy.mts")
    save_mts(tmap, path)
    back = load_mts(path)
    assert list(back.keys.names) == list(tmap.keys.names)
    b0, r0 = tmap.block(0), back.block(0)
    np.testing.assert_allclose(np.asarray(r0.values), np.asarray(b0.values))
    assert list(r0.samples.names) == ["system"]
    assert list(r0.properties.names) == ["energy"]
    g, rg = b0.gradient("positions"), r0.gradient("positions")
    np.testing.assert_allclose(np.asarray(rg.values), np.asarray(g.values))
    assert list(rg.samples.names) == ["sample", "system", "atom"]
    # gradients share the parent's properties
    assert list(rg.properties.names) == ["energy"]


def test_mts_is_valid_stored_zip(tmp_path):
    """The output must be a plain stored zip of npy members (what the
    metatensor Rust core reads)."""
    data = mts_bytes(_energy_tensormap())
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    assert "keys.npy" in names
    assert "blocks/0/values.npy" in names
    assert "blocks/0/gradients/positions/values.npy" in names
    assert "blocks/0/gradients/positions/properties.npy" not in names
    for info in zf.infolist():
        assert info.compress_type == zipfile.ZIP_STORED
        member = zf.read(info.filename)
        arr = np.load(io.BytesIO(member))
        assert arr is not None
    keys = np.load(io.BytesIO(zf.read("keys.npy")))
    assert keys.dtype.names is not None  # structured Labels array


def test_mta_roundtrip():
    system = System(
        positions=np.random.default_rng(0).normal(size=(5, 3)),
        types=np.array([1, 6, 8, 1, 1], np.int32),
        cell=np.eye(3) * 10.0,
        pbc=np.ones(3, bool),
    )
    back = load_mta_bytes(mta_bytes(system))
    np.testing.assert_allclose(back.positions, system.positions)
    np.testing.assert_array_equal(back.types, system.types)
    np.testing.assert_allclose(back.cell, system.cell)
    np.testing.assert_array_equal(back.pbc, system.pbc)


def test_split_by_system_with_gradients():
    tmap = _energy_tensormap(n_systems=3, n_atoms=2)
    maps = split_by_system(tmap)
    assert len(maps) == 3
    for i, m in enumerate(maps):
        block = m.block(0)
        assert np.asarray(block.samples.values)[0, 0] == 0  # renumbered
        np.testing.assert_allclose(
            np.asarray(block.values), np.asarray(tmap.block(0).values)[i : i + 1]
        )
        grad = block.gradient("positions")
        assert grad.values.shape == (2, 3, 1)
        # gradient 'sample' column points at row 0 of the split block
        np.testing.assert_array_equal(
            np.asarray(grad.samples.values)[:, 0], [0, 0]
        )
        np.testing.assert_allclose(
            np.asarray(grad.values),
            np.asarray(tmap.block(0).gradient("positions").values)[
                2 * i : 2 * i + 2
            ],
        )


def test_read_mts_target_energy(tmp_path):
    tmap = _energy_tensormap(n_systems=4, n_atoms=3)
    path = str(tmp_path / "e.mts")
    save_mts(tmap, path)
    maps, info = read_mts_target(
        path, {"unit": "eV"}, n_systems=4, is_energy=True
    )
    assert len(maps) == 4
    assert info.quantity == "energy"
    assert "positions" in info.gradients


def test_read_mts_target_wrong_count(tmp_path):
    tmap = _energy_tensormap(n_systems=4)
    path = str(tmp_path / "e.mts")
    save_mts(tmap, path)
    with pytest.raises(ValueError, match="expected 7"):
        read_mts_target(path, {}, n_systems=7, is_energy=True)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_ZIP), reason="reference fixtures unavailable"
)
class TestReferenceWrittenFiles:
    """Ground truth: files written by the real metatensor/metatomic libs."""

    def test_load_reference_mts(self):
        zf = zipfile.ZipFile(REFERENCE_ZIP)
        tmap = load_mts_bytes(
            zf.read("0/mtt::electron_density_basis.mts")
        )
        assert list(tmap.keys.names) == ["o3_lambda", "o3_sigma"]
        assert len(tmap) == 4
        block = tmap.block(0)
        assert list(block.samples.names) == ["system", "atom"]
        assert [list(c.names) for c in block.components] == [["o3_mu"]]
        assert np.asarray(block.values).dtype == np.float64

    def test_load_reference_mta(self):
        zf = zipfile.ZipFile(REFERENCE_ZIP)
        system = load_mta_bytes(zf.read("0/system.mta"))
        assert len(system) == 3
        assert system.positions.shape == (3, 3)
        assert list(system.types) == [8, 1, 1]

    def test_reference_diskdataset_zip(self):
        """A zip written by the reference's DiskDatasetWriter loads
        through our DiskDataset (layout auto-detected)."""
        from metatrain_tpu.data.disk import DiskDataset

        ds = DiskDataset(REFERENCE_ZIP)
        assert len(ds) == 2
        assert ds.target_names == ["mtt::electron_density_basis"]
        sample = ds[0]
        assert len(sample.system) == 3
        tmap = sample.targets["mtt::electron_density_basis"]
        assert len(tmap) == 4
        infos = ds.infer_target_infos()
        info = infos["mtt::electron_density_basis"]
        assert info.is_spherical
        assert info.per_atom

    def test_roundtrip_reference_file(self):
        """reference bytes -> our containers -> our writer -> our reader
        reproduces values and labels exactly."""
        zf = zipfile.ZipFile(REFERENCE_ZIP)
        original = load_mts_bytes(
            zf.read("1/mtt::electron_density_basis.mts")
        )
        back = load_mts_bytes(mts_bytes(original))
        for (k1, b1), (k2, b2) in zip(original.items(), back.items()):
            assert k1 == k2
            np.testing.assert_array_equal(
                np.asarray(b1.values), np.asarray(b2.values)
            )
            assert list(b1.samples.names) == list(b2.samples.names)
            np.testing.assert_array_equal(
                np.asarray(b1.samples.values), np.asarray(b2.samples.values)
            )


def test_mts_target_through_read_targets(tmp_path, molecule):
    """.mts read_from in a target config routes through the metatensor
    reader (reference readers/readers.py:16-24 extension dispatch)."""
    from metatrain_tpu.data.readers import read_targets

    systems = [molecule, molecule]
    tmap = _energy_tensormap(n_systems=2, n_atoms=len(molecule))
    path = str(tmp_path / "etarget.mts")
    save_mts(tmap, path)
    targets, infos = read_targets(
        systems,
        {"energy": {"read_from": path, "unit": "eV", "quantity": "energy"}},
    )
    assert len(targets["energy"]) == 2
    assert infos["energy"].quantity == "energy"
    np.testing.assert_allclose(
        np.asarray(targets["energy"][1].block(0).values),
        np.asarray(tmap.block(0).values)[1:2],
    )
