"""SmartZip: numpy-indexed zip reading (reference smart_zip.py parity)."""

import pickle
import zipfile

import numpy as np
import pytest

from metatrain_tpu.data.smart_zip import BadZip, SmartZip


def _make_zip(path, n=200, compression=zipfile.ZIP_STORED):
    rng = np.random.default_rng(0)
    payloads = {}
    with zipfile.ZipFile(path, "w", compression=compression) as z:
        for i in range(n):
            name = f"dir{i % 7}/member_{i}.bin"
            data = rng.integers(0, 256, size=rng.integers(1, 400)).astype(
                np.uint8
            ).tobytes()
            z.writestr(name, data)
            payloads[name] = data
    return payloads


@pytest.mark.parametrize(
    "compression", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED]
)
def test_smart_zip_matches_zipfile(tmp_path, compression):
    path = tmp_path / "data.zip"
    payloads = _make_zip(path, compression=compression)
    sz = SmartZip(str(path))
    assert len(sz) == len(payloads)
    assert sorted(sz.namelist()) == sorted(payloads)
    for name, data in payloads.items():
        assert sz.read(name) == data


def test_smart_zip_detects_corruption(tmp_path):
    path = tmp_path / "data.zip"
    _make_zip(path, n=5)
    sz = SmartZip(str(path))
    # corrupt the first member's payload in place
    offset = int(sz._header_offsets[0]) + 30 + len(sz._name_at(0))
    raw = bytearray(path.read_bytes())
    raw[offset] ^= 0xFF
    path.write_bytes(bytes(raw))
    sz2 = SmartZip(str(path))
    with pytest.raises(BadZip, match="CRC"):
        sz2.read(0)


def test_smart_zip_pickles_into_workers(tmp_path):
    path = tmp_path / "data.zip"
    payloads = _make_zip(path, n=20)
    sz = SmartZip(str(path))
    _ = sz.read(0)  # open the per-process handle
    clone = pickle.loads(pickle.dumps(sz))
    name = sorted(payloads)[3]
    assert clone.read(name) == payloads[name]


def test_disk_dataset_uses_smart_zip(tmp_path):
    from metatrain_tpu.data.disk import DiskDataset, DiskDatasetWriter

    from conftest import make_molecule

    writer = DiskDatasetWriter(str(tmp_path / "ds.zip"))
    rng = np.random.default_rng(0)
    for i in range(4):
        system = make_molecule(5, seed=i)
        writer.write(system, {"energy": {"values": np.asarray([[rng.normal()]])}})
    writer.close()
    ds = DiskDataset(str(tmp_path / "ds.zip"))
    assert isinstance(ds.zipf, SmartZip)
    assert len(ds) == 4
    sample = ds[2]
    assert len(sample.system) == 5
