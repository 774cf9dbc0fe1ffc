"""DiskDataset (zip) and MemmapDataset round-trips + training."""

import numpy as np

from metatrain_tpu.data.collate import CollateFn
from metatrain_tpu.data.disk import (
    DiskDataset,
    DiskDatasetWriter,
    MemmapDataset,
    write_memmap_dataset,
)
from metatrain_tpu.data.samplers import BatchSampler, DataLoader

from conftest import make_molecule


def _systems(n=6):
    rng = np.random.default_rng(0)
    systems, energies, forces = [], [], []
    for i in range(n):
        s = make_molecule(4 + i % 2, seed=i)
        systems.append(s)
        energies.append(rng.normal())
        forces.append(rng.normal(size=(len(s), 3)))
    return systems, np.asarray(energies), forces


def test_disk_dataset_roundtrip(tmp_path):
    systems, energies, forces = _systems()
    path = str(tmp_path / "data.zip")
    with DiskDatasetWriter(path) as writer:
        for s, e, f in zip(systems, energies, forces):
            writer.write(
                s,
                {
                    "energy": {
                        "values": np.asarray([e]),
                        "positions_gradient": -f,
                    }
                },
            )

    ds = DiskDataset(path)
    assert len(ds) == 6
    np.testing.assert_array_equal(ds.atom_counts, [len(s) for s in systems])
    sample = ds[2]
    np.testing.assert_allclose(sample.system.positions, systems[2].positions)
    np.testing.assert_allclose(
        np.asarray(sample.targets["energy"].block().values), [[energies[2]]]
    )
    np.testing.assert_allclose(
        np.asarray(
            sample.targets["energy"].block().gradient("positions").values
        )[:, :, 0],
        -forces[2],
    )

    infos = ds.infer_target_infos()
    assert infos["energy"].gradients == ["positions"]

    # feeds the standard loader/collate path
    collate = CollateFn(cutoff=4.0, target_infos=infos)
    loader = DataLoader(ds, BatchSampler(len(ds), 3, shuffle=False), collate)
    batches = list(loader)
    assert len(batches) == 2
    assert np.asarray(batches[0].targets["energy"].block().mask).sum() == 3


def test_memmap_dataset_roundtrip(tmp_path):
    systems, energies, forces = _systems()
    directory = str(tmp_path / "memmap")
    write_memmap_dataset(directory, systems, energies, forces)

    ds = MemmapDataset(directory)
    assert len(ds) == 6
    sample = ds[3]
    np.testing.assert_allclose(sample.system.positions, systems[3].positions)
    np.testing.assert_array_equal(sample.system.types, systems[3].types)
    np.testing.assert_allclose(
        np.asarray(sample.targets["energy"].block().values)[0, 0], energies[3]
    )
    np.testing.assert_allclose(
        np.asarray(
            sample.targets["energy"].block().gradient("positions").values
        )[:, :, 0],
        -forces[3],
    )
