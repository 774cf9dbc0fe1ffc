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


def test_cli_train_from_disk_datasets(tmp_path, monkeypatch):
    """The options-file path accepts a .zip DiskDataset and a memmap
    directory directly as training_set.systems.read_from (reference
    get_dataset dispatch)."""
    import yaml

    from metatrain_tpu.__main__ import main

    rng = np.random.default_rng(0)
    systems, energies, forces = [], [], []
    for i in range(10):
        s = make_molecule(4 + i % 3, seed=i)
        systems.append(s)
        energies.append(rng.normal())
        forces.append(rng.normal(size=(len(s), 3)))

    zip_path = str(tmp_path / "data.zip")
    with DiskDatasetWriter(zip_path) as writer:
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

    mm_dir = str(tmp_path / "data_memmap")
    write_memmap_dataset(
        mm_dir, systems, energies=np.asarray(energies), forces=forces
    )

    arch = {
        "name": "soap_bpnn",
        "model": {
            "soap": {"max_angular": 1, "max_radial": 1,
                     "cutoff": {"radius": 4.0}},
            "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 4},
        },
        "training": {"num_epochs": 1, "batch_size": 4},
    }
    monkeypatch.chdir(tmp_path)
    for source in (zip_path, mm_dir):
        options = {
            "seed": 0,
            "architecture": arch,
            "training_set": {
                "systems": {"read_from": source, "length_unit": "angstrom"},
                "targets": {"energy": {}},
            },
            "validation_set": 0.2,
            "test_set": 0.0,
        }
        opath = tmp_path / "options_disk.yaml"
        yaml.safe_dump(options, open(opath, "w"))
        assert main(["train", str(opath), "-o", "disk_model.mtt"]) == 0
        assert (tmp_path / "disk_model.mtt").exists()
