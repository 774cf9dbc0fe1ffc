"""Disk-backed datasets: zip archives and binary memmaps.

Counterparts of the reference's ``DiskDataset`` (zip of per-structure
members, ``utils/data/dataset.py:624-867``) and ``MemmapDataset``
(``ns.npy / na.npy / x.bin / a.bin / c.bin / <target>.bin`` binary layout,
``:1273-1725``). Both serve :class:`~metatrain_tpu.data.dataset.Sample`
objects lazily, so million-structure datasets never fully materialize.

Zip format (``.zip``): member ``{i}/system.npz`` holds positions/types/
cell/pbc; ``{i}/{target}.npz`` holds target values (+ optional
``positions_gradient`` / ``strain_gradient``); ``metadata/atom_counts.npy``
enables length-aware batch packing without touching members.

Memmap format (directory): ``ns.npy`` (int64 scalar), ``na.npy``
(int64[ns]), ``x.bin`` (f64 positions), ``a.bin`` (i32 types), ``c.bin``
(f64 cells), ``p.bin`` (bool pbc), per-target ``{name}.bin`` (f64,
per-structure) plus optional ``momenta.bin`` / ``masses.bin`` for FlashMD.
"""

from __future__ import annotations

import io
import json
import zipfile

from .smart_zip import SmartZip
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..containers import Labels, System, TensorBlock, TensorMap
from .dataset import Sample
from .target_info import TargetInfo, get_energy_target_info


_XYZ = Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))
_STRAIN = [
    Labels(["xyz_1"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
    Labels(["xyz_2"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
]
_E_PROPS = Labels(["energy"], np.zeros((1, 1), dtype=np.int32))


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class DiskDatasetWriter:
    """Stream systems + targets into a zip archive."""

    def __init__(self, path: str):
        self.zipf = zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED)
        self._count = 0
        self._atom_counts: List[int] = []

    def write(self, system: System, targets: Dict[str, Dict[str, np.ndarray]]):
        i = self._count
        self.zipf.writestr(
            f"{i}/system.npz",
            _npz_bytes(
                positions=system.positions,
                types=system.types,
                cell=system.cell,
                pbc=system.pbc,
            ),
        )
        for name, fields in targets.items():
            self.zipf.writestr(f"{i}/{name}.npz", _npz_bytes(**fields))
        self._atom_counts.append(len(system))
        self._count += 1

    def close(self):
        buf = io.BytesIO()
        np.save(buf, np.asarray(self._atom_counts, dtype=np.int64))
        self.zipf.writestr("metadata/atom_counts.npy", buf.getvalue())
        self.zipf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DiskDataset:
    """Zip-backed dataset with lazy member reads.

    Two member layouts are auto-detected:

    - native: ``{i}/system.npz`` + ``{i}/{target}.npz`` (this module's
      writer);
    - **reference metatrain**: ``{i}/system.mta`` + ``{i}/{target}.mts``
      (``/root/reference/src/metatrain/utils/data/dataset.py:624-799``)
      — existing metatrain DiskDataset zips load as-is, no conversion.

    :param target_infos: target name -> TargetInfo (drives gradient
        reconstruction). Defaults to an energy target whose gradients are
        inferred from the stored fields.
    """

    def __init__(
        self, path: str, target_infos: Optional[Dict[str, TargetInfo]] = None
    ):
        self.path = str(path)
        # numpy-indexed central directory: scales to millions of members
        # and pickles into dataloader workers (reference SmartZip,
        # utils/data/smart_zip.py)
        self.zipf = SmartZip(self.path)
        names = self.zipf.namelist()
        self._reference_layout = any(n.endswith("/system.mta") for n in names)
        suffix = ".mts" if self._reference_layout else ".npz"
        sysname = "system.mta" if self._reference_layout else "system.npz"
        # member parsing mirrors the reference's tolerance
        # (utils/data/dataset.py: folder-zipped datasets, stray files
        # warned about and skipped): accept only ``<N>/<field><suffix>``
        # with an unpadded decimal N, one path level deep.
        target_names = set()
        system_indices = set()
        skipped = []
        for n in names:
            if n.startswith("metadata/"):
                continue
            parts = n.split("/")
            if (
                len(parts) != 2
                or not parts[0].isdigit()
                or parts[0] != str(int(parts[0]))
                or not parts[1].endswith(suffix)
            ):
                skipped.append(n)
                continue
            if parts[1] == sysname:
                system_indices.add(int(parts[0]))
            else:
                target_names.add(parts[1].removesuffix(suffix))
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "ignoring %d non-dataset member(s) in %s (e.g. %r)",
                len(skipped), self.path, skipped[0],
            )
        self.target_names = sorted(target_names)
        # metadata/atom_counts.npy enables length-aware packing without
        # touching members, but is optional (the reference supports
        # folder-zipped datasets without it): fall back to the member
        # scan for the length and read counts lazily on first use.
        if "metadata/atom_counts.npy" in names:
            self._atom_counts = np.load(
                io.BytesIO(self.zipf.read("metadata/atom_counts.npy"))
            )
            self._len = len(self._atom_counts)
        else:
            self._len = len(system_indices)
            if system_indices and (
                min(system_indices) != 0
                or max(system_indices) != self._len - 1
            ):
                raise ValueError(
                    f"{self.path}: system members are not contiguously "
                    "numbered from 0"
                )
            self._atom_counts = None
        self.target_infos = target_infos or {}

    def __len__(self) -> int:
        return self._len

    @property
    def atom_counts(self) -> np.ndarray:
        if self._atom_counts is None:
            # no metadata member: derive lazily from the system members
            self._atom_counts = np.asarray(
                [len(self[i].system) for i in range(len(self))],
                dtype=np.int64,
            )
        return self._atom_counts

    @property
    def systems(self):
        return [self[i].system for i in range(len(self))]

    @property
    def targets(self) -> Dict[str, List]:
        # materializes lazily; used by fitting paths that iterate targets
        return {
            name: [self[i].targets[name] for i in range(len(self))]
            for name in self.target_names
        }

    def _load_npz(self, member: str) -> Dict[str, np.ndarray]:
        with np.load(io.BytesIO(self.zipf.read(member))) as data:
            return {k: data[k] for k in data.files}

    def __getitem__(self, index: int) -> Sample:
        if self._reference_layout:
            from .readers.mts import load_mta_bytes, load_mts_bytes

            system = load_mta_bytes(self.zipf.read(f"{index}/system.mta"))
            targets = {
                name: load_mts_bytes(self.zipf.read(f"{index}/{name}.mts"))
                for name in self.target_names
            }
            return Sample(system, targets)
        raw = self._load_npz(f"{index}/system.npz")
        system = System(raw["positions"], raw["types"], raw["cell"], raw["pbc"])
        targets: Dict[str, TensorMap] = {}
        for name in self.target_names:
            fields = self._load_npz(f"{index}/{name}.npz")
            targets[name] = _fields_to_tensormap(fields, index, len(system))
        return Sample(system, targets)

    def infer_target_infos(self) -> Dict[str, TargetInfo]:
        if not len(self):
            return {}
        sample = self[0]
        infos = {}
        for name, tmap in sample.targets.items():
            block = tmap.block(0)
            if self._reference_layout and not _is_energy_layout(name, tmap):
                infos[name] = _info_from_tensormap(tmap)
                continue
            infos[name] = get_energy_target_info(
                "eV",
                add_position_gradients=block.has_gradient("positions"),
                add_strain_gradients=block.has_gradient("strain"),
            )
        return infos

    @property
    def extra_data(self) -> Dict:
        return {}

    def select(self, indices):
        from .dataset import DatasetView

        return DatasetView(self, indices)


def _is_energy_layout(name: str, tmap: TensorMap) -> bool:
    """Whether a reference-layout target TensorMap is an energy: a
    per-structure scalar with one property, either carrying energy
    gradients or simply named ``energy``."""
    if len(tmap) != 1:
        return False
    block = tmap.block(0)
    if block.components or "atom" in block.samples.names:
        return False
    if np.asarray(block.values).shape[-1] != 1:
        return False
    return bool(block.gradients_list()) or name == "energy"


def _info_from_tensormap(tmap: TensorMap) -> TargetInfo:
    """Zero-sample TargetInfo layout matching an actual TensorMap's
    structure (keys, sample names, components, properties, gradients)."""
    from .target_info import _empty_block

    blocks = []
    for _, block in tmap.items():
        nb = _empty_block(block.samples.names, block.components, block.properties)
        for gname, grad in block.gradients():
            nb.add_gradient(
                gname,
                _empty_block(grad.samples.names, grad.components, grad.properties),
            )
        blocks.append(nb)
    return TargetInfo(TensorMap(tmap.keys, blocks))


def _fields_to_tensormap(
    fields: Dict[str, np.ndarray], index: int, n_atoms: int
) -> TensorMap:
    values = np.asarray(fields["values"], dtype=np.float64).reshape(1, -1)
    block = TensorBlock(
        values=values,
        samples=Labels(["system"], np.array([[index]], dtype=np.int32)),
        components=[],
        properties=Labels.range("energy", values.shape[-1]),
    )
    if "positions_gradient" in fields:
        grad = np.asarray(fields["positions_gradient"], dtype=np.float64)
        block.add_gradient(
            "positions",
            TensorBlock(
                grad.reshape(n_atoms, 3, -1),
                Labels.range("atom", n_atoms),
                [_XYZ],
                _E_PROPS,
            ),
        )
    if "strain_gradient" in fields:
        grad = np.asarray(fields["strain_gradient"], dtype=np.float64)
        block.add_gradient(
            "strain",
            TensorBlock(
                grad.reshape(1, 3, 3, -1),
                Labels(["sample"], np.array([[0]], dtype=np.int32)),
                _STRAIN,
                _E_PROPS,
            ),
        )
    return TensorMap(Labels.single(), [block])


class MemmapDataset:
    """Binary memmap dataset (reference layout, ``dataset.py:1273-1725``)."""

    def __init__(self, directory: str, target_names: Sequence[str] = ("energy",)):
        self.dir = Path(directory)
        self.n_structures = int(np.load(self.dir / "ns.npy"))
        self.na = np.load(self.dir / "na.npy")
        self._offsets = np.concatenate([[0], np.cumsum(self.na)])
        total = int(self._offsets[-1])
        self.x = np.memmap(
            self.dir / "x.bin", dtype=np.float64, mode="r", shape=(total, 3)
        )
        self.a = np.memmap(
            self.dir / "a.bin", dtype=np.int32, mode="r", shape=(total,)
        )
        self.c = np.memmap(
            self.dir / "c.bin", dtype=np.float64, mode="r",
            shape=(self.n_structures, 3, 3),
        )
        pbc_path = self.dir / "p.bin"
        self.p = (
            np.memmap(pbc_path, dtype=bool, mode="r", shape=(self.n_structures, 3))
            if pbc_path.exists()
            else None
        )
        self.target_names = list(target_names)
        self._targets = {}
        for name in self.target_names:
            path = self.dir / f"{name}.bin"
            if path.exists():
                self._targets[name] = np.memmap(
                    path, dtype=np.float64, mode="r", shape=(self.n_structures,)
                )
        forces_path = self.dir / "forces.bin"
        self.forces = (
            np.memmap(forces_path, dtype=np.float64, mode="r", shape=(total, 3))
            if forces_path.exists()
            else None
        )
        self.momenta = (
            np.memmap(
                self.dir / "momenta.bin", dtype=np.float64, mode="r",
                shape=(total, 3),
            )
            if (self.dir / "momenta.bin").exists()
            else None
        )
        self.masses = (
            np.memmap(
                self.dir / "masses.bin", dtype=np.float64, mode="r",
                shape=(total,),
            )
            if (self.dir / "masses.bin").exists()
            else None
        )

    def __len__(self) -> int:
        return self.n_structures

    @property
    def atom_counts(self) -> np.ndarray:
        return self.na

    @property
    def systems(self):
        return [self[i].system for i in range(len(self))]

    @property
    def targets(self):
        return {
            name: [self[i].targets[name] for i in range(len(self))]
            for name in self._targets
        }

    def __getitem__(self, index: int) -> Sample:
        a, b = int(self._offsets[index]), int(self._offsets[index + 1])
        cell = np.asarray(self.c[index])
        pbc = (
            np.asarray(self.p[index])
            if self.p is not None
            else np.array([np.linalg.norm(cell[k]) > 0 for k in range(3)])
        )
        system = System(
            np.asarray(self.x[a:b]), np.asarray(self.a[a:b]), cell, pbc
        )
        if self.momenta is not None:
            system.extra["momenta"] = np.asarray(self.momenta[a:b])
        if self.masses is not None:
            system.extra["masses"] = np.asarray(self.masses[a:b])
        targets = {}
        for name, values in self._targets.items():
            fields = {"values": np.asarray([values[index]])}
            if self.forces is not None and self._forces_target(name):
                fields["positions_gradient"] = -np.asarray(self.forces[a:b])
            targets[name] = _fields_to_tensormap(fields, index, b - a)
        return Sample(system, targets)

    def _forces_target(self, name: str) -> bool:
        """``forces.bin`` belongs to the energy target: the one named
        ``energy``, or the sole stored target."""
        return name == "energy" or len(self._targets) == 1

    def infer_target_infos(self) -> Dict[str, TargetInfo]:
        infos = {}
        for name in self._targets:
            infos[name] = get_energy_target_info(
                "eV",
                add_position_gradients=(
                    self.forces is not None and self._forces_target(name)
                ),
            )
        return infos

    @property
    def extra_data(self) -> Dict:
        return {}

    def select(self, indices):
        from .dataset import DatasetView

        return DatasetView(self, indices)


def write_memmap_dataset(
    directory: str,
    systems: Sequence[System],
    energies: Optional[np.ndarray] = None,
    forces: Optional[Sequence[np.ndarray]] = None,
) -> None:
    """Create a memmap dataset directory from in-memory systems."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    na = np.asarray([len(s) for s in systems], dtype=np.int64)
    np.save(directory / "ns.npy", np.asarray(len(systems), dtype=np.int64))
    np.save(directory / "na.npy", na)
    np.concatenate([s.positions for s in systems]).astype(np.float64).tofile(
        directory / "x.bin"
    )
    np.concatenate([s.types for s in systems]).astype(np.int32).tofile(
        directory / "a.bin"
    )
    np.stack([s.cell for s in systems]).astype(np.float64).tofile(
        directory / "c.bin"
    )
    np.stack([s.pbc for s in systems]).tofile(directory / "p.bin")
    if energies is not None:
        np.asarray(energies, dtype=np.float64).tofile(directory / "energy.bin")
    if forces is not None:
        np.concatenate(forces).astype(np.float64).tofile(
            directory / "forces.bin"
        )
