"""Prediction writers (reference ``utils/data/writers/``).

Registry keyed on output suffix: ``.xyz`` -> extended-xyz with predicted
energies/forces as info/columns; ``.npz`` -> a metatensor-like archive of
per-system blocks (numpy, host-side).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..containers import TensorMap, systems_to_lists
from .readers.extxyz import write_xyz
from .target_info import TargetInfo


def _split_batch_predictions(batch, predictions: Dict[str, TensorMap]):
    """Split device batch predictions back into per-system host values."""
    systems = systems_to_lists(batch.systems)
    system_mask = np.asarray(batch.systems.system_mask)
    atom_mask = np.asarray(batch.systems.atom_mask)
    system_index = np.asarray(batch.systems.system_index)
    real_systems = np.nonzero(system_mask)[0]

    per_system: List[Dict[str, Dict[str, np.ndarray]]] = [
        {} for _ in real_systems
    ]
    for name, tmap in predictions.items():
        host = tmap.to_host()
        block = host.block(0)
        values = np.asarray(block.values)
        per_atom = "atom" in block.samples.names
        for slot, sys_i in enumerate(real_systems):
            entry: Dict[str, np.ndarray] = {}
            if per_atom:
                sel = atom_mask & (system_index == sys_i)
                entry["values"] = values[sel]
            else:
                entry["values"] = values[sys_i]
            for gname, grad in block.gradients():
                g_values = np.asarray(grad.values)
                if gname == "positions":
                    sel = atom_mask & (system_index == sys_i)
                    entry["positions_grad"] = g_values[sel]
                elif gname == "strain":
                    entry["strain_grad"] = g_values[sys_i]
            per_system[slot][name] = entry
    return systems, per_system


def write_predictions(
    path: str,
    batches_and_predictions: List[Tuple[object, Dict[str, TensorMap]]],
    target_infos: Dict[str, TargetInfo],
) -> None:
    """Suffix-dispatched writers (reference ``writers/__init__.py:41-50``):
    ``.xyz`` / ``.extxyz``, ``.npz``, ``.zip`` (DiskDataset), trailing
    ``/`` (memmap directory)."""
    path = str(path)
    if path.endswith((".xyz", ".extxyz")):
        _write_xyz_predictions(path, batches_and_predictions)
    elif path.endswith(".npz"):
        _write_npz_predictions(path, batches_and_predictions)
    elif path.endswith(".zip"):
        _write_zip_predictions(path, batches_and_predictions)
    elif path.endswith("/"):
        _write_memmap_predictions(path, batches_and_predictions)
    else:
        raise ValueError(f"no writer for output suffix of {path!r}")


def _write_zip_predictions(path, batches_and_predictions):
    from .disk import DiskDatasetWriter

    with DiskDatasetWriter(path) as writer:
        for batch, predictions in batches_and_predictions:
            systems, per_system = _split_batch_predictions(batch, predictions)
            for system, preds in zip(systems, per_system):
                fields = {}
                for name, entry in preds.items():
                    record = {"values": np.asarray(entry["values"]).reshape(-1)}
                    if "positions_grad" in entry:
                        record["positions_gradient"] = entry["positions_grad"]
                    if "strain_grad" in entry:
                        record["strain_gradient"] = entry["strain_grad"]
                    fields[name] = record
                writer.write(system, fields)


def _write_memmap_predictions(path, batches_and_predictions):
    from .disk import write_memmap_dataset

    systems, energies, forces = [], [], []
    for batch, predictions in batches_and_predictions:
        batch_systems, per_system = _split_batch_predictions(
            batch, predictions
        )
        for system, preds in zip(batch_systems, per_system):
            systems.append(system)
            first = next(iter(preds.values()))
            energies.append(float(np.asarray(first["values"]).reshape(-1)[0]))
            if "positions_grad" in first:
                forces.append(
                    -np.asarray(first["positions_grad"]).reshape(len(system), 3)
                )
    write_memmap_dataset(
        path, systems, np.asarray(energies), forces if forces else None
    )


def _write_xyz_predictions(path, batches_and_predictions):
    all_systems, all_info, all_arrays = [], [], []
    for batch, predictions in batches_and_predictions:
        systems, per_system = _split_batch_predictions(batch, predictions)
        for system, preds in zip(systems, per_system):
            info, arrays = {}, {}
            for name, entry in preds.items():
                values = entry["values"]
                if values.ndim >= 1 and values.shape[0] == len(system):
                    arrays[name] = values.reshape(len(system), -1)
                else:
                    flat = values.reshape(-1)
                    info[name] = flat[0] if flat.size == 1 else flat
                if "positions_grad" in entry:
                    # stored gradient is dE/dr; forces = -gradient
                    arrays[f"{name}_forces"] = -entry[
                        "positions_grad"
                    ].reshape(len(system), -1)
                if "strain_grad" in entry:
                    info[f"{name}_strain_gradient"] = entry[
                        "strain_grad"
                    ].reshape(-1)
            all_systems.append(system)
            all_info.append(info)
            all_arrays.append(arrays)
    write_xyz(path, all_systems, per_atom_arrays=all_arrays, info=all_info)


def _write_npz_predictions(path, batches_and_predictions):
    arrays: Dict[str, np.ndarray] = {}
    index = 0
    for batch, predictions in batches_and_predictions:
        systems, per_system = _split_batch_predictions(batch, predictions)
        for system, preds in zip(systems, per_system):
            for name, entry in preds.items():
                for field, value in entry.items():
                    arrays[f"{index}/{name}/{field}"] = value
            index += 1
    np.savez_compressed(path, **arrays)
