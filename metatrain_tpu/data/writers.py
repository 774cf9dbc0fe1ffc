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
    elif path.endswith(".mts"):
        _write_mts_predictions(path, batches_and_predictions, target_infos)
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


def _write_mts_predictions(path, batches_and_predictions, target_infos):
    """metatensor-format output: one ``{stem}_{target}.mts`` file per
    target, all systems joined with global ``system`` sample ids
    (reference ``writers/metatensor.py`` MetatensorWriter). Readable by
    the reference's ``mts.load`` directly."""
    from ..containers import Labels, TensorBlock
    from .readers.mts import save_mts

    # accumulate per-target host values per system (masked, unpadded)
    acc: Dict[str, List[Tuple[int, int, Dict[str, np.ndarray]]]] = {}
    index = 0
    for batch, predictions in batches_and_predictions:
        systems, per_system = _split_batch_predictions(batch, predictions)
        for system, preds in zip(systems, per_system):
            for name, entry in preds.items():
                acc.setdefault(name, []).append(
                    (index, len(system), entry)
                )
            index += 1

    stem = str(Path(path).with_suffix(""))
    e_props = Labels(["energy"], np.zeros((1, 1), dtype=np.int32))
    xyz = Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))
    strain_comps = [
        Labels(["xyz_1"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
        Labels(["xyz_2"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
    ]
    for name, entries in acc.items():
        info = target_infos.get(name)
        if info is not None and len(info.layout) > 1:
            raise ValueError(
                f"the .mts writer does not support multi-block targets "
                f"yet (target {name!r} has {len(info.layout)} blocks)"
            )
        layout_block = info.layout.block(0) if info is not None else None
        per_atom = bool(info.per_atom) if info is not None else False
        comps = list(layout_block.components) if layout_block is not None else []
        props = (
            layout_block.properties if layout_block is not None else e_props
        )
        values_rows, sample_rows = [], []
        grad_pos_rows, grad_pos_samples = [], []
        grad_strain_rows, grad_strain_samples = [], []
        # gradient "sample" columns reference the parent block's sample
        # ROW, which advances by n_atoms per entry for per-atom targets
        parent_row = 0
        for sys_i, n_atoms, entry in entries:
            v = np.asarray(entry["values"], dtype=np.float64)
            if per_atom:
                v = v.reshape((n_atoms,) + tuple(len(c) for c in comps) + (-1,))
                values_rows.append(v)
                sample_rows.extend([sys_i, a] for a in range(n_atoms))
            else:
                v = v.reshape((1,) + tuple(len(c) for c in comps) + (-1,))
                values_rows.append(v)
                sample_rows.append([sys_i])
            if "positions_grad" in entry:
                g = np.asarray(
                    entry["positions_grad"], dtype=np.float64
                ).reshape(n_atoms, 3, -1)
                grad_pos_rows.append(g)
                grad_pos_samples.extend(
                    [parent_row, sys_i, a] for a in range(n_atoms)
                )
            if "strain_grad" in entry:
                g = np.asarray(
                    entry["strain_grad"], dtype=np.float64
                ).reshape(1, 3, 3, -1)
                grad_strain_rows.append(g)
                grad_strain_samples.append([parent_row])
            parent_row += n_atoms if per_atom else 1
        block = TensorBlock(
            values=np.concatenate(values_rows, axis=0),
            samples=Labels(
                ["system", "atom"] if per_atom else ["system"],
                np.asarray(sample_rows, dtype=np.int32),
            ),
            components=comps,
            properties=props,
        )
        if grad_pos_rows:
            block.add_gradient(
                "positions",
                TensorBlock(
                    values=np.concatenate(grad_pos_rows, axis=0),
                    samples=Labels(
                        ["sample", "system", "atom"],
                        np.asarray(grad_pos_samples, dtype=np.int32),
                    ),
                    components=[xyz],
                    properties=props,
                ),
            )
        if grad_strain_rows:
            block.add_gradient(
                "strain",
                TensorBlock(
                    values=np.concatenate(grad_strain_rows, axis=0),
                    samples=Labels(
                        ["sample"],
                        np.asarray(grad_strain_samples, dtype=np.int32),
                    ),
                    components=strain_comps,
                    properties=props,
                ),
            )
        keys = info.layout.keys if info is not None else Labels.single()
        save_mts(TensorMap(keys, [block]), f"{stem}_{name}.mts")


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
