"""metatensor ``.mts`` / metatomic ``.mta`` interop (no Rust libs).

The metatensor serialization format is a STORED (uncompressed) zip of
``.npy`` members::

    keys.npy                                   structured ints: Labels
    blocks/{i}/values.npy                      float64 ndarray
    blocks/{i}/samples.npy                     structured ints: Labels
    blocks/{i}/components/{j}.npy              structured ints: Labels
    blocks/{i}/properties.npy                  structured ints: Labels
    blocks/{i}/gradients/{param}/values.npy    (+ samples/components)

(gradient blocks share their parent's properties). A metatomic System
(``.mta``) is the same idea with ``positions.npy`` / ``cell.npy`` /
``types.npy`` / ``pbc.npy`` members. Layout verified against
reference-written files (``/root/reference/tests/resources/
spherical_disk_dataset.zip``); reference reader counterpart:
``/root/reference/src/metatrain/utils/data/readers/metatensor.py``.

This gives existing metatrain users a direct path onto this framework:
their ``.mts`` target files and DiskDataset zips load as-is.
"""

from __future__ import annotations

import io
import zipfile
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ...containers import Labels, System, TensorBlock, TensorMap


# ---- Labels <-> structured npy ----------------------------------------------


def _labels_from_npy(buf: bytes) -> Labels:
    arr = np.load(io.BytesIO(buf))
    if arr.dtype.names is None:
        raise ValueError("labels member is not a structured array")
    names = list(arr.dtype.names)
    values = np.stack(
        [arr[n].astype(np.int32) for n in names], axis=1
    ) if len(arr) else np.zeros((0, len(names)), np.int32)
    return Labels(names, values)


def _labels_to_npy(labels: Labels) -> bytes:
    values = np.asarray(labels.values)
    dtype = np.dtype([(str(n), np.int32) for n in labels.names])
    arr = np.zeros(len(values), dtype=dtype)
    for j, n in enumerate(labels.names):
        arr[str(n)] = values[:, j].astype(np.int32)
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


# ---- TensorMap ---------------------------------------------------------------


def _read_block(zf: zipfile.ZipFile, prefix: str, members: set) -> TensorBlock:
    values = np.load(io.BytesIO(zf.read(f"{prefix}/values.npy")))
    samples = _labels_from_npy(zf.read(f"{prefix}/samples.npy"))
    components = []
    j = 0
    while f"{prefix}/components/{j}.npy" in members:
        components.append(
            _labels_from_npy(zf.read(f"{prefix}/components/{j}.npy"))
        )
        j += 1
    if f"{prefix}/properties.npy" in members:
        properties = _labels_from_npy(zf.read(f"{prefix}/properties.npy"))
    else:
        # gradient blocks share the parent's properties; caller patches
        properties = Labels.range("property", values.shape[-1])
    block = TensorBlock(
        values=np.asarray(values, dtype=np.float64),
        samples=samples,
        components=components,
        properties=properties,
    )
    grad_prefix = f"{prefix}/gradients/"
    grad_names = sorted(
        {
            m[len(grad_prefix):].split("/")[0]
            for m in members
            if m.startswith(grad_prefix)
        }
    )
    for name in grad_names:
        grad = _read_block(zf, f"{prefix}/gradients/{name}", members)
        grad.properties = block.properties
        block.add_gradient(name, grad)
    return block


def load_mts_bytes(data: bytes) -> TensorMap:
    """Parse a serialized metatensor TensorMap from bytes."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    members = set(zf.namelist())
    keys = _labels_from_npy(zf.read("keys.npy"))
    blocks = [
        _read_block(zf, f"blocks/{i}", members) for i in range(len(keys))
    ]
    return TensorMap(keys, blocks)


def load_mts(path: str) -> TensorMap:
    """Load a metatensor ``.mts`` file."""
    with open(path, "rb") as fd:
        return load_mts_bytes(fd.read())


def _write_block(
    zf: zipfile.ZipFile, prefix: str, block: TensorBlock, is_gradient: bool
) -> None:
    zf.writestr(
        f"{prefix}/values.npy",
        _npy_bytes(np.ascontiguousarray(block.values, dtype=np.float64)),
    )
    zf.writestr(f"{prefix}/samples.npy", _labels_to_npy(block.samples))
    for j, comp in enumerate(block.components):
        zf.writestr(f"{prefix}/components/{j}.npy", _labels_to_npy(comp))
    if not is_gradient:  # gradients share the parent's properties
        zf.writestr(f"{prefix}/properties.npy", _labels_to_npy(block.properties))
    for name, grad in block.gradients():
        _write_block(zf, f"{prefix}/gradients/{name}", grad, is_gradient=True)


def mts_bytes(tensor_map: TensorMap) -> bytes:
    """Serialize a TensorMap in the metatensor ``.mts`` zip format."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("keys.npy", _labels_to_npy(tensor_map.keys))
        for i, block in enumerate(tensor_map.blocks()):
            _write_block(zf, f"blocks/{i}", block, is_gradient=False)
    return buf.getvalue()


def save_mts(tensor_map: TensorMap, path: str) -> None:
    with open(path, "wb") as fd:
        fd.write(mts_bytes(tensor_map))


# ---- System (.mta) -----------------------------------------------------------


def load_mta_bytes(data: bytes) -> System:
    """Parse a serialized metatomic System from bytes."""
    zf = zipfile.ZipFile(io.BytesIO(data))

    def load(name):
        return np.load(io.BytesIO(zf.read(name)))

    return System(
        positions=np.asarray(load("positions.npy"), dtype=np.float64),
        types=np.asarray(load("types.npy"), dtype=np.int32),
        cell=np.asarray(load("cell.npy"), dtype=np.float64),
        pbc=np.asarray(load("pbc.npy"), dtype=bool),
    )


def mta_bytes(system: System) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(
            "positions.npy",
            _npy_bytes(np.asarray(system.positions, dtype=np.float64)),
        )
        zf.writestr(
            "cell.npy", _npy_bytes(np.asarray(system.cell, dtype=np.float64))
        )
        zf.writestr(
            "types.npy", _npy_bytes(np.asarray(system.types, dtype=np.int32))
        )
        zf.writestr("pbc.npy", _npy_bytes(np.asarray(system.pbc, dtype=bool)))
    return buf.getvalue()


# ---- per-system splitting (the reader contract) ------------------------------


def split_by_system(tensor_map: TensorMap) -> List[TensorMap]:
    """Split a joined TensorMap into one TensorMap per ``system`` sample
    value (reference ``mts.split`` on the system column,
    ``readers/metatensor.py:62-75``). System ids are renumbered to 0 in
    each split map (each map stands alone afterwards)."""
    system_ids: List[int] = sorted(
        {
            int(s)
            for block in tensor_map.blocks()
            for s in np.asarray(block.samples.column("system"))
        }
    )
    out: List[TensorMap] = []
    for sys_id in system_ids:
        blocks = []
        for block in tensor_map.blocks():
            samples = np.asarray(block.samples.values)
            col = list(block.samples.names).index("system")
            mask = samples[:, col] == sys_id
            sel = np.flatnonzero(mask)
            new_samples = samples[mask].copy()
            new_samples[:, col] = 0
            new_block = TensorBlock(
                values=np.asarray(block.values)[sel],
                samples=Labels(block.samples.names, new_samples),
                components=block.components,
                properties=block.properties,
            )
            for name, grad in block.gradients():
                g_samples = np.asarray(grad.samples.values)
                g_names = list(grad.samples.names)
                # gradient samples reference parent rows via 'sample';
                # rows whose parent row is in `sel` are kept, renumbered
                sample_col = g_names.index("sample")
                old_to_new = {int(o): n for n, o in enumerate(sel)}
                keep = [
                    r
                    for r, row in enumerate(g_samples)
                    if int(row[sample_col]) in old_to_new
                ]
                new_g_samples = g_samples[keep].copy()
                new_g_samples[:, sample_col] = [
                    old_to_new[int(g_samples[r][sample_col])] for r in keep
                ]
                if "system" in g_names:
                    new_g_samples[:, g_names.index("system")] = 0
                new_block.add_gradient(
                    name,
                    TensorBlock(
                        values=np.asarray(grad.values)[keep],
                        samples=Labels(grad.samples.names, new_g_samples),
                        components=grad.components,
                        properties=grad.properties,
                    ),
                )
            blocks.append(new_block)
        out.append(TensorMap(tensor_map.keys, blocks))
    return out


def read_mts_target(
    path: str, config: Dict[str, Any], n_systems: int, is_energy: bool
) -> Tuple[List[TensorMap], "TargetInfo"]:
    """Read a target from a metatensor ``.mts`` file (reference
    ``readers/metatensor.py:31-113``): one joined TensorMap on disk,
    split per system. Returns per-system TensorMaps + a TargetInfo
    built from the configured type spec."""
    from ..target_info import (
        get_energy_target_info,
        get_generic_target_info,
    )

    joined = load_mts(path)

    if is_energy:
        if len(joined) != 1:
            raise ValueError("energy TensorMaps should have exactly one block")
        block = joined.block(0)
        info = get_energy_target_info(
            config.get("unit") or "",
            add_position_gradients=block.has_gradient("positions"),
            add_strain_gradients=block.has_gradient("strain"),
        )
    else:
        per_atom = "atom" in joined.block(0).samples.names
        num_properties = int(np.asarray(joined.block(0).values).shape[-1])
        type_spec = config.get("type", "scalar")
        unit = config.get("unit") or ""
        quantity = config.get("quantity") or ""
        if type_spec == "scalar":
            info = get_generic_target_info(
                "scalar", num_properties, unit, quantity, per_atom
            )
        elif isinstance(type_spec, dict) and "cartesian" in type_spec:
            rank = int(type_spec["cartesian"].get("rank", 1))
            info = get_generic_target_info(
                "cartesian", num_properties, unit, quantity, per_atom,
                rank=rank,
            )
        elif isinstance(type_spec, dict) and "spherical" in type_spec:
            irreps = type_spec["spherical"]["irreps"]
            info = get_generic_target_info(
                "spherical", num_properties, unit, quantity, per_atom,
                irreps=irreps,
            )
        else:
            raise ValueError(f"unknown target type {type_spec!r}")
        _check_layout_compatible(joined, info.layout)

    maps = split_by_system(joined)
    if len(maps) != n_systems:
        raise ValueError(
            f"metatensor target file {path!r} holds {len(maps)} systems, "
            f"expected {n_systems}"
        )
    return maps, info


def _check_layout_compatible(tensor_map: TensorMap, layout: TensorMap) -> None:
    """Structural checks mirroring the reference's
    ``_check_tensor_map_metadata`` (keys/samples/components names;
    properties are allowed to differ)."""
    if list(tensor_map.keys.names) != list(layout.keys.names):
        raise ValueError(
            f"unexpected keys names in metatensor target: "
            f"expected {list(layout.keys.names)}, "
            f"got {list(tensor_map.keys.names)}"
        )
    layout_keys = {tuple(int(v) for v in row) for row in np.asarray(layout.keys.values)}
    for row in np.asarray(tensor_map.keys.values):
        if tuple(int(v) for v in row) not in layout_keys:
            raise ValueError(
                f"unexpected key {tuple(int(v) for v in row)} in metatensor "
                f"target (allowed: {sorted(layout_keys)})"
            )
    for (key, block), (_, lblock) in zip(tensor_map.items(), layout.items()):
        if list(block.samples.names) != list(lblock.samples.names):
            raise ValueError(
                f"unexpected sample names in metatensor target block {key}: "
                f"expected {list(lblock.samples.names)}, "
                f"got {list(block.samples.names)}"
            )
        if len(block.components) != len(lblock.components):
            raise ValueError(
                f"unexpected component count in metatensor target block "
                f"{key}: expected {len(lblock.components)}, "
                f"got {len(block.components)}"
            )
