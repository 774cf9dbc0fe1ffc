"""Native (C++) runtime components, loaded through ctypes.

Build happens lazily on first use (g++ available in the deployment
image); every native entry point has a pure-Python fallback so the
framework functions without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


logger = logging.getLogger("metatrain_tpu.native")

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_library() -> Optional[Path]:
    source = _HERE / "neighbors.cpp"
    lib_path = _HERE / "libneighbors.so"
    if lib_path.exists() and lib_path.stat().st_mtime >= source.stat().st_mtime:
        return lib_path
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                str(source),
                "-o",
                str(lib_path),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return lib_path
    except (subprocess.SubprocessError, FileNotFoundError) as err:
        logger.warning("native neighbor library build failed: %s", err)
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    lib_path = _build_library()
    if lib_path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(str(lib_path))
    lib.neighbor_pairs_cell_list.restype = ctypes.c_longlong
    lib.neighbor_pairs_cell_list.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_double,
        ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.pairs_to_nef_scatter.restype = ctypes.c_longlong
    lib.pairs_to_nef_scatter.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_longlong,
        ctypes.c_longlong,
        ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.color_edges.restype = ctypes.c_longlong
    lib.color_edges.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_longlong,
        ctypes.c_longlong,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    if hasattr(lib, "color_edges_grouped"):
        lib.color_edges_grouped.restype = ctypes.c_longlong
        lib.color_edges_grouped.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
    _LIB = lib
    return _LIB


def native_neighbor_pairs(
    positions: np.ndarray,
    cell: np.ndarray,
    pbc: np.ndarray,
    cutoff: float,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Full pair list from the C++ cell-list builder, or None if the
    native library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    pbc = np.ascontiguousarray(np.asarray(pbc), dtype=np.uint8)
    n = len(positions)
    capacity = max(256, n * 128)
    for _ in range(6):  # grow on overflow
        centers = np.empty(capacity, dtype=np.int32)
        neighbors = np.empty(capacity, dtype=np.int32)
        shifts = np.empty(3 * capacity, dtype=np.int32)
        count = lib.neighbor_pairs_cell_list(
            positions, n, cell, pbc, float(cutoff), capacity,
            centers, neighbors, shifts,
        )
        if count == -2:
            raise ValueError("degenerate cell for periodic neighbor search")
        if count >= 0:
            return (
                centers[:count].astype(np.int64),
                neighbors[:count].astype(np.int64),
                shifts[: 3 * count].reshape(-1, 3).astype(np.int64),
            )
        capacity *= 4
    raise RuntimeError("neighbor pair capacity growth failed")


def native_color_edges(
    centers: np.ndarray,
    neighbors: np.ndarray,
    n_atoms: int,
    num_colors: int,
) -> Optional[Tuple[np.ndarray, int]]:
    """Proper edge coloring of an undirected half list (C++ greedy +
    Kempe-chain repair). Returns ``(colors, n_overflow)`` where
    ``colors[e] in [0, num_colors)`` or ``-1`` for overflow edges, or
    ``None`` when the native library (or a <=64-color budget) is
    unavailable. Used by the colored-slot NEF layout
    (``ops/neighbors.py``) that makes the reversed-edge permutation
    slot-preserving."""
    if num_colors < 1 or num_colors > 64:
        return None
    lib = get_library()
    if lib is None or not hasattr(lib, "color_edges"):
        return None
    centers = np.ascontiguousarray(centers, dtype=np.int32)
    neighbors = np.ascontiguousarray(neighbors, dtype=np.int32)
    colors = np.empty(len(centers), dtype=np.int32)
    overflow = lib.color_edges(
        centers, neighbors, len(centers), int(n_atoms), int(num_colors), colors
    )
    if overflow < 0:
        return None
    return colors, int(overflow)


def native_color_edges_grouped(
    centers: np.ndarray,
    neighbors: np.ndarray,
    n_atoms: int,
    group_base: np.ndarray,
    group_cap: np.ndarray,
    group_delta: np.ndarray,
    group_width: np.ndarray,
    group_pair: np.ndarray,
    m_max: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Grouped sigma-paired slot assignment (C++ greedy + bipartite
    Kempe chains) for the grouped-window colored layout. Returns
    ``(slot_fwd, slot_rev, n_unassigned)`` -- the c->n / n->c NEF slots
    per half-list edge, -1 for edges the caller must first-free-place
    (kernel fixup rows) -- or None when the native library is
    unavailable or the spec is invalid."""
    lib = get_library()
    if lib is None or not hasattr(lib, "color_edges_grouped"):
        return None
    centers = np.ascontiguousarray(centers, dtype=np.int32)
    neighbors = np.ascontiguousarray(neighbors, dtype=np.int32)
    gb = np.ascontiguousarray(group_base, dtype=np.int32)
    gc = np.ascontiguousarray(group_cap, dtype=np.int32)
    gd = np.ascontiguousarray(group_delta, dtype=np.int32)
    gw = np.ascontiguousarray(group_width, dtype=np.int32)
    gp = np.ascontiguousarray(group_pair, dtype=np.int32)
    out_fwd = np.empty(len(centers), dtype=np.int32)
    out_rev = np.empty(len(centers), dtype=np.int32)
    n_un = lib.color_edges_grouped(
        centers, neighbors, len(centers), int(n_atoms),
        gb, gc, gd, gw, gp, len(gb), int(m_max), out_fwd, out_rev,
    )
    if n_un < 0:
        return None
    return out_fwd, out_rev, int(n_un)


def native_pairs_to_nef(
    centers: np.ndarray,
    neighbors: np.ndarray,
    shifts: np.ndarray,
    reverse_of: np.ndarray,
    n_atoms: int,
    m_max: int,
    slots: Optional[np.ndarray] = None,
):
    """NEF scatter in C++ (the hot half of ``ops/neighbors.pairs_to_nef``):
    returns ``(indices, shifts, mask, reverse)`` padded arrays, or None
    when the native library is unavailable. Raises on slot overflow or a
    colliding explicit slot assignment (mirrors the numpy path)."""
    lib = get_library()
    if lib is None or not hasattr(lib, "pairs_to_nef_scatter"):
        return None
    E = len(centers)
    centers = np.ascontiguousarray(centers, dtype=np.int32)
    neighbors = np.ascontiguousarray(neighbors, dtype=np.int32)
    shifts = np.ascontiguousarray(shifts, dtype=np.int32).reshape(E, 3)
    reverse_of = np.ascontiguousarray(reverse_of, dtype=np.int64)
    has_slots = slots is not None
    if has_slots:
        slots_arr = np.ascontiguousarray(slots, dtype=np.int64)
        if len(slots_arr) != E:
            raise ValueError("slots must align with the pair list")
    else:
        slots_arr = np.zeros(1, dtype=np.int64)
    A, M = int(n_atoms), int(m_max)
    indices = np.empty((A, M), dtype=np.int32)
    shift_out = np.empty((A, M, 3), dtype=np.int32)
    mask = np.empty((A, M), dtype=np.uint8)
    reverse = np.empty((A, M), dtype=np.int32)
    rc = lib.pairs_to_nef_scatter(
        centers, neighbors, shifts.reshape(-1), reverse_of, slots_arr,
        int(has_slots), E, A, M, indices, shift_out.reshape(-1),
        mask.reshape(-1), reverse,
    )
    if rc == -1:
        raise ValueError(f"max_neighbors={M} too small for the pair list")
    if rc == -3:
        raise ValueError("colliding explicit slot assignment")
    if rc != 0:
        return None
    return indices, shift_out, mask.astype(bool), reverse
