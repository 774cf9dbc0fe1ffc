"""i-PI socket driver: serve force calls to an i-PI server.

The reference ecosystem serves exported models to MD engines (ASE,
LAMMPS, i-PI) through the metatomic engine interface (reference
``README.md``; SURVEY.md section 3.5). This module implements the
i-PI client-driver protocol natively, on top of
:class:`metatrain_tpu.calculator.Calculator` — so an exported ``.mtt``
drives an i-PI simulation directly:

    python -m metatrain_tpu drive model.mtt template.xyz --unix ipi_run

Protocol (i-PI drivers, also spoken by ASE's ``SocketIOCalculator``):
12-byte ASCII command headers; the server sends ``STATUS`` / ``INIT`` /
``POSDATA`` / ``GETFORCE`` / ``EXIT``; the driver answers ``READY`` /
``NEEDINIT`` / ``HAVEDATA`` / ``FORCEREADY`` plus binary payloads.
All quantities on the wire are atomic units (bohr, hartree); cell
matrices cross the wire transposed (lattice vectors as columns), the
ASE-compatible convention.

i-PI does not transmit atomic species: the driver takes them from a
template structure file with matching atom order.
"""

from __future__ import annotations

import logging
import socket
from typing import Optional, Sequence

import numpy as np

from .utils.logging import ROOT_LOGGER

logger = logging.getLogger(ROOT_LOGGER + ".ipi")

BOHR = 0.529177210903  # Angstrom
HARTREE = 27.211386245988  # eV

_HDRLEN = 12


def _sendall(conn: socket.socket, data: bytes) -> None:
    conn.sendall(data)


def _recvall(conn: socket.socket, nbytes: int) -> bytes:
    chunks = []
    remaining = nbytes
    while remaining:
        chunk = conn.recv(remaining)
        if not chunk:
            raise ConnectionError("i-PI server closed the connection")
        chunks.append(chunk)
        remaining -= len(chunk)
    return b"".join(chunks)


def _send_header(conn: socket.socket, msg: str) -> None:
    _sendall(conn, msg.ljust(_HDRLEN).encode("ascii"))


def _recv_header(conn: socket.socket) -> str:
    return _recvall(conn, _HDRLEN).decode("ascii").strip()


def _recv_array(conn: socket.socket, count: int, dtype) -> np.ndarray:
    itemsize = np.dtype(dtype).itemsize
    return np.frombuffer(_recvall(conn, count * itemsize), dtype=dtype).copy()


def connect(
    address: str = "localhost",
    port: int = 31415,
    unixsocket: Optional[str] = None,
    timeout: Optional[float] = None,
) -> socket.socket:
    """Connect to an i-PI server (INET ``address:port`` or a unix socket;
    a bare unix name maps to ``/tmp/ipi_<name>``, the i-PI convention)."""
    if unixsocket is not None:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        path = unixsocket
        if "/" not in path:
            path = f"/tmp/ipi_{path}"
        conn.settimeout(timeout)
        conn.connect(path)
    else:
        conn = socket.create_connection((address, port), timeout=timeout)
    return conn


def run_driver(
    calculator,
    types: Sequence[int],
    address: str = "localhost",
    port: int = 31415,
    unixsocket: Optional[str] = None,
    pbc: Optional[np.ndarray] = None,
    max_steps: Optional[int] = None,
    timeout: Optional[float] = None,
) -> int:
    """Drive an i-PI simulation: receive positions, return energy /
    forces / virial until the server sends ``EXIT``.

    :param calculator: a :class:`metatrain_tpu.calculator.Calculator`
        (or anything with its ``compute(system, forces, stress)``).
    :param types: atomic numbers in the server's atom order (from the
        template structure; i-PI does not transmit species).
    :param pbc: periodic flags; default: periodic iff the received cell
        is non-zero.
    :param max_steps: stop after N force evaluations (testing hook).
    :return: number of force evaluations served.
    """
    from .containers import System

    types = np.asarray(types, dtype=np.int32)
    conn = connect(address, port, unixsocket, timeout)
    logger.info(
        "connected to i-PI server (%s)",
        unixsocket or f"{address}:{port}",
    )

    initialized = False
    result = None
    n_evaluated = 0
    try:
        while True:
            header = _recv_header(conn)
            if header == "STATUS":
                if not initialized:
                    _send_header(conn, "NEEDINIT")
                elif result is not None:
                    _send_header(conn, "HAVEDATA")
                else:
                    _send_header(conn, "READY")
            elif header == "INIT":
                _recv_array(conn, 1, np.int32)  # bead index
                nbytes = int(_recv_array(conn, 1, np.int32)[0])
                if nbytes:
                    _recvall(conn, nbytes)
                initialized = True
            elif header == "POSDATA":
                cell_wire = _recv_array(conn, 9, np.float64).reshape(3, 3)
                _recv_array(conn, 9, np.float64)  # inverse cell (unused)
                natoms = int(_recv_array(conn, 1, np.int32)[0])
                if natoms != len(types):
                    raise ValueError(
                        f"i-PI server sent {natoms} atoms; the template "
                        f"has {len(types)}"
                    )
                positions = _recv_array(conn, 3 * natoms, np.float64).reshape(
                    natoms, 3
                )
                cell = cell_wire.T * BOHR  # columns -> rows, bohr -> A
                periodic = (
                    pbc
                    if pbc is not None
                    else np.full(3, bool(np.abs(cell).sum() > 0))
                )
                system = System(
                    positions=positions * BOHR,
                    types=types,
                    cell=cell,
                    pbc=np.asarray(periodic, dtype=bool),
                )
                stress = bool(np.asarray(periodic).any())
                result = calculator.compute(
                    system, forces=True, stress=stress
                )
                if not stress:
                    result["virial"] = np.zeros((3, 3))
                n_evaluated += 1
            elif header == "GETFORCE":
                if result is None:
                    raise RuntimeError("GETFORCE before POSDATA")
                _send_header(conn, "FORCEREADY")
                _sendall(
                    conn,
                    np.float64(result["energy"] / HARTREE).tobytes(),
                )
                _sendall(conn, np.int32(len(types)).tobytes())
                forces_au = result["forces"] / (HARTREE / BOHR)
                _sendall(conn, forces_au.astype(np.float64).tobytes())
                virial_au = np.asarray(result["virial"]) / HARTREE
                _sendall(conn, virial_au.T.astype(np.float64).tobytes())
                _sendall(conn, np.int32(0).tobytes())  # no extra string
                result = None
                if max_steps is not None and n_evaluated >= max_steps:
                    break
            elif header == "EXIT":
                logger.info("i-PI server sent EXIT after %d steps", n_evaluated)
                break
            else:
                raise ValueError(f"unknown i-PI header {header!r}")
    finally:
        conn.close()
    return n_evaluated
