"""Socket force server: LAMMPS (and any MD engine) coupling.

The reference couples LAMMPS through metatomic's C++ ``pair_style
metatomic`` plugin consuming the TorchScript artifact
(``/root/reference/README.md:15-27``). The TPU-native equivalent keeps
the model in a persistent JAX process (compiled executables, cached
device batches, Verlet-skin reuse -- the Calculator fast path) and
serves force calls over a socket with a minimal length-free binary
protocol; the MD engine side is a thin client. For LAMMPS that client is
a ~100-line ``fix external`` adapter (``examples/lammps/``) the user
compiles against their LAMMPS build -- the protocol below is the tested,
stable contract.

Wire protocol (little-endian, one request per MD step):

  client -> server:
      magic   4 bytes  b"MTTC"
      natoms  uint32
      cell    9 float64   (row-major cell matrix, Angstrom)
      pbc     3 uint8
      types   natoms int32   (atomic numbers)
      pos     natoms*3 float64 (Angstrom)
  server -> client:
      status  uint32      (0 = ok; 1 = error, followed by uint32 length
                           + utf-8 message, connection closes)
      energy  float64     (eV)
      virial  9 float64   (eV; -dE/dstrain, row-major)
      forces  natoms*3 float64 (eV/Angstrom)

Types may change between requests (grand-canonical setups); the
Calculator rebuckets automatically. One client at a time (MD is
sequential); the server exits when the client disconnects unless
``--persist`` keeps listening for the next one.
"""

from __future__ import annotations

import logging
import socket
import struct
from typing import Optional

import numpy as np

logger = logging.getLogger("metatrain_tpu")

MAGIC = b"MTTC"


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client disconnected")
        buf += chunk
    return buf


def _serve_connection(conn: socket.socket, calculator) -> int:
    """Handle one client session; returns the number of served steps."""
    from .containers import System

    steps = 0
    while True:
        try:
            header = _recv_exact(conn, 8)
        except ConnectionError:
            return steps
        if header[:4] != MAGIC:
            conn.sendall(struct.pack("<I", 1))
            msg = b"bad magic (expected MTTC)"
            conn.sendall(struct.pack("<I", len(msg)) + msg)
            return steps
        (natoms,) = struct.unpack("<I", header[4:])
        body = _recv_exact(conn, 9 * 8 + 3 + natoms * 4 + natoms * 24)
        cell = np.frombuffer(body[:72], "<f8").reshape(3, 3)
        pbc = np.frombuffer(body[72:75], np.uint8).astype(bool)
        off = 75
        types = np.frombuffer(body[off : off + 4 * natoms], "<i4")
        off += 4 * natoms
        positions = np.frombuffer(
            body[off : off + 24 * natoms], "<f8"
        ).reshape(natoms, 3)

        try:
            system = System(
                positions=positions.copy(),
                types=types.astype(np.int32),
                cell=cell.copy(),
                pbc=pbc,
            )
            out = calculator.compute(system, forces=True, stress=True)
            volume = float(abs(np.linalg.det(cell))) or 1.0
            # calculator stress is dE/dstrain / volume; LAMMPS-side
            # fix external wants the virial W = -dE/dstrain
            virial = -np.asarray(out["stress"], np.float64) * volume
        except Exception as err:  # noqa: BLE001 - report to the client
            logger.exception("force call failed")
            conn.sendall(struct.pack("<I", 1))
            msg = str(err).encode()[:4096]
            conn.sendall(struct.pack("<I", len(msg)) + msg)
            return steps

        payload = (
            struct.pack("<I", 0)
            + struct.pack("<d", float(out["energy"]))
            + np.asarray(virial, "<f8").tobytes()
            + np.asarray(out["forces"], "<f8").tobytes()
        )
        conn.sendall(payload)
        steps += 1


def run_server(
    model_path: str,
    unix: Optional[str] = None,
    host: str = "127.0.0.1",
    port: int = 31415,
    persist: bool = False,
    calculator=None,
    ready_callback=None,
) -> None:
    """Serve force calls for ``model_path`` (.mtt/.ckpt) on a socket."""
    if calculator is None:
        from .calculator import Calculator

        calculator = Calculator(model_path)

    if unix:
        server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        server.bind(unix)
        where = unix
    else:
        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        server.bind((host, port))
        where = f"{host}:{server.getsockname()[1]}"
    server.listen(1)
    logger.info("mtt-tpu serve: listening on %s", where)
    if ready_callback is not None:
        ready_callback(server)
    try:
        while True:
            conn, _ = server.accept()
            with conn:
                steps = _serve_connection(conn, calculator)
                logger.info("client session done: %d force calls", steps)
            if not persist:
                break
    finally:
        server.close()
        if unix:
            import os

            try:
                os.unlink(unix)
            except OSError:
                pass


class ForceClient:
    """Reference client implementation of the serve protocol (used by the
    tests and usable from any python MD loop; the LAMMPS C++ adapter in
    ``examples/lammps/`` mirrors it byte for byte)."""

    def __init__(self, unix=None, host="127.0.0.1", port=31415):
        if unix:
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.connect(unix)
        else:
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.sock.connect((host, port))

    def compute(self, positions, types, cell, pbc):
        positions = np.ascontiguousarray(positions, "<f8")
        natoms = len(positions)
        msg = (
            MAGIC
            + struct.pack("<I", natoms)
            + np.ascontiguousarray(cell, "<f8").tobytes()
            + np.ascontiguousarray(pbc, np.uint8).tobytes()
            + np.ascontiguousarray(types, "<i4").tobytes()
            + positions.tobytes()
        )
        self.sock.sendall(msg)
        (status,) = struct.unpack("<I", _recv_exact(self.sock, 4))
        if status != 0:
            (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
            raise RuntimeError(_recv_exact(self.sock, ln).decode())
        body = _recv_exact(self.sock, 8 + 72 + 24 * natoms)
        energy = struct.unpack("<d", body[:8])[0]
        virial = np.frombuffer(body[8:80], "<f8").reshape(3, 3)
        forces = np.frombuffer(body[80:], "<f8").reshape(natoms, 3)
        return {"energy": energy, "virial": virial, "forces": forces}

    def close(self):
        self.sock.close()
