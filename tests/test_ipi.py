"""i-PI socket driver: protocol round-trip against a minimal in-process
i-PI server (the pattern ASE's SocketIOCalculator speaks too)."""

import socket
import threading

import jax
import numpy as np

from metatrain_tpu.calculator import Calculator
from metatrain_tpu.containers import System
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.ipi import BOHR, HARTREE, run_driver
from metatrain_tpu.models.pet import PET

from conftest import make_molecule

HDR = 12


def _send(conn, msg):
    conn.sendall(msg.ljust(HDR).encode())


def _recv(conn, n):
    data = b""
    while len(data) < n:
        chunk = conn.recv(n - len(data))
        assert chunk
        data += chunk
    return data


def _make_calculator():
    ds_info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    model = PET(
        {
            "cutoff": 4.0, "d_pet": 16, "d_head": 16, "d_node": 16,
            "d_feedforward": 16, "num_heads": 2,
            "num_attention_layers": 1, "num_gnn_layers": 1,
        },
        ds_info,
    )
    model.init_params(jax.random.PRNGKey(0))
    return Calculator(model)


def _serve(sock, system, n_steps, results):
    """Minimal i-PI server: INIT, then n_steps x (POSDATA + GETFORCE)."""
    conn, _ = sock.accept()
    try:
        # handshake: STATUS -> NEEDINIT -> INIT -> STATUS -> READY
        _send(conn, "STATUS")
        assert _recv(conn, HDR).strip() == b"NEEDINIT"
        _send(conn, "INIT")
        conn.sendall(np.int32(0).tobytes())
        conn.sendall(np.int32(0).tobytes())
        for step in range(n_steps):
            _send(conn, "STATUS")
            assert _recv(conn, HDR).strip() == b"READY"
            _send(conn, "POSDATA")
            cell_wire = (system.cell / BOHR).T  # rows -> columns, A -> bohr
            conn.sendall(cell_wire.astype(np.float64).tobytes())
            conn.sendall(np.zeros((3, 3)).tobytes())  # inverse (unused)
            conn.sendall(np.int32(len(system)).tobytes())
            positions = system.positions + 0.01 * step
            conn.sendall((positions / BOHR).astype(np.float64).tobytes())
            _send(conn, "STATUS")
            assert _recv(conn, HDR).strip() == b"HAVEDATA"
            _send(conn, "GETFORCE")
            assert _recv(conn, HDR).strip() == b"FORCEREADY"
            energy = np.frombuffer(_recv(conn, 8), np.float64)[0]
            natoms = np.frombuffer(_recv(conn, 4), np.int32)[0]
            forces = np.frombuffer(
                _recv(conn, 8 * 3 * natoms), np.float64
            ).reshape(natoms, 3)
            virial = np.frombuffer(_recv(conn, 72), np.float64).reshape(3, 3)
            extra = np.frombuffer(_recv(conn, 4), np.int32)[0]
            assert extra == 0
            results.append((energy, forces.copy(), virial.copy(), positions))
        _send(conn, "EXIT")
    finally:
        conn.close()


def test_ipi_driver_round_trip(tmp_path):
    system = make_molecule(6, seed=3)
    calc = _make_calculator()

    path = str(tmp_path / "ipi_sock")
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.bind(path)
    sock.listen(1)
    results = []
    server = threading.Thread(
        target=_serve, args=(sock, system, 2, results), daemon=True
    )
    server.start()

    n = run_driver(calc, system.types, unixsocket=path, timeout=60)
    server.join(timeout=60)
    sock.close()
    assert n == 2
    assert len(results) == 2

    # parity with a direct calculator call, through the unit conversions
    for energy_au, forces_au, _, positions in results:
        ref = calc.compute(
            System(positions, system.types, system.cell, system.pbc),
            forces=True,
        )
        np.testing.assert_allclose(
            energy_au * HARTREE, ref["energy"], rtol=1e-6
        )
        np.testing.assert_allclose(
            forces_au * (HARTREE / BOHR), ref["forces"], rtol=1e-5, atol=1e-8
        )
