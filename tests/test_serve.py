"""Socket force server (`mtt-tpu serve`): protocol round-trip, numerical
match vs the direct Calculator, error reporting, and multi-step reuse —
the tested contract behind the LAMMPS fix-external adapter
(``examples/lammps/``; reference LAMMPS coupling:
``/root/reference/README.md:15-27``)."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_crystal, make_molecule

from metatrain_tpu.calculator import Calculator
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.serve import ForceClient, run_server


@pytest.fixture(scope="module")
def trained_model():
    from metatrain_tpu.models.pet import PET, PETTrainer

    rng = np.random.default_rng(0)
    systems = []
    for i in range(6):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}},
    )
    types = sorted({int(t) for s in systems for t in s.types})
    info = DatasetInfo("angstrom", types, infos)
    model = PET(
        {
            "cutoff": 4.0, "d_pet": 16, "d_head": 16, "d_node": 24,
            "d_feedforward": 16, "num_heads": 2,
            "num_attention_layers": 1, "num_gnn_layers": 1,
        },
        info,
    )
    trainer = PETTrainer({"num_epochs": 1, "batch_size": 3})
    trainer.train(
        model, jnp.float32, [Dataset(systems, targets)],
        [Dataset(systems, targets)], "/tmp",
    )
    return model


@pytest.fixture()
def server(trained_model, tmp_path):
    calc = Calculator(trained_model)
    sock_path = str(tmp_path / "mtt.sock")
    ready = threading.Event()
    thread = threading.Thread(
        target=run_server,
        kwargs=dict(
            model_path=None,
            unix=sock_path,
            calculator=calc,
            ready_callback=lambda s: ready.set(),
        ),
        daemon=True,
    )
    thread.start()
    assert ready.wait(30)
    yield sock_path, calc
    thread.join(timeout=10)


def test_round_trip_matches_calculator(server):
    sock_path, calc = server
    system = make_molecule(6, seed=11, types=(1, 6, 8))
    client = ForceClient(unix=sock_path)
    try:
        out = client.compute(
            system.positions, system.types, system.cell, system.pbc
        )
        direct = calc.compute(system, forces=True, stress=True)
        assert out["energy"] == pytest.approx(
            float(direct["energy"]), rel=1e-6
        )
        np.testing.assert_allclose(
            out["forces"], direct["forces"], rtol=1e-5, atol=1e-6
        )
        # second step with (non-rigidly) moved positions: the
        # cached-batch fast path
        rng = np.random.default_rng(3)
        moved = system.positions + rng.normal(0, 0.05, system.positions.shape)
        out2 = client.compute(moved, system.types, system.cell, system.pbc)
        assert out2["energy"] != pytest.approx(out["energy"], rel=1e-4)
    finally:
        client.close()


def test_periodic_virial(trained_model, tmp_path):
    calc = Calculator(trained_model)
    sock_path = str(tmp_path / "mtt2.sock")
    ready = threading.Event()
    thread = threading.Thread(
        target=run_server,
        kwargs=dict(
            model_path=None, unix=sock_path, calculator=calc,
            ready_callback=lambda s: ready.set(),
        ),
        daemon=True,
    )
    thread.start()
    assert ready.wait(30)
    crystal = make_crystal(n_cells=2)
    # restrict to the model's known species
    crystal.types[:] = 6
    client = ForceClient(unix=sock_path)
    try:
        out = client.compute(
            crystal.positions, crystal.types, crystal.cell, crystal.pbc
        )
        direct = calc.compute(crystal, forces=True, stress=True)
        volume = float(abs(np.linalg.det(crystal.cell)))
        np.testing.assert_allclose(
            out["virial"],
            -np.asarray(direct["stress"]) * volume,
            rtol=1e-5,
            atol=1e-5,
        )
    finally:
        client.close()
    thread.join(timeout=10)


def test_bad_magic_reports_error(server):
    import socket as socket_mod
    import struct

    sock_path, _ = server
    s = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    s.connect(sock_path)
    s.sendall(b"XXXX" + struct.pack("<I", 1))
    status = struct.unpack("<I", s.recv(4))[0]
    assert status == 1
    ln = struct.unpack("<I", s.recv(4))[0]
    assert b"magic" in s.recv(ln)
    s.close()
