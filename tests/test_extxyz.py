import io

import numpy as np

from metatrain_tpu.data.readers.extxyz import (
    iread_xyz,
    read_xyz,
    write_xyz,
)

from conftest import make_crystal, make_molecule

SAMPLE = """3
Lattice="5.0 0.0 0.0 0.0 5.0 0.0 0.0 0.0 5.0" Properties=species:S:1:pos:R:3:forces:R:3 energy=-12.5 stress="1 0 0 0 1 0 0 0 1" pbc="T T T"
O 0.0 0.0 0.0 0.1 0.0 0.0
H 0.96 0.0 0.0 -0.1 0.2 0.0
H -0.24 0.93 0.0 0.0 -0.2 0.3
2
Properties=species:S:1:pos:R:3 energy=3.25 charge=1
C 0.0 0.0 0.0
C 1.4 0.0 0.0
"""


def test_read_extxyz_frames():
    frames = list(iread_xyz(io.StringIO(SAMPLE)))
    assert len(frames) == 2

    water = frames[0]
    assert len(water) == 3
    np.testing.assert_array_equal(water.types, [8, 1, 1])
    np.testing.assert_allclose(water.cell, np.eye(3) * 5.0)
    assert water.pbc.all()
    assert water.extra["energy"] == -12.5
    np.testing.assert_allclose(
        water.extra["forces"][1], [-0.1, 0.2, 0.0]
    )
    np.testing.assert_allclose(
        water.extra["stress"].reshape(3, 3), np.eye(3)
    )

    dimer = frames[1]
    assert len(dimer) == 2
    assert not dimer.pbc.any()
    assert dimer.extra["energy"] == 3.25
    assert dimer.extra["charge"] == 1.0


def test_write_read_roundtrip(tmp_path):
    systems = [make_molecule(5, seed=1), make_crystal(n_cells=1)]
    forces = [np.random.default_rng(2).normal(size=(len(s), 3)) for s in systems]
    energies = [{"energy": -1.5}, {"energy": -400.0}]
    path = str(tmp_path / "out.xyz")
    write_xyz(
        path,
        systems,
        per_atom_arrays=[{"forces": f} for f in forces],
        info=energies,
    )
    back = read_xyz(path)
    assert len(back) == 2
    for orig, rt, f, e in zip(systems, back, forces, energies):
        np.testing.assert_allclose(rt.positions, orig.positions, atol=1e-9)
        np.testing.assert_array_equal(rt.types, orig.types)
        np.testing.assert_allclose(rt.cell, orig.cell, atol=1e-9)
        np.testing.assert_array_equal(rt.pbc, orig.pbc)
        np.testing.assert_allclose(rt.extra["forces"], f, atol=1e-9)
        assert rt.extra["energy"] == e["energy"]
