"""Compile-smoke of the shipped LAMMPS fix-external client.

LAMMPS itself is not installed in CI, so the client is syntax-checked
against minimal stub headers that mirror the upstream public API shapes
(``examples/lammps/stub_include/``). This keeps the shipped C++ from
rotting (VERDICT r3 #8); building for real uses an actual LAMMPS tree
(see the client's header comment).
"""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CLIENT = REPO / "examples" / "lammps" / "fix_mtt_client.cpp"
STUBS = REPO / "examples" / "lammps" / "stub_include"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_client_syntax_checks_against_stub_headers():
    proc = subprocess.run(
        [
            "g++",
            "-std=c++17",
            "-fsyntax-only",
            "-Wall",
            "-Werror",
            f"-I{STUBS}",
            str(CLIENT),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
