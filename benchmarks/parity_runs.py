"""Trained-accuracy parity runs (PARITY.md).

Reproduces the reference's own beginner-example training protocol
(``/root/reference/examples/0-beginner/options-scratch.yaml``: PET,
ethanol_reduced_100.xyz, cutoff 4.5, batch 10, 80/10/10 split) through
THIS framework's CLI end-to-end, evals on the test split, and prints the
MAE table that PARITY.md records. Also trains SOAP-BPNN on the
qm9_reduced_100.xyz fixture (reference ``tests/resources/options.yaml``
hypers).

Runs on CPU by default (set MTT_PARITY_DEVICE=tpu to use the chip).
"""

import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def run_case(name, options_yaml, data_files, epochs_tag):
    tmp = Path(tempfile.mkdtemp(prefix=f"parity_{name}_"))
    (tmp / "options.yaml").write_text(options_yaml)
    for f in data_files:
        (tmp / Path(f).name).write_bytes(Path(f).read_bytes())
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    if os.environ.get("MTT_PARITY_DEVICE", "cpu") == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # the axon sitecustomize pins the TPU platform; neutralize for
        # subprocesses via jax config through a sitecustomize shim
        shim = tmp / "sitedir"
        shim.mkdir()
        (shim / "usercustomize.py").write_text(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
        )
        env["PYTHONPATH"] = f"{shim}:{REPO}"
    proc = subprocess.run(
        [sys.executable, "-m", "metatrain_tpu", "train", "options.yaml"],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    log = proc.stdout + proc.stderr
    if proc.returncode != 0:
        print(log[-4000:])
        raise SystemExit(f"{name}: training failed")
    # the final test-set eval is logged by cli/train.py in the reference
    # format: "energy RMSE (per atom): ... MAE (per atom): ..."
    maes = {}
    for m in re.finditer(
        r"(\w[\w:]*) RMSE(?: \(per atom\))?: ([\d.eE+-]+) (\S+) \| "
        r"\1 MAE(?: \(per atom\))?: ([\d.eE+-]+) (\S+)",
        log,
    ):
        maes[m.group(1)] = {
            "rmse": float(m.group(2)),
            "mae": float(m.group(4)),
            "unit": m.group(5),
        }
    print(f"== {name} ({epochs_tag}) dir={tmp}")
    tail = [
        ln for ln in log.splitlines() if "MAE" in ln or "RMSE" in ln
    ]
    for ln in tail[-6:]:
        print("  ", ln.strip())
    print(json.dumps({name: maes}))
    return maes


PET_OPTIONS = """\
seed: 42
architecture:
  name: pet
  model:
    cutoff: 4.5
  training:
    num_epochs: {epochs}
    batch_size: 10
training_set:
  systems:
    read_from: ./ethanol_reduced_100.xyz
    length_unit: angstrom
  targets:
    energy:
      key: energy
      unit: eV
      forces: on
test_set: 0.1
validation_set: 0.1
"""

CARBON_OPTIONS = """\
seed: 42
architecture:
  name: pet
  model:
    cutoff: 4.5
  training:
    num_epochs: {epochs}
    batch_size: 10
training_set:
  systems:
    read_from: ./carbon_reduced_100.xyz
    length_unit: angstrom
  targets:
    energy:
      key: energy
      unit: eV
      forces:
        key: force
      virial: on
test_set: 0.1
validation_set: 0.1
"""

SOAP_OPTIONS = """\
seed: 42
architecture:
  name: soap_bpnn
  model:
    soap:
      max_radial: 4
      max_angular: 2
  training:
    num_epochs: {epochs}
    batch_size: 5
training_set:
  systems:
    read_from: ./qm9_reduced_100.xyz
    length_unit: angstrom
  targets:
    energy:
      key: U0
      unit: eV
test_set: 0.5
validation_set: 0.1
"""


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    eth = REF / "tests/resources/ethanol_reduced_100.xyz"
    qm9 = REF / "tests/resources/qm9_reduced_100.xyz"
    if which in ("all", "pet10"):
        run_case(
            "pet_ethanol_10ep",
            PET_OPTIONS.format(epochs=10),
            [eth],
            "reference tutorial protocol, 10 epochs",
        )
    if which in ("all", "pet200"):
        run_case(
            "pet_ethanol_200ep",
            PET_OPTIONS.format(epochs=200),
            [eth],
            "same protocol, 200 epochs",
        )
    if which in ("all", "carbon"):
        # periodic system with energy + forces + VIRIAL targets (the
        # north-star parity condition names virial MAE; the reference's
        # carbon fixture carries per-frame CASTEP virials)
        run_case(
            "pet_carbon_virial_100ep",
            CARBON_OPTIONS.format(epochs=100),
            [REF / "tests/resources/carbon_reduced_100.xyz"],
            "periodic carbon, energy+forces+virial, 100 epochs",
        )
    if which in ("all", "soap"):
        run_case(
            "soap_bpnn_qm9_100ep",
            SOAP_OPTIONS.format(epochs=100),
            [qm9],
            "reference fixture hypers, 100 epochs",
        )


if __name__ == "__main__":
    main()
