"""End-to-end example: generate a toy dataset, train SOAP-BPNN with
forces, export, evaluate, and serve MD force calls.

Run from the repository root:

    python examples/train_from_scratch.py

(Mirrors the reference's beginner example
``examples/0-beginner/03-train_from_scratch.py``.)
"""

import os
import tempfile

import numpy as np


def lennard_jones(system, epsilon=0.3, sigma=1.8, cutoff=6.0):
    """Toy ground truth: LJ energy + analytic forces."""
    from metatrain_tpu.ops.neighbors import neighbor_pairs

    c, n, s = neighbor_pairs(
        system.positions, system.cell, system.pbc, cutoff, full_list=True
    )
    r_vec = system.positions[n] - system.positions[c] + s @ system.cell
    r = np.linalg.norm(r_vec, axis=1)
    x6 = (sigma / r) ** 6
    energy = float(0.5 * (4 * epsilon * (x6**2 - x6)).sum())
    de_dr = 4 * epsilon * (-12 * x6**2 + 6 * x6) / r
    forces = np.zeros_like(system.positions)
    np.add.at(forces, c, 0.5 * de_dr[:, None] * r_vec / r[:, None])
    np.add.at(forces, n, -0.5 * de_dr[:, None] * r_vec / r[:, None])
    return energy, forces


def main():
    from metatrain_tpu.calculator import Calculator
    from metatrain_tpu.cli.eval import eval_model
    from metatrain_tpu.cli.train import train_model
    from metatrain_tpu.containers import System
    from metatrain_tpu.data.readers.extxyz import write_xyz

    workdir = tempfile.mkdtemp(prefix="mtt_example_")
    os.chdir(workdir)
    print(f"working in {workdir}")

    # ---- 1. generate a toy dataset --------------------------------------
    rng = np.random.default_rng(0)

    def sample_positions(n, min_dist=1.7):
        # rejection sampling keeps atoms off the repulsive LJ wall
        positions = []
        while len(positions) < n:
            candidate = rng.uniform(-3.5, 3.5, size=3)
            if all(
                np.linalg.norm(candidate - p) >= min_dist for p in positions
            ):
                positions.append(candidate)
        return np.asarray(positions)

    systems, infos, arrays = [], [], []
    for i in range(40):
        n = 6 + int(rng.integers(0, 3))
        system = System(
            positions=sample_positions(n),
            types=np.full(n, 6, dtype=np.int32),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        energy, forces = lennard_jones(system)
        systems.append(system)
        infos.append({"energy": energy})
        arrays.append({"forces": forces})
    write_xyz("dataset.xyz", systems, per_atom_arrays=arrays, info=infos)

    # ---- 2. train -------------------------------------------------------
    options = {
        "seed": 0,
        "architecture": {
            "name": "soap_bpnn",
            "model": {
                "soap": {
                    "max_angular": 3,
                    "max_radial": 4,
                    "cutoff": {"radius": 4.5},
                },
                "bpnn": {"num_hidden_layers": 2, "num_neurons_per_layer": 32},
            },
            "training": {
                "num_epochs": 30,
                "batch_size": 8,
                "learning_rate": 3e-3,
                "loss": {
                    "energy": {
                        "type": "mse",
                        "weight": 1.0,
                        "gradients": {"positions": {"weight": 10.0}},
                    }
                },
            },
        },
        "training_set": {
            "systems": {"read_from": "dataset.xyz", "length_unit": "angstrom"},
            "targets": {
                "energy": {"key": "energy", "unit": "eV", "forces": "on"}
            },
        },
        "validation_set": 0.2,
    }
    train_model(options, output_dir=".", checkpoint_dir="run")

    # ---- 3. evaluate the exported model --------------------------------
    metrics = eval_model(
        "model.mtt",
        {
            "systems": "dataset.xyz",
            "targets": {"energy": {"key": "energy", "forces": "on"}},
        },
        output_path="predictions.xyz",
    )
    print({k: round(v, 5) for k, v in metrics.items()})

    # ---- 4. serve MD force calls ---------------------------------------
    calc = Calculator("model.mtt")
    out = calc.compute(systems[0], forces=True)
    _, ref_forces = lennard_jones(systems[0])
    print("energy:", out["energy"])
    print(
        "force MAE vs ground truth:",
        float(np.abs(out["forces"] - ref_forces).mean()),
    )


if __name__ == "__main__":
    main()
