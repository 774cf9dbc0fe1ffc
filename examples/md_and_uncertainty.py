"""Serving example: device-resident MD with a PET potential, plus LLPR
uncertainty on the trajectory frames.

Run from the repository root (CPU-safe; faster on TPU):

    python examples/md_and_uncertainty.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from metatrain_tpu.calculator import Calculator
    from metatrain_tpu.containers import System
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.models.pet import PET

    # -- a small PET potential (pretend it is trained) --------------------
    info = DatasetInfo(
        "angstrom",
        [29],
        {
            "energy": get_energy_target_info(
                "eV", add_position_gradients=True, add_strain_gradients=True
            )
        },
    )
    model = PET(
        {
            "cutoff": 4.5,
            "d_pet": 32,
            "d_head": 32,
            "d_node": 48,
            "d_feedforward": 32,
            "num_heads": 4,
            "num_attention_layers": 1,
            "num_gnn_layers": 1,
        },
        info,
    )
    model.init_params(jax.random.PRNGKey(0))

    # -- a copper slab -----------------------------------------------------
    a = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    rng = np.random.default_rng(0)
    reps = 3
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(reps)
            for j in range(reps)
            for k in range(reps)
        ]
    )
    cell = np.eye(3) * a * reps
    positions = frac / reps @ cell + rng.normal(0, 0.03, size=(len(frac), 3))
    system = System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )

    # -- single force call (energy, forces, stress) -----------------------
    calc = Calculator(model, skin=0.4)
    out = calc.compute(system, forces=True, stress=True)
    print(
        f"E = {out['energy']:.4f} eV, "
        f"max |F| = {np.abs(out['forces']).max():.3f} eV/A, "
        f"P = {np.trace(out['stress']) / 3:.4e} eV/A^3"
    )

    # -- device-resident NVE MD -------------------------------------------
    masses = np.full(len(system), 63.546)
    final = calc.run_md_nve(system, masses, timestep=0.5, n_steps=20)
    drift = np.linalg.norm(final.positions - system.positions, axis=1)
    print(f"20 NVE steps: mean displacement {drift.mean():.4f} A")

    # -- LLPR uncertainty --------------------------------------------------
    from metatrain_tpu.data.dataset import Dataset
    from metatrain_tpu.models.llpr import LLPRUncertaintyModel

    # a small set of rattled frames; "reference" energies = model + noise
    # (so the calibrated uncertainty is meaningful: residuals ~ noise)
    from metatrain_tpu.containers import Labels, TensorBlock, TensorMap

    frames, energies = [], []
    e_calc = Calculator(model)  # one compiled energy call for all frames
    for i in range(24):
        s = System(
            positions=positions + rng.normal(0, 0.05, positions.shape),
            types=system.types,
            cell=cell,
            pbc=system.pbc,
        )
        frames.append(s)
        e_model = e_calc.compute(s, forces=False)["energy"]
        energies.append(
            TensorMap(
                Labels.single(),
                [
                    TensorBlock(
                        values=np.array([[e_model + rng.normal(0, 0.1)]]),
                        samples=Labels.range("system", 1),
                        components=(),
                        properties=Labels.range("energy", 1),
                    )
                ],
            )
        )
    train = Dataset(frames, {"energy": energies})

    llpr = LLPRUncertaintyModel({}, wrapped=model)
    llpr.init_params(None)
    llpr.compute_covariance([train])
    llpr.compute_inverse_covariance()
    llpr.calibrate(train, method="ratio")

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    nbr = compute_neighbor_data(final, cutoff=model.cutoff)
    batch = batch_from_systems([final], [nbr])
    preds = llpr.forward(
        llpr.params, batch, ["energy", "mtt::aux::energy_uncertainty"]
    )
    sigma2 = float(
        np.asarray(preds["mtt::aux::energy_uncertainty"].block().values)[0, 0]
    )
    print(
        f"calibrated energy uncertainty on the final frame: "
        f"{np.sqrt(sigma2):.3f} eV (injected target noise: 0.1 eV)"
    )


if __name__ == "__main__":
    main()
