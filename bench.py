"""Benchmark: PET force-call throughput on a 10k-atom periodic system.

The driver's north-star metric (BASELINE.json): PET force calls
(energy + forces via autograd) on a ~10k-atom periodic system,
atom-steps/sec per chip. Methodology mirrors the reference's eval timing
harness (``cli/eval.py:219-310``): warm-up before timing, device sync
around the timed region, per-atom normalization.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the driver's ≥5x-vs-A100-torch target
expressed as an absolute per-chip throughput floor (see TARGET below).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax

    # persistent compile cache: first run pays the (remote) XLA compile,
    # subsequent bench invocations load it in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from metatrain_tpu.containers import System, batch_from_systems, bucket_size
    from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.models.pet import PET
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    # ---- build a ~10k-atom FCC crystal (periodic) ---------------------------
    n_cells = 14  # 14^3 * 4 = 10976 atoms
    a = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    rng = np.random.default_rng(0)
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(n_cells)
            for j in range(n_cells)
            for k in range(n_cells)
        ]
    )
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(0, 0.05, size=(len(frac), 3))
    system = System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )
    n_atoms = len(system)

    # ---- model: production PET defaults ------------------------------------
    dataset_info = DatasetInfo(
        length_unit="angstrom",
        atomic_types=[29],
        targets={
            "energy": get_energy_target_info("eV", add_position_gradients=True)
        },
    )
    model = PET({}, dataset_info)  # default hypers: cutoff 4.5, d_pet 128, ...
    params = model.init_params(jax.random.PRNGKey(0))

    # ---- neighbor list (host, once — MD-style Verlet reuse) ------------------
    nbr = compute_neighbor_data(system, cutoff=model.cutoff)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=bucket_size(n_atoms, 1.05),
        n_systems_padded=2,
        max_neighbors=nbr.max_neighbors,
        dtype=jnp.float32,
    )

    target_infos = {"energy": dataset_info.targets["energy"]}

    def one_force_call(params, positions):
        preds = evaluate_model(
            model.forward,
            params,
            batch.replace(positions=positions),
            target_infos,
            is_training=False,
        )
        block = preds["energy"].block()
        return block.values, block.gradient("positions").values

    # Chained timing: each step's positions depend on the previous step's
    # forces, so the device must execute the calls strictly in sequence --
    # host timing then measures real device throughput even through an
    # async RPC tunnel (single per-call host timestamps are unreliable
    # there). One jitted single-step program keeps compile time low.
    @jax.jit
    def md_step(params, positions):
        energy, forces = one_force_call(
            params, positions
        )
        return positions + 0.0 * forces[:, :, 0], energy

    pos, energy = md_step(params, batch.positions)  # compile
    jax.block_until_ready(pos)

    n_timed = 30
    start = time.perf_counter()
    for _ in range(n_timed):
        pos, energy = md_step(params, pos)
    jax.block_until_ready(pos)
    elapsed = time.perf_counter() - start

    throughput = n_atoms * n_timed / elapsed  # atom-steps/sec/chip

    # Baseline floor: torch PET on A100 at 10k atoms runs at roughly
    # ~6e4 atom-steps/s (O(150 ms)/force-call); the driver target is >=5x
    # that per chip => 3e5 atom-steps/s/chip.
    target = 3.0e5
    print(
        json.dumps(
            {
                "metric": "pet_force_call_throughput_10k_atoms",
                "value": round(throughput, 1),
                "unit": "atom-steps/s/chip",
                "vs_baseline": round(throughput / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
