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

    from metatrain_tpu.containers import System, batch_from_systems, bucket_neighbors
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
    # compute dtype: bf16 is the production TPU configuration (force parity
    # vs f32 is asserted in tests/test_bf16_parity.py); MTT_BENCH_DTYPE=f32
    # benches the full-precision path
    compute_dtype = (
        jnp.float32
        if os.environ.get("MTT_BENCH_DTYPE", "bf16") == "f32"
        else jnp.bfloat16
    )
    model = PET({}, dataset_info, compute_dtype=compute_dtype)
    params = model.init_params(jax.random.PRNGKey(0))

    # ---- neighbor list (host, once — MD-style Verlet reuse; colored-slot
    # NEF layout so the reversed-edge permutation runs on the MXU) ------------
    nbr = compute_neighbor_data(system, cutoff=model.cutoff, colored=True)
    # Atom padding: next multiple of 256 (the color-kernel block), NOT a
    # geometric bucket — MD on a fixed system compiles exactly once either
    # way, and a tight pad (a) skips 4.4% wasted rows in every kernel and
    # (b) keeps the pad gap out of the periodic ring's circular index
    # metric, so the colored-gather band selector can use the 1024 band
    # (the geometric bucket's 544-row gap forced 1280 + big fixup lists).
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=-(-n_atoms // 256) * 256,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
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
    # ENERGY AND FORCES (non-zero coefficients, so XLA can neither fold the
    # dependency nor dead-code-eliminate the force vjp), forcing strictly
    # sequential device execution. Through the axon RPC tunnel
    # block_until_ready is not a reliable fence and each fetch costs ~28 ms
    # fixed, so the loop is timed at two lengths and differenced
    # (methodology calibrated in benchmarks/timing_check.py).
    @jax.jit
    def md_step(params, positions):
        energy, forces = one_force_call(params, positions)
        dep = (jnp.sum(energy.astype(jnp.float32))
               + jnp.sum(forces.astype(jnp.float32))) * 1e-30
        return positions + dep.astype(positions.dtype)

    # Warm-up with a safety net: if a freshly-added kernel formulation
    # fails to lower/compile on this chip, fall back to the last
    # hardware-validated configuration (kq-transposed attention +
    # extended-copy band layout) rather than failing the bench.
    try:
        pos0 = md_step(params, batch.positions)
        float(jnp.sum(pos0))
    except Exception as err:  # pragma: no cover - hardware-specific
        print(f"# warm-up failed ({type(err).__name__}); "
              "falling back to validated kernel config", flush=True)
        os.environ["MTT_QSIDE"] = "0"
        os.environ["MTT_COLOR_EXT"] = "1"
        jax.clear_caches()
        md_step = jax.jit(md_step.__wrapped__)

    def run(n):
        pos = md_step(params, batch.positions)  # compile/warm
        float(jnp.sum(pos))  # fetch = reliable fence
        start = time.perf_counter()
        for _ in range(n):
            pos = md_step(params, pos)
        float(jnp.sum(pos))
        return time.perf_counter() - start

    n1, n2 = 10, 40
    t1, t2 = run(n1), run(n2)
    per_call = (t2 - t1) / (n2 - n1)
    throughput = n_atoms / per_call  # atom-steps/sec/chip

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
