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
    # MTT_BENCH_CELLS shrinks the system for CPU smoke tests of the bench
    # harness itself (the recorded metric always uses the default 14)
    n_cells = int(os.environ.get("MTT_BENCH_CELLS", "14"))  # 14^3*4 = 10976
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
    # Initialize under the hardware-validated kernel config: init traces
    # the forward once, and a freshly-landed formulation that fails to
    # lower on this chip must not kill the bench before the A/B loop
    # (whose per-config try/except handles such failures) even runs.
    os.environ.update({"MTT_QSIDE": "0", "MTT_COLOR_EXT": "1"})
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
    def md_step_raw(params, positions):
        energy, forces = one_force_call(params, positions)
        dep = (jnp.sum(energy.astype(jnp.float32))
               + jnp.sum(forces.astype(jnp.float32))) * 1e-30
        return positions + dep.astype(positions.dtype)

    def make_step_fn(tag):
        """Per-config jit identity: the kernel-formulation env knobs are
        read at TRACE time, so each config gets its own function object
        (traced on first call under that config's env). No
        ``jax.clear_caches()``: every config's executable stays cached,
        and the winner's full measurement reuses its compiled step."""

        def md_step(params, positions, _tag=tag):
            return md_step_raw(params, positions)

        return jax.jit(md_step)

    def run(n, step):
        pos = step(params, batch.positions)  # compile/warm
        float(jnp.sum(pos))  # fetch = reliable fence
        start = time.perf_counter()
        for _ in range(n):
            pos = step(params, pos)
        float(jnp.sum(pos))
        return time.perf_counter() - start

    # ---- kernel-config selection --------------------------------------------
    # The kernel formulation knobs (q-side vs kq-transposed attention; wrap
    # -DMA vs extended-copy color bands) are read at trace time. New
    # formulations land CPU-validated between TPU windows, so the bench
    # A/Bs every candidate on THIS chip: compile + short chained timing
    # each (configs that fail to lower are skipped). The fastest config is
    # then checked for force agreement against the hardware-validated
    # "kq+ext" formulation (same math, different schedule: bf16 reduction-
    # order noise only) before running the full measurement.
    VALIDATED = ("kq+ext", {"MTT_QSIDE": "0", "MTT_COLOR_EXT": "1"})  # r3
    candidates = [
        ("qside+wrap", {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0"}),
        ("qside+ext", {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "1"}),
        ("kq+wrap", {"MTT_QSIDE": "0", "MTT_COLOR_EXT": "0"}),
        VALIDATED,
    ]
    if os.environ.get("MTT_BENCH_AB", "1") == "0":  # pinned-config escape
        candidates = [("pinned", dict())]

    def forces_under(tag, env):
        os.environ.update(env)

        def force_fn(params, positions, _tag=tag):
            return one_force_call(params, positions)

        _, forces = jax.jit(force_fn)(params, batch.positions)
        return np.asarray(forces, dtype=np.float64)

    # MTT_BENCH_SMOKE=1: minimal iteration counts for CPU smoke tests of
    # the harness logic (interpret-mode Pallas is ~1000x slower than TPU)
    smoke = os.environ.get("MTT_BENCH_SMOKE", "0") == "1"
    N_AB = 1 if smoke else 8
    # stop exploring configs when compile time piles up (fresh cache +
    # slow tunnel): always finishes at least one config
    ab_budget = float(os.environ.get("MTT_BENCH_AB_BUDGET", "900"))
    ab_start = time.perf_counter()
    step_fns = {}
    results = []
    for name, env in candidates:
        if results and time.perf_counter() - ab_start > ab_budget:
            print(f"# A/B budget exhausted; skipping {name}", flush=True)
            continue
        os.environ.update(env)
        step_fns[name] = make_step_fn(name)
        try:
            t = run(N_AB, step_fns[name]) / N_AB  # compile+warm untimed
            results.append((t, name, dict(env)))
            print(f"# config {name}: {t*1e3:.1f} ms/call", flush=True)
        except Exception as err:  # pragma: no cover - hardware-specific
            print(f"# config {name} failed ({type(err).__name__}); skipped",
                  flush=True)
    if not results:  # nothing compiled: pin the validated config and hope
        os.environ.update(VALIDATED[1])
        step_fns[VALIDATED[0]] = make_step_fn(VALIDATED[0])
        results = [(float("inf"), VALIDATED[0], dict(VALIDATED[1]))]
    results.sort(key=lambda r: r[0])

    # force-agreement guard on the winner (skipped when the winner IS the
    # validated config or agreement cannot be established)
    best_t, best_name, best_env = results[0]
    validated_ran = any(r[1] == VALIDATED[0] for r in results)
    if best_name not in (VALIDATED[0], "pinned") and validated_ran:
        try:
            f_ref = forces_under(VALIDATED[0], VALIDATED[1])
            f_best = forces_under(best_name, best_env)
            scale = float(np.sqrt(np.mean(f_ref**2))) or 1.0
            dev = float(np.sqrt(np.mean((f_best - f_ref) ** 2))) / scale
            if not np.isfinite(dev) or dev > 5e-2:
                print(f"# config {best_name}: force deviation {dev:.3e} "
                      "vs validated exceeds bound; using validated",
                      flush=True)
                best_name, best_env = VALIDATED[0], dict(VALIDATED[1])
        except Exception as err:  # pragma: no cover
            print(f"# force guard failed ({type(err).__name__}); "
                  "keeping timing winner", flush=True)
    os.environ.update(best_env)
    md_step = step_fns[best_name]
    print(f"# selected config: {best_name}", flush=True)

    n1, n2 = (1, 2) if smoke else (10, 40)
    t1, t2 = run(n1, md_step), run(n2, md_step)
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
