"""Benchmark: PET force-call throughput on a 10k-atom periodic system.

The driver's north-star metric (BASELINE.json): PET force calls
(energy + forces via autograd) on a ~10k-atom periodic system,
atom-steps/sec per chip. Methodology mirrors the reference's eval timing
harness (``cli/eval.py:219-310``): warm-up before timing, device sync
around the timed region, per-atom normalization.

The MD chain runs DEVICE-RESIDENT inside one jitted ``lax.scan`` (each
step's positions depend on the previous step's energy AND forces), so
the measurement times the chip, not per-call RPC dispatch through the
dev tunnel. Two chain lengths are differenced to cancel the fixed
dispatch+fetch cost of a single call.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the driver's >=5x-vs-A100-torch
target expressed as an absolute per-chip throughput floor (TARGET below).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax

    # CPU-forced smoke runs: the axon sitecustomize pins the TPU platform
    # and IGNORES the JAX_PLATFORMS env var, so a CPU run must be forced
    # through the config API before first backend use
    if os.environ.get("MTT_BENCH_FORCE_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")

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
    # The library defaults ARE the hardware-validated kernel config
    # (q-side attention + wrap-DMA color bands); setdefault
    # keeps an explicit user pin (e.g. MTT_QSIDE=1) in effect for the
    # "pinned" escape hatch below while still guarding unset environments.
    os.environ.setdefault("MTT_QSIDE", "1")
    os.environ.setdefault("MTT_COLOR_EXT", "0")
    os.environ.setdefault("MTT_COLOR_ROLL", "0")
    model = PET({}, dataset_info, compute_dtype=compute_dtype)
    params = model.init_params(jax.random.PRNGKey(0))

    # ---- neighbor list (host, once — MD-style Verlet reuse; colored-slot
    # NEF layout so the reversed-edge permutation runs on the MXU) ------------
    # Atom padding: next multiple of 256 (the color-kernel block), NOT a
    # geometric bucket — MD on a fixed system compiles exactly once either
    # way, and a tight pad (a) skips 4.4% wasted rows in every kernel and
    # (b) keeps the pad gap out of the periodic ring's circular index
    # metric, so the colored-gather band selector can use the 1024 band
    # (the geometric bucket's 544-row gap forced 1280 + big fixup lists).
    def build_batch(grouped: str):
        """One padded batch per slot LAYOUT (the grouped sigma-paired
        layout is a host-side data-structure property, A/B'd like the
        trace-time kernel knobs)."""
        prior = os.environ.get("MTT_COLOR_GROUPED")
        os.environ["MTT_COLOR_GROUPED"] = grouped
        try:
            nbr = compute_neighbor_data(
                system, cutoff=model.cutoff, colored=True
            )
        finally:
            if prior is None:
                del os.environ["MTT_COLOR_GROUPED"]
            else:
                os.environ["MTT_COLOR_GROUPED"] = prior
        return batch_from_systems(
            [system],
            [nbr],
            n_atoms_padded=-(-n_atoms // 256) * 256,
            n_systems_padded=2,
            max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
            dtype=jnp.float32,
        )

    batches = {"banded": build_batch("0")}
    grouped_batch = build_batch("1")
    if grouped_batch.color_groups:
        batches["grouped"] = grouped_batch
    batch = batches["banded"]

    target_infos = {"energy": dataset_info.targets["energy"]}

    def one_force_call(params, positions, bt):
        preds = evaluate_model(
            model.forward,
            params,
            bt.replace(positions=positions),
            target_infos,
            is_training=False,
        )
        block = preds["energy"].block()
        return block.values, block.gradient("positions").values

    # Each step's positions depend on the previous step's ENERGY AND
    # FORCES (non-zero coefficients, so XLA can neither fold the
    # dependency nor dead-code-eliminate the force vjp), forcing strictly
    # sequential execution inside the scan.
    def md_step_raw(params, positions, bt):
        energy, forces = one_force_call(params, positions, bt)
        dep = (jnp.sum(energy.astype(jnp.float32))
               + jnp.sum(forces.astype(jnp.float32))) * 1e-30
        return positions + dep.astype(positions.dtype)

    def make_chain_fn(tag, bt):
        """Per-config jit identity: the kernel-formulation env knobs are
        read at TRACE time, so each config gets its own function object
        (traced on first call under that config's env). No
        ``jax.clear_caches()``: every config's executable stays cached,
        and the winner's full measurement reuses its compiled chains."""

        def chain(params, positions, n, _tag=tag):
            def body(pos, _):
                return md_step_raw(params, pos, bt), None

            out, _ = jax.lax.scan(body, positions, None, length=n)
            return out

        return jax.jit(chain, static_argnums=2)

    def timed(chain, n):
        """Wall time of one device-resident n-step chain (one dispatch,
        one scalar fetch as the fence)."""
        start = time.perf_counter()
        pos = chain(params, batch.positions, n)
        float(jnp.sum(pos))
        return time.perf_counter() - start

    def per_call(chain, n1, n2):
        """Differenced per-step time: two chain lengths cancel the fixed
        dispatch+fetch cost. Both lengths are warmed (compiled) AND
        fenced first -- an unfenced warm-up would still be executing
        when the n1 timing starts, inflating t1 (negative diffs)."""
        for n in (n1, n2):
            float(jnp.sum(chain(params, batch.positions, n)))
        t1, t2 = timed(chain, n1), timed(chain, n2)
        return (t2 - t1) / (n2 - n1)

    # ---- kernel-config selection --------------------------------------------
    # The kernel formulation knobs (q-side vs kq-transposed attention; wrap
    # -DMA vs extended-copy color bands) are read at trace time. New
    # formulations land CPU-validated between TPU windows, so the bench
    # A/Bs every candidate on THIS chip: compile + short chained timing
    # each (configs that fail to lower are skipped). EVERY candidate that
    # runs is checked for force agreement against the pure-XLA layer path
    # (same math, no Pallas) before it can win.
    # every candidate pins ALL knobs (os.environ.update persists values
    # across candidates otherwise)
    # Candidates are (name, env, layout): env pins the trace-time kernel
    # knobs, layout picks the slot-assignment data structure (banded =
    # single all-slots window; grouped = sigma-paired per-color windows,
    # r4). MTT_COLOR_GROUPED rides the env dict so the autotune cache
    # pins the winning layout for production entry points.
    # int8 score configs were A/B'd on-chip (2026-08, v5e) and LOST by
    # ~2-4 ms (quantize+expand VPU overhead exceeds the in-kernel int8
    # matmul gain at these near-SOL kernel rates): qside+ext+i8 70.6 vs
    # qside+ext 68.4, qside+wrap+i8 68.6 vs qside+wrap 66.6. The code
    # path stays (MTT_INT8_SCORES=1) but is not A/B'd every run.
    # r4 A/B: qside+roll 66.5 vs qside+wrap 66.0 — the rolling ring
    # buffer's 3.9x band-DMA saving did not land (the permute is
    # compute-bound on the one-hot matmul; DMA already overlapped),
    # which motivated the grouped layout (3x less matmul).
    # Candidate order is MEASURED-BEST-FIRST (r5): the A/B time budget
    # must never leave the best config unexplored on a cold cache.
    # r5 on-chip: qside+grouped 60.4 ms (winner, fused cotangent adds);
    # +gnn megakernel 66.3 (lost: 2-layer residuals shrink bwd
    # blocking); +i8s 63.4 (lost: kernels are VPU-bound, int8 MXU
    # savings don't land -- PERF_ANALYSIS.md section 2).
    # r5: "+i8s" = static-scale W8A8 int8 (QKV/scores/FFN matmuls at the
    # doubled int8 MXU rate; quantization scales are calibrated statics
    # so the round/clip chains fuse into existing output stages -- the
    # r3/r4 dynamic-absmax overhead is gone). Inference-only; accuracy
    # adjudicated by the force guard AND the MAE parity gate below.
    candidates = [
        ("qside+grouped",
         {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "0",
          "MTT_FUSED_GNN": "0", "MTT_COLOR_GROUPED": "1"},
         "grouped"),
        ("qside+grouped+gnn",
         {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "0",
          "MTT_FUSED_GNN": "1", "MTT_COLOR_GROUPED": "1"},
         "grouped"),
        ("qside+grouped+i8s",
         {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "1",
          "MTT_FUSED_GNN": "0",
          "MTT_COLOR_GROUPED": "1"},
         "grouped"),
        ("qside+wrap",
         {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "0",
          "MTT_FUSED_GNN": "0", "MTT_COLOR_GROUPED": "0"},
         "banded"),
        ("kq+wrap",
         {"MTT_QSIDE": "0", "MTT_COLOR_EXT": "0", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "0",
          "MTT_FUSED_GNN": "0", "MTT_COLOR_GROUPED": "0"},
         "banded"),
        ("qside+ext",
         {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "1", "MTT_COLOR_ROLL": "0",
          "MTT_INT8_SCORES": "0", "MTT_INT8_STATIC": "0",
          "MTT_FUSED_GNN": "0", "MTT_COLOR_GROUPED": "0"},
         "banded"),  # r2 driver A/B winner (62.7 ms)
    ]
    candidates = [
        c for c in candidates if c[2] in batches
    ]

    # ---- W8A8 calibration (once, for the int8 candidates) -------------------
    if any(env.get("MTT_INT8_STATIC") == "1" for _, env, _ in candidates):
        from metatrain_tpu.ops.pallas.fused_layer import calibrate_from_sow

        prior_env = {
            k: os.environ.get(k)
            for k in ("MTT_INT8_CALIBRATE", "MTT_PALLAS")
        }
        os.environ["MTT_INT8_CALIBRATE"] = "1"
        os.environ["MTT_PALLAS"] = "0"
        try:
            bd_cal = model.preprocess(batch)
            probe = jax.jit(
                lambda p: model.module.apply(
                    p, bd_cal, ("energy",), mutable=["intermediates"]
                )
            )
            _, state = probe(params)
            n_cal = calibrate_from_sow(
                jax.device_get(state["intermediates"]),
                jax.device_get(params["params"]),
            )
            print(f"# int8 calibration: {n_cal} layers", flush=True)
        except Exception as err:  # pragma: no cover - hardware-specific
            print(
                f"# int8 calibration failed ({type(err).__name__}: {err}); "
                "skipping int8 candidates",
                flush=True,
            )
            candidates = [
                c for c in candidates
                if c[1].get("MTT_INT8_STATIC") != "1"
            ]
        finally:
            for k, v in prior_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    if os.environ.get("MTT_BENCH_AB", "1") == "0":  # pinned-config escape
        layout = (
            "grouped"
            if os.environ.get("MTT_COLOR_GROUPED", "auto") != "0"
            and "grouped" in batches
            else "banded"
        )
        candidates = [("pinned", dict(), layout)]

    # MTT_BENCH_SMOKE=1: minimal iteration counts for CPU smoke tests of
    # the harness logic (interpret-mode Pallas is ~1000x slower than TPU)
    smoke = os.environ.get("MTT_BENCH_SMOKE", "0") == "1"
    AB_N1, AB_N2 = (1, 2) if smoke else (2, 10)

    # ground-truth forces: MTT_PALLAS=0 routes every kernel through its
    # identical-math XLA fallback with the SAME params (one compile,
    # reused for every candidate's agreement check)
    f_ref = None
    prior_pallas = os.environ.get("MTT_PALLAS")
    try:
        os.environ["MTT_PALLAS"] = "0"

        def force_xla(params, positions):
            return one_force_call(params, positions, batch)

        _, f = jax.jit(force_xla)(params, batch.positions)
        f_ref = np.asarray(f, dtype=np.float64)
        f_scale = float(np.sqrt(np.mean(f_ref**2))) or 1.0
    except Exception as err:  # pragma: no cover - hardware-specific
        print(f"# XLA reference path failed ({type(err).__name__}); "
              "force guard disabled", flush=True)
    finally:
        if prior_pallas is None:
            del os.environ["MTT_PALLAS"]
        else:
            os.environ["MTT_PALLAS"] = prior_pallas

    def force_deviation(tag, bt):
        """Relative RMS force deviation of the CURRENT env's kernel path
        vs the pure-XLA ground truth (bf16 reduction-order noise only)."""
        if f_ref is None:
            return None
        def force_fn(params, positions, _tag=tag):
            return one_force_call(params, positions, bt)
        _, forces = jax.jit(force_fn)(params, bt.positions)
        f = np.asarray(forces, dtype=np.float64)
        return float(np.sqrt(np.mean((f - f_ref) ** 2))) / f_scale

    DEV_BOUND = 5e-2
    # stop exploring configs when compile time piles up (fresh cache +
    # slow tunnel): always finishes at least one config
    ab_budget = float(os.environ.get("MTT_BENCH_AB_BUDGET", "900"))
    ab_start = time.perf_counter()
    chain_fns = {}
    results = []
    for name, env, layout in candidates:
        if results and time.perf_counter() - ab_start > ab_budget:
            print(f"# A/B budget exhausted; skipping {name}", flush=True)
            continue
        os.environ.update(env)
        bt = batches[layout]
        chain_fns[name] = make_chain_fn(name, bt)
        try:
            t = per_call(chain_fns[name], AB_N1, AB_N2)
            dev = force_deviation(name, bt)
            dev_txt = "n/a" if dev is None else f"{dev:.2e}"
            ok = dev is None or (np.isfinite(dev) and dev <= DEV_BOUND)
            print(f"# config {name}: {t*1e3:.1f} ms/call, "
                  f"force dev {dev_txt}{'' if ok else '  REJECTED'}",
                  flush=True)
            if ok:
                results.append((t, name, dict(env)))
        except Exception as err:  # pragma: no cover - hardware-specific
            print(f"# config {name} failed ({type(err).__name__}); skipped",
                  flush=True)
    if not results:
        # nothing compiled AND passed the guard: fail loudly -- a recorded
        # number from an unvalidated path would be worse than no number
        print("# FATAL: no kernel config compiled and passed the force "
              "guard on this backend", flush=True)
        sys.exit(1)
    results.sort(key=lambda r: r[0])

    # ---- MAE parity gate ----------------------------------------------------
    # The north star conditions on energy/force/virial MAE at parity
    # (BASELINE.md), not on dtype: gate the WINNER on MAE vs an
    # effectively-exact reference (f32 XLA path, HIGHEST matmul
    # precision: ~1e-5 relative -- far below the meV bounds), with
    # bounds tied to PARITY.md's trained-accuracy scale (trained force
    # MAE is O(40-90) meV/A; kernel-path deviations must sit well below
    # it). A config failing the gate is discarded and the next-fastest
    # takes its place. Recorded to BENCH_MAE.json.
    MAE_BOUNDS = {"energy_mev_per_atom": 1.0, "force_mev_per_ang": 10.0,
                  "virial_mev_per_atom": 10.0}

    target_infos_v = {
        "energy": get_energy_target_info(
            "eV", add_position_gradients=True, add_strain_gradients=True
        )
    }

    def efv(tag, bt):
        """(energy (S,), forces (A,3), virial (S,3,3)) under current env."""
        def fn(params, positions, _tag=tag):
            preds = evaluate_model(
                model.forward,
                params,
                bt.replace(positions=positions),
                target_infos_v,
                is_training=False,
            )
            block = preds["energy"].block()
            return (
                block.values,
                block.gradient("positions").values,
                block.gradient("strain").values,
            )
        e, f, v = jax.jit(fn)(params, bt.positions)
        return (np.asarray(e, np.float64), np.asarray(f, np.float64),
                np.asarray(v, np.float64))

    ref_efv = None
    prior_pallas = os.environ.get("MTT_PALLAS")
    try:
        os.environ["MTT_PALLAS"] = "0"
        from metatrain_tpu.models.pet import PET as _PET

        model_f32 = _PET({}, dataset_info, compute_dtype=jnp.float32)
        _model, model = model, model_f32
        try:
            ref_efv = efv("mae_ref_f32", batch)
        finally:
            model = _model
    except Exception as err:  # pragma: no cover - hardware-specific
        print(f"# MAE reference failed ({type(err).__name__}: {err}); "
              "MAE gate disabled", flush=True)
    finally:
        if prior_pallas is None:
            os.environ.pop("MTT_PALLAS", None)
        else:
            os.environ["MTT_PALLAS"] = prior_pallas

    def mae_gate(name, env, bt):
        """Returns (ok, record) for one candidate's kernel path."""
        if ref_efv is None:
            return True, None
        os.environ.update(env)
        e, f, v = efv(f"mae_{name}", bt)
        e0, f0, v0 = ref_efv
        n_at = float(n_atoms)
        def rel(a, b):
            return float(
                np.sqrt(np.mean((a - b) ** 2))
                / (np.sqrt(np.mean(b**2)) or 1.0)
            )

        rec = {
            "config": name,
            "energy_mev_per_atom": float(np.abs(e - e0).sum() / n_at * 1e3),
            "force_mev_per_ang": float(
                np.abs(f[:n_atoms] - f0[:n_atoms]).mean() * 1e3
            ),
            "virial_mev_per_atom": float(np.abs(v - v0).sum() / n_at * 1e3),
            "energy_rel": rel(e, e0),
            "force_rel": rel(f[:n_atoms], f0[:n_atoms]),
            "virial_rel": rel(v, v0),
            "bounds": MAE_BOUNDS,
        }
        # absolute bound at the trained-accuracy scale, with a 1%
        # relative fallback (random-init magnitudes can exceed trained
        # scales; either criterion implies MAE-parity headroom)
        rels = {
            "energy_mev_per_atom": "energy_rel",
            "force_mev_per_ang": "force_rel",
            "virial_mev_per_atom": "virial_rel",
        }
        ok = all(
            rec[k] <= bound or rec[rels[k]] <= 0.01
            for k, bound in MAE_BOUNDS.items()
        )
        rec["pass"] = bool(ok)
        return ok, rec

    layout_of = {n: l for n, _, l in candidates}
    best = None
    mae_records = []
    for t, name, env in results:
        try:
            ok, rec = mae_gate(name, env, batches[layout_of.get(name, "banded")])
        except Exception as err:  # pragma: no cover
            print(f"# MAE gate errored for {name} ({type(err).__name__}); "
                  "rejecting config", flush=True)
            continue
        if rec is not None:
            mae_records.append(rec)
            print(
                f"# MAE gate {name}: "
                f"E {rec['energy_mev_per_atom']:.3f} meV/atom, "
                f"F {rec['force_mev_per_ang']:.3f} meV/A, "
                f"W {rec['virial_mev_per_atom']:.3f} meV/atom "
                f"(rel {rec['force_rel']:.2e}) -> "
                f"{'pass' if ok else 'FAIL'}",
                flush=True,
            )
        if ok:
            best = (t, name, env)
            break
    if best is None:
        print("# FATAL: no config passed the MAE parity gate", flush=True)
        sys.exit(1)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_MAE.json"), "w") as fh:
            json.dump({"bounds": MAE_BOUNDS, "records": mae_records}, fh,
                      indent=1)
    except OSError:
        pass

    best_t, best_name, best_env = best
    os.environ.update(best_env)
    chain = chain_fns[best_name]
    print(f"# selected config: {best_name}", flush=True)

    # persist the measured winner so production entry points (train/eval/
    # export/calculator/drive) pick it up on this device kind
    try:
        from metatrain_tpu.utils.autotune import store_tuned_env

        if best_name == "pinned":
            # an explicitly pinned run is an override experiment, not a
            # measured selection -- never let it clobber the cache
            pass
        elif store_tuned_env(best_env, best_name, best_t * 1e3):
            print(f"# autotune cache updated: {best_name}", flush=True)
    except Exception as err:  # pragma: no cover
        print(f"# autotune cache write failed: {err}", flush=True)

    n1, n2 = (1, 2) if smoke else (10, 40)
    per_step = per_call(chain, n1, n2)
    throughput = n_atoms / per_step  # atom-steps/sec/chip

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
