"""Capture a jax.profiler trace of the PET force call and print the top
device ops by total time. Run on the real TPU."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from bench_breakdown import build  # noqa: E402

from metatrain_tpu.engine.evaluate import evaluate_model  # noqa: E402


def main():
    dtype = jnp.bfloat16
    model, params, batch, dataset_info = build(dtype)
    target_infos = dict(dataset_info.targets)

    @jax.jit
    def force_call(positions):
        preds = evaluate_model(
            model.forward,
            params,
            batch.replace(positions=positions),
            target_infos,
            is_training=False,
        )
        block = preds["energy"].block()
        dep = (jnp.sum(block.values.astype(jnp.float32)) + jnp.sum(
            block.gradient("positions").values.astype(jnp.float32))) * 1e-30
        return positions + dep.astype(positions.dtype)

    pos = force_call(batch.positions)
    float(jnp.sum(pos))  # warm + fence

    trace_dir = "/tmp/mtt_force_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            pos = force_call(pos)
        float(jnp.sum(pos))

    # parse newest trace.json.gz: aggregate device-lane events by name
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find device PIDs (TensorCore lanes)
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e["args"].get("name", "")
            if "TPU" in name or "XLA Ops" in name or "Tensor" in name:
                device_pids.add(e["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pid_ok = e.get("pid") in device_pids if device_pids else True
            if pid_ok:
                totals[e["name"]] += e["dur"]
                counts[e["name"]] += 1
    grand = sum(totals.values())
    print(f"total traced device time: {grand/1e3:.2f} ms over 3 calls")
    named = [(n, d) for n, d in totals.items() if not n.startswith("jit_") and not n.strip().isdigit()]
    print(f"sum of named ops: {sum(d for _, d in named)/3e3:.2f} ms/call")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:140]:
        print(f"{dur/3e3:9.3f} ms/call  x{counts[name]//3:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
