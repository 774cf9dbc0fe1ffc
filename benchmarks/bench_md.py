"""MD serving throughput: the Calculator loop (host NL with Verlet-skin
reuse + jitted force call) at the 10k-atom bench shape -- the north-star
workload (SURVEY 3.5: one compiled force call, called O(1e6) times).
Run on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from bench_breakdown import build  # noqa: E402

from metatrain_tpu.calculator import Calculator  # noqa: E402
from metatrain_tpu.containers import System  # noqa: E402


def main():
    model, params, batch, dataset_info = build(jnp.bfloat16)
    model.params = params

    pos = np.asarray(jax.device_get(batch.positions))
    n = int(np.asarray(batch.atom_mask).sum())
    system = System(
        positions=pos[:n].astype(np.float64),
        types=np.asarray(jax.device_get(batch.types))[:n],
        cell=np.asarray(jax.device_get(batch.cells))[0].astype(np.float64),
        pbc=np.ones(3, dtype=bool),
    )

    calc = Calculator(model, skin=0.5)
    out = calc.compute(system, forces=True)  # compile + first NL
    assert np.isfinite(out["energy"])

    rng = np.random.default_rng(0)
    # thermal-ish displacement per step; stays within skin for several steps
    def step(sys_in):
        sys_in.positions = sys_in.positions + rng.normal(
            0, 0.005, size=sys_in.positions.shape
        )
        return calc.compute(sys_in, forces=True)

    # warm
    for _ in range(3):
        out = step(system)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(system)
    elapsed = time.perf_counter() - t0
    per_call = elapsed / n_steps
    print(
        f"MD force call (host loop, {n} atoms): {per_call*1e3:.1f} ms/step, "
        f"{n/per_call:.0f} atom-steps/s/chip"
    )

    # device-resident NVE: positions/velocities stay on the TPU, one
    # scalar fetch per check_interval steps. NOTE the skin trade: the
    # cutoff+skin neighbor count sets the attention token bucket (48 ->
    # 64 here), so larger skins pay quadratic attention cost to amortize
    # host NL rebuilds.
    masses = np.full(n, 63.5)
    calc2 = Calculator(model, skin=0.5)
    calc2.run_md_nve(system, masses, timestep=0.05, n_steps=5)  # compile
    n_steps = 60
    t0 = time.perf_counter()
    calc2.run_md_nve(system, masses, timestep=0.05, n_steps=n_steps)
    per_step = (time.perf_counter() - t0) / n_steps
    print(
        f"MD NVE (device-resident, {n} atoms): {per_step*1e3:.1f} ms/step, "
        f"{n/per_step:.0f} atom-steps/s/chip"
    )


if __name__ == "__main__":
    main()
