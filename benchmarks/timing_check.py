"""Calibrate timing methodology on the axon tunnel: compare dispatch-loop
vs on-device-scan chains at several n, to separate fixed overhead from
per-iteration cost."""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

N = 4096
x0 = jnp.ones((N, N), jnp.bfloat16)
w = jnp.ones((N, N), jnp.bfloat16)
FLOPS = 2 * N**3


def fetch(v):
    return float(v)


@jax.jit
def step(x, w):
    out = x @ w
    dep = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x.dtype)
    return x + dep


def scan_run(n):
    @jax.jit
    def run(x, w):
        def body(x, _):
            out = x @ w
            dep = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x.dtype)
            return x + dep, ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x.astype(jnp.float32))
    fetch(run(x0, w))
    t0 = time.perf_counter()
    fetch(run(x0, w))
    dt = time.perf_counter() - t0
    print(f"scan    n={n:3d}: total {dt*1e3:9.2f} ms, per-iter {dt/n*1e3:7.3f} ms, {FLOPS/(dt/n)/1e12:7.1f} TF/s", flush=True)


def loop_run(n):
    x = step(x0, w)
    fetch(jnp.sum(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x, w)
    fetch(jnp.sum(x.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"dispatch n={n:3d}: total {dt*1e3:9.2f} ms, per-iter {dt/n*1e3:7.3f} ms, {FLOPS/(dt/n)/1e12:7.1f} TF/s", flush=True)


for n in (5, 20, 80):
    scan_run(n)
for n in (5, 20, 80):
    loop_run(n)
