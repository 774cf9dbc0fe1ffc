"""int8 MXU rates for the PET attention shapes.

Question for the next perf push: do int8 score matmuls beat bf16's
measured ~50 TF/s on the batched per-atom window dots (the structural
floor of the fused layer, docs/performance.md)? v5e peaks at 394 TOPS
int8 vs 197 TFLOPS bf16, but the pipeline-fill cost of small batched
matmuls may cap both at the same rate. This measures:

- batched (T, D) x (D, HT) score-shaped dots in bf16 / int8 / mixed
  (int8 operands, int32 accum);
- the large (A*T, D) x (D, 3D) projection shapes for reference.

Run (real TPU): python benchmarks/micro_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

BA = 128  # atoms per block (fused-layer fwd block)
NBLK = 86  # ~11k atoms
T = 48
D = 128
H = 8
HT = H * T


def chain_time(fn, args, n1=10, n2=50):
    @jax.jit
    def step(x, rest):
        out = fn(x, *rest)
        total = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )
        dep = (total * 1e-30).astype(x.dtype)
        return x + dep

    x0, *rest = args

    def run(n):
        x = step(x0, rest)
        float(jnp.sum(x.astype(jnp.float32)))
        start = time.perf_counter()
        for _ in range(n):
            x = step(x, rest)
        float(jnp.sum(x.astype(jnp.float32)))
        return time.perf_counter() - start

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    # generate operands ON DEVICE: uploading ~2.5 GB of host numpy
    # through the dev tunnel takes longer than the whole benchmark
    A = BA * NBLK
    key = jax.random.PRNGKey(0)
    kq, kk = jax.random.split(key)
    q_f = jax.random.normal(kq, (A, T, D), dtype=jnp.float32)
    k_f = jax.random.normal(kk, (A, HT, D), dtype=jnp.float32)

    flops = 2 * A * T * HT * D

    # bf16 batched score dot (the current formulation's shape)
    q_bf = q_f.astype(jnp.bfloat16)
    k_bf = k_f.astype(jnp.bfloat16)

    def score_bf16(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    dt = chain_time(score_bf16, (q_bf, k_bf))
    print(f"bf16 score dot:  {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s")

    # int8 batched score dot (quantized operands, int32 accumulation)
    q_i8 = jax.jit(
        lambda x: jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
    )(q_f)
    k_i8 = jax.jit(
        lambda x: jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
    )(k_f)

    def score_int8(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    try:
        dt = chain_time(score_int8, (q_i8, k_i8))
        print(f"int8 score dot:  {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TOP/s")
    except Exception as err:
        print(f"int8 score dot: unsupported ({type(err).__name__}: {err})")

    # large projection reference shapes
    kx, kw = jax.random.split(kq)
    x_bf = jax.random.normal(kx, (A * T, D), dtype=jnp.float32).astype(
        jnp.bfloat16
    )
    w_bf = jax.random.normal(kw, (D, 3 * D), dtype=jnp.float32).astype(
        jnp.bfloat16
    )
    pf = 2 * (A * T) * D * 3 * D

    def proj_bf16(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dt = chain_time(proj_bf16, (x_bf, w_bf))
    print(f"bf16 projection: {dt*1e3:8.2f} ms  {pf/dt/1e12:6.1f} TF/s")

    x_i8 = jax.jit(
        lambda x: jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
    )(x_bf.astype(jnp.float32))
    w_i8 = jax.jit(
        lambda x: jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
    )(w_bf.astype(jnp.float32))

    def proj_int8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        dt = chain_time(proj_int8, (x_i8, w_i8))
        print(f"int8 projection: {dt*1e3:8.2f} ms  {pf/dt/1e12:6.1f} TOP/s")
    except Exception as err:
        print(f"int8 projection: unsupported ({type(err).__name__}: {err})")


if __name__ == "__main__":
    main()
