"""Microbenchmarks for the PET hot path on the real TPU.

Times candidate formulations of the neighborhood-window attention and the
surrounding projection matmuls at the bench shape (A=11392, T=43, D=128,
H=8), to pick the round-2 kernel strategy. Timing uses chained dependent
calls (device executes strictly in sequence), same discipline as bench.py.

Run: python benchmarks/micro_attention.py [--all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

A = 11392
T = 43
D = 128
H = 8
HD = D // H


def chain_time(fn, args, n1=10, n2=50):
    """Time fn via chained dispatches at two lengths; the difference
    cancels the ~28 ms fixed fetch/dispatch overhead of the axon tunnel
    (calibrated in benchmarks/timing_check.py). Chaining (each call's
    input perturbed by the previous output) forces strict sequencing."""

    @jax.jit
    def step(x, rest):
        out = fn(x, *rest)
        # depend on EVERY output leaf, or XLA dead-code-eliminates the
        # computation of unconsumed ones (e.g. the whole force vjp)
        total = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )
        # tiny non-zero scale: not foldable, numerically a no-op
        dep = (total * 1e-30).astype(x.dtype)
        return x + dep

    def run(n):
        x, rest = args[0], tuple(args[1:])
        x = step(x, rest)
        float(jnp.sum(x.astype(jnp.float32)))  # warm + fence
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x, rest)
        float(jnp.sum(x.astype(jnp.float32)))  # fetch = reliable fence
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def report(name, secs, flops=None):
    msg = f"{name:48s} {secs*1e3:9.3f} ms"
    if flops:
        msg += f"  {flops/secs/1e12:8.2f} TF/s"
    print(msg, flush=True)


def bench_sanity(dtype):
    n = 4096
    x = jnp.ones((n, n), dtype)
    w = jnp.ones((n, n), dtype)
    f = jax.jit(lambda a, b: a @ b)
    secs = chain_time(f, (x, w))
    report(f"sanity {n}^3 matmul {dtype.__name__}", secs, 2 * n**3)


def bench_projections(dtype):
    # QKV projection at bench shape: (A*T, D) @ (D, 3D)
    x = jnp.ones((A * T, D), dtype)
    w = jnp.ones((D, 3 * D), dtype)
    f = jax.jit(lambda a, b: a @ b)
    secs = chain_time(f, (x, w))
    report(f"qkv proj (A*T,128)@(128,384) {dtype.__name__}", secs, 2 * A * T * D * 3 * D)

    # FFN in: (A*T, 128) @ (128, 512)
    w2 = jnp.ones((D, 4 * D), dtype)
    secs = chain_time(f, (x, w2))
    report(f"ffn in (A*T,128)@(128,512) {dtype.__name__}", secs, 2 * A * T * D * 4 * D)


TRUE_ATTN_FLOPS = 2 * A * T * T * D * 2  # scores + PV, all heads


def bench_xla_reference(dtype):
    from metatrain_tpu.ops.pallas.attention import reference_window_attention

    q = jnp.ones((A, T, D), dtype)
    k = jnp.ones((A, T, D), dtype)
    v = jnp.ones((A, T, D), dtype)
    bias = jnp.zeros((A, T), jnp.float32)
    f = jax.jit(
        lambda q, k, v, b: reference_window_attention(q, k, v, b, H, 0.25)
    )
    secs = chain_time(f, (q, k, v, bias))
    report(f"XLA einsum per-head {dtype.__name__}", secs, TRUE_ATTN_FLOPS)


def bench_pallas_current(dtype):
    from metatrain_tpu.ops.pallas.attention import window_attention

    q = jnp.ones((A, T, D), dtype)
    k = jnp.ones((A, T, D), dtype)
    v = jnp.ones((A, T, D), dtype)
    bias = jnp.zeros((A, T), jnp.float32)
    f = jax.jit(lambda q, k, v, b: window_attention(q, k, v, b, H, 0.25))
    secs = chain_time(f, (q, k, v, bias))
    report(f"pallas per-head loop (shipped) {dtype.__name__}", secs, TRUE_ATTN_FLOPS)


def bench_xla_head_expanded(dtype):
    """Head expansion in pure XLA: one (A,T,D)x(A,T*H,D) batched matmul."""
    q = jnp.ones((A, T, D), dtype)
    k = jnp.ones((A, T, D), dtype)
    v = jnp.ones((A, T, D), dtype)
    bias = jnp.zeros((A, T), jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    head_mask = (col // HD == row).astype(dtype)  # (H, D)

    def f(q, k, v, bias):
        # layout (h, u): k_exp[a, h*T+u, :] = k[a,u,:]*mask[h]
        k_exp = (head_mask[None, :, None, :] * k[:, None, :, :]).reshape(A, H * T, D)
        v_exp = (head_mask[None, :, None, :] * v[:, None, :, :]).reshape(A, H * T, D)
        scores = jax.lax.dot_general(
            q, k_exp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (A, T, H*T)
        s4 = scores.reshape(A, T, H, T) * 0.25 + bias[:, None, None, :]
        w4 = jax.nn.softmax(s4, axis=-1)
        weights = w4.reshape(A, T, H * T).astype(dtype)
        return jax.lax.dot_general(
            weights, v_exp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    secs = chain_time(jax.jit(f), (q, k, v, bias))
    report(f"XLA head-expanded batched {dtype.__name__}", secs, TRUE_ATTN_FLOPS)


def bench_blockdiag(dtype, BW=4):
    """Block-diagonal mega-matmul: fold BW windows into M and N; compute
    cross-window scores and mask them out. Per-head via head expansion is
    too wasteful, so this variant does full-D scores (head-summed -> wrong
    math, measuring the matmul cost shape only)."""
    q = jnp.ones((A // BW, BW * T, D), dtype)
    k = jnp.ones((A // BW, BW * T, D), dtype)

    def f(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    secs = chain_time(jax.jit(f), (q, k))
    # issued flops
    report(
        f"blockdiag BW={BW} scores-only {dtype.__name__}",
        secs,
        2 * (A // BW) * (BW * T) ** 2 * D,
    )


def bench_gather(dtype):
    x = jnp.ones((A * (T - 1), D), dtype)
    idx = jnp.asarray(
        np.random.default_rng(0).permutation(A * (T - 1)), jnp.int32
    )
    f = jax.jit(lambda x, i: x[i])
    secs = chain_time(f, (x, idx))
    gb = A * (T - 1) * D * x.dtype.itemsize * 2 / 1e9
    print(f"{'edge gather (478k,128) ' + dtype.__name__:48s} {secs*1e3:9.3f} ms  {gb/secs:8.1f} GB/s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all")
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

    for dtype in (jnp.bfloat16, jnp.float32):
        bench_sanity(dtype)
    for dtype in (jnp.bfloat16, jnp.float32):
        bench_projections(dtype)
        bench_gather(dtype)
    for dtype in (jnp.bfloat16, jnp.float32):
        bench_pallas_current(dtype)
        bench_xla_head_expanded(dtype)
        bench_blockdiag(dtype, 4)
        bench_blockdiag(dtype, 8)
    bench_xla_reference(jnp.bfloat16)


if __name__ == "__main__":
    main()
