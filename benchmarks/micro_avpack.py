"""AV-matmul formulations for PET window attention (run on real TPU).

Current kernel (kq-transposed mexp): AV = dot(weights (BA,Tk,HT), v_cf
(BA,Tk,D)) contracting T_k=48 -- 37.5% MXU depth utilization.

Candidate (q-side layout): weights come as (BA, Tq, H*Tk); AV runs as
two group slices against _expand_heads(v) slices at FULL contraction
depth (4*Tk=192), producing the folded (BA, Tq, D) output directly:

    out[:, :, :64]  = W[:, :, :192]  @ v_exp[:, :192, :64]
    out[:, :, 64:]  = W[:, :, 192:]  @ v_exp[:, 192:, 64:]

Half the MACs of the mexp AV at ~full depth; no fold_heads pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")


def chain_time(fn, args, n1=10, n2=40):
    """Chained dispatches at two lengths (see micro_attention.py)."""

    @jax.jit
    def step(x, rest):
        out = fn(x, *rest)
        total = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )
        dep = (total * 1e-30).astype(x.dtype)
        return x + dep

    def run(n):
        x, rest = args[0], tuple(args[1:])
        x = step(x, rest)
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x, rest)
        float(jnp.sum(x.astype(jnp.float32)))
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    A, T, D, H = 11008, 48, 128, 8
    hd = D // H
    HT = H * T
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # mexp AV: weights (A, Tk, HT) x v (A, Tk, D) -> (A, HT, D)
    w_mexp = jnp.asarray(rng.normal(size=(A, T, HT)) * 0.1, dtype)
    v = jnp.asarray(rng.normal(size=(A, T, D)) * 0.1, dtype)

    @jax.jit
    def av_mexp(w, v):
        out = jax.lax.dot_general(
            w, v,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out.astype(w.dtype)

    secs = chain_time(av_mexp, (w_mexp, v))
    flops = 2 * A * T * HT * D
    print(f"mexp AV      : {secs*1e3:8.3f} ms  {flops/secs/1e12:6.1f} TF/s")

    # q-side grouped AV: weights (A, Tq, HT) x v_exp slices
    w_q = jnp.asarray(rng.normal(size=(A, T, HT)) * 0.1, dtype)
    from metatrain_tpu.ops.pallas.attention import _expand_heads

    v_exp = _expand_heads(v, H, hd)  # (A, HT, D)

    @jax.jit
    def av_grouped(w, v_exp):
        g = HT // 2
        out0 = jax.lax.dot_general(
            w[:, :, :g], v_exp[:, :g, : D // 2],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out1 = jax.lax.dot_general(
            w[:, :, g:], v_exp[:, g:, D // 2 :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate([out0, out1], axis=-1).astype(w.dtype)

    secs = chain_time(av_grouped, (w_q, v_exp))
    flops = 2 * A * T * (HT // 2) * D  # two halves: T x (HT/2) x (D/2) each
    print(f"grouped AV   : {secs*1e3:8.3f} ms  {flops/secs/1e12:6.1f} TF/s (useful-MAC rate)")

    # one full block-diag AV (contraction 384, includes zero blocks)
    @jax.jit
    def av_blockdiag(w, v_exp):
        out = jax.lax.dot_general(
            w, v_exp,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out.astype(w.dtype)

    secs = chain_time(av_blockdiag, (w_q, v_exp))
    flops = 2 * A * T * HT * D
    print(f"blockdiag AV : {secs*1e3:8.3f} ms  {flops/secs/1e12:6.1f} TF/s")

    # scores in q-side layout: q (A,T,D) x k_exp (A,HT,D) over D
    q = jnp.asarray(rng.normal(size=(A, T, D)) * 0.1, dtype)
    k_exp = _expand_heads(v, H, hd)

    @jax.jit
    def scores_qside(q, k_exp):
        return jax.lax.dot_general(
            q, k_exp,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    secs = chain_time(scores_qside, (q, k_exp))
    flops = 2 * A * T * HT * D
    print(f"qside scores : {secs*1e3:8.3f} ms  {flops/secs/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
