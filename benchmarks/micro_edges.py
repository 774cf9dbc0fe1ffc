"""Time the non-transformer pieces of PET at bench shape: edge compress
MLPs, combination MLP, heads, reverse-edge gather + its scatter-add
transpose. These account for the force-call time not in the fused layers."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

A, M, D = 11392, 47, 128
E = A * M


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    # compress: cat(edge_emb, nbr_emb, messages) (E, 384) -> 128 -> silu -> 128
    x384 = jnp.asarray(rng.normal(size=(E, 3 * D)), dtype)
    w0 = jnp.asarray(rng.normal(size=(3 * D, D)) * 0.05, dtype)
    w1 = jnp.asarray(rng.normal(size=(D, D)) * 0.05, dtype)

    def compress(x, w0, w1):
        h = jax.nn.silu(x @ w0)
        return h @ w1

    secs = chain_time(jax.jit(compress), (x384, w0, w1))
    report("compress MLP fwd (E,384->128->128)", secs)

    def compress_grad(x, w0, w1):
        def loss(x, w0, w1):
            return jnp.sum(compress(x, w0, w1).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(x, w0, w1)

    secs = chain_time(jax.jit(compress_grad), (x384, w0, w1))
    report("compress MLP fwd+bwd", secs)

    # combination: cat(edges, rev) (E, 256) -> LN -> 256 -> silu -> 128
    x256 = jnp.asarray(rng.normal(size=(E, 2 * D)), dtype)
    wc0 = jnp.asarray(rng.normal(size=(2 * D, 2 * D)) * 0.05, dtype)
    wc1 = jnp.asarray(rng.normal(size=(2 * D, D)) * 0.05, dtype)

    def combo(x, w0, w1):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        h = jax.nn.silu(xn @ w0)
        return h @ w1

    def combo_grad(x, w0, w1):
        def loss(x, w0, w1):
            return jnp.sum(combo(x, w0, w1).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(x, w0, w1)

    secs = chain_time(jax.jit(combo), (x256, wc0, wc1))
    report("combination MLP fwd (E,256->256->128)", secs)
    secs = chain_time(jax.jit(combo_grad), (x256, wc0, wc1))
    report("combination MLP fwd+bwd", secs)

    # edge head: (E,128)->128->silu->128->silu -> last (E,128)->1
    wh0 = jnp.asarray(rng.normal(size=(D, D)) * 0.05, dtype)
    wh1 = jnp.asarray(rng.normal(size=(D, D)) * 0.05, dtype)
    wl = jnp.asarray(rng.normal(size=(D, 8)) * 0.05, dtype)
    xe = jnp.asarray(rng.normal(size=(E, D)), dtype)

    def head(x, w0, w1, wl):
        h = jax.nn.silu(x @ w0)
        h = jax.nn.silu(h @ w1)
        return h @ wl

    def head_grad(x, w0, w1, wl):
        def loss(x, w0, w1, wl):
            return jnp.sum(head(x, w0, w1, wl).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, w0, w1, wl)

    secs = chain_time(jax.jit(head), (xe, wh0, wh1, wl))
    report("edge head fwd", secs)
    secs = chain_time(jax.jit(head_grad), (xe, wh0, wh1, wl))
    report("edge head fwd+bwd", secs)

    # reverse gather and its transpose (scatter-add)
    perm = np.random.default_rng(1).permutation(E).astype(np.int32)
    idx = jnp.asarray(perm)
    xg = jnp.asarray(rng.normal(size=(E, D)), dtype)

    secs = chain_time(jax.jit(lambda x, i: x[i]), (xg, idx))
    report("gather (E,128) bf16", secs)

    def scatter_grad(x, i):
        def loss(x):
            return jnp.sum(x[i].astype(jnp.float32) ** 2)

        return jax.grad(loss)(x)

    secs = chain_time(jax.jit(scatter_grad), (xg, idx))
    report("gather fwd + scatter-add bwd", secs)

    # f32 variants of gather
    xg32 = xg.astype(jnp.float32)
    secs = chain_time(jax.jit(lambda x, i: x[i]), (xg32, idx))
    report("gather (E,128) f32", secs)
    # bitcast-packed gather: (E, 64) f32 view of bf16 rows
    xgp = jax.lax.bitcast_convert_type(
        xg.reshape(E, D // 2, 2), jnp.float32
    ).reshape(E, D // 2)
    secs = chain_time(jax.jit(lambda x, i: x[i]), (xgp, idx))
    report("gather (E,64) f32-packed(=bf16x128)", secs)


if __name__ == "__main__":
    main()
