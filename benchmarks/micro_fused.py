"""Fused transformer layer vs unfused XLA+attention-kernel sequence."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

from metatrain_tpu.ops.pallas.attention import window_attention  # noqa: E402
from metatrain_tpu.ops.pallas.fused_layer import (  # noqa: E402
    LayerWeights,
    _layer_math,
    fused_transformer_layer,
)

A, T, D, F, H = 11392, 48, 128, 256, 8
SCALE = 0.25


def weights_f32(rng):
    def w(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dtype=jnp.float32)

    return LayerWeights(
        norm_attn=jnp.ones((D,)),
        w_qkv=w(D, 3 * D),
        b_qkv=w(3 * D),
        w_out=w(D, D),
        b_out=w(D),
        norm_mlp=jnp.ones((D,)),
        w_in=w(D, 2 * F),
        b_in=w(2 * F),
        w_ffn_out=w(F, D),
        b_ffn_out=w(D),
    )


def main():
    # reserved-slot signature: (edges, center, cf)
    rng = np.random.default_rng(0)
    weights = weights_f32(rng)
    for dtype in (jnp.bfloat16,):
        edges = jnp.asarray(rng.normal(size=(A, T, D)), dtype=dtype)
        center = jnp.asarray(rng.normal(size=(A, D)), dtype=dtype)
        cf = jnp.ones((A, T), jnp.float32)

        fused = jax.jit(
            lambda e, c, b, w: fused_transformer_layer(e, c, b, w, H, SCALE)
        )
        secs = chain_time(fused, (edges, center, cf, weights))
        report(f"fused layer fwd {dtype.__name__}", secs)

        unfused = jax.jit(
            lambda e, c, b, w: _layer_math(e, c, b, w, H, SCALE)
        )
        secs = chain_time(unfused, (edges, center, cf, weights))
        report(f"unfused XLA layer fwd {dtype.__name__}", secs)

        def grad_fused(e, c, b, w):
            def loss(e, w):
                eo, co = fused_transformer_layer(e, c, b, w, H, SCALE)
                return jnp.sum(eo.astype(jnp.float32)) + jnp.sum(
                    co.astype(jnp.float32)
                )

            return jax.grad(loss, argnums=(0, 1))(e, w)

        secs = chain_time(jax.jit(grad_fused), (edges, center, cf, weights))
        report(f"fused layer fwd+bwd {dtype.__name__}", secs)

        def grad_unfused(e, c, b, w):
            def loss(e, w):
                eo, co = _layer_math(e, c, b, w, H, SCALE)
                return jnp.sum(eo.astype(jnp.float32)) + jnp.sum(
                    co.astype(jnp.float32)
                )

            return jax.grad(loss, argnums=(0, 1))(e, w)

        secs = chain_time(jax.jit(grad_unfused), (edges, center, cf, weights))
        report(f"unfused XLA layer fwd+bwd {dtype.__name__}", secs)


if __name__ == "__main__":
    main()
