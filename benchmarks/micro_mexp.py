"""Time the M-expanded window-attention kernel on the real TPU at the
bench shape (T=48 after sublane-aligned neighbor bucketing)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

from metatrain_tpu.ops.pallas.attention import window_attention  # noqa: E402

A, T, D, H = 11392, 48, 128, 8
TRUE = 2 * A * T * T * D * 2


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for dtype in (jnp.bfloat16, jnp.float32):
        q = jnp.ones((A, T, D), dtype)
        k = jnp.ones((A, T, D), dtype)
        v = jnp.ones((A, T, D), dtype)
        bias = jnp.zeros((A, T), jnp.float32)

        fwd = jax.jit(lambda q, k, v, b: window_attention(q, k, v, b, H, 0.25))
        secs = chain_time(fwd, (q, k, v, bias))
        report(f"mexp fwd T=48 {dtype.__name__}", secs, TRUE)

        def fwd_bwd(q, k, v, b):
            def loss(q, k, v, b):
                return jnp.sum(
                    window_attention(q, k, v, b, H, 0.25).astype(jnp.float32)
                )

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v, b)

        secs = chain_time(jax.jit(fwd_bwd), (q, k, v, bias))
        report(f"mexp fwd+bwd T=48 {dtype.__name__}", secs, 3 * TRUE)


if __name__ == "__main__":
    main()
