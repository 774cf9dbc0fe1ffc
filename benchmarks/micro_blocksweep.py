"""Sweep the fused-layer kernel block size (atoms per grid step) on the
real TPU, fwd and fwd+bwd, at the bench shape. Picks the production
``_block_atoms`` values. (New reserved-slot signature.)"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

from metatrain_tpu.ops.pallas import fused_layer as fl  # noqa: E402
from metatrain_tpu.ops.pallas.fused_layer import LayerWeights  # noqa: E402

A, M, D, F, H = 11520, 48, 128, 256, 8
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
    rng = np.random.default_rng(0)
    weights = weights_f32(rng)
    dtype = jnp.bfloat16
    edges = jnp.asarray(rng.normal(size=(A, M, D)), dtype=dtype)
    center = jnp.asarray(rng.normal(size=(A, D)), dtype=dtype)
    cf = jnp.ones((A, M), jnp.float32)

    for ba_f in (8, 16, 32, 64, 128, 256):
        fl._BWD_OPS.clear()
        orig = fl._block_atoms
        fl._block_atoms = lambda T_, backward=False, _b=ba_f: _b
        try:
            fused = jax.jit(
                lambda e, c, b, w: fl.fused_transformer_layer(
                    e, c, b, w, H, SCALE
                )
            )
            secs = chain_time(fused, (edges, center, cf, weights))
            report(f"fwd BA={ba_f}", secs)
        except Exception as e:  # noqa: BLE001
            print(f"fwd BA={ba_f}: FAILED {type(e).__name__}: {str(e)[:120]}")
        finally:
            fl._block_atoms = orig

    from metatrain_tpu.ops import inference

    for ba_b in (8, 16, 32, 64, 128):
        fl._BWD_OPS.clear()
        orig = fl._block_atoms
        fl._block_atoms = lambda T_, backward=False, _b=ba_b: _b
        try:
            def loss(e, c, b, w):
                eo, co = fl.fused_transformer_layer(e, c, b, w, H, SCALE)
                return jnp.sum(eo.astype(jnp.float32)) + jnp.sum(
                    co.astype(jnp.float32)
                )

            with inference.no_param_grads():
                g = jax.jit(jax.grad(loss, argnums=(0, 1)))
                g(edges, center, cf, weights)
            secs = chain_time(
                lambda e, c, b, w: g(e, c, b, w)[0],
                (edges, center, cf, weights),
            )
            report(f"fwd+bwd(no dW) BA={ba_b}", secs)
        except Exception as e:  # noqa: BLE001
            print(f"bwd BA={ba_b}: FAILED {type(e).__name__}: {str(e)[:120]}")
        finally:
            fl._block_atoms = orig


if __name__ == "__main__":
    main()
