"""Sweep the fused-layer kernel block size (atoms per grid step) on the
real TPU, fwd and fwd+bwd, at the bench shape. Picks the production
``_block_atoms`` values."""

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
from micro_fused import weights_f32, A, T, D, F, H, SCALE  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    weights = weights_f32(rng)
    dtype = jnp.bfloat16
    tokens = jnp.asarray(rng.normal(size=(A, T, D)), dtype=dtype)
    cf = jnp.ones((A, T), jnp.float32)

    for ba_f in (8, 16, 32, 64, 128, 256):
        fl._BWD_OPS.clear()
        orig = fl._block_atoms
        fl._block_atoms = lambda T_, backward=False, _b=ba_f: _b
        try:
            fused = jax.jit(
                lambda t, b, w: fl.fused_transformer_layer(t, b, w, H, SCALE)
            )
            secs = chain_time(fused, (tokens, cf, weights))
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
            def grad_fused(t, b, w):
                def loss(t):
                    with inference.no_param_grads():
                        e, c = fl.fused_transformer_layer(t, b, w, H, SCALE)
                    return jnp.sum(e.astype(jnp.float32)) + jnp.sum(
                        c.astype(jnp.float32)
                    )

                return jax.grad(loss)(t)

            secs = chain_time(jax.jit(grad_fused), (tokens, cf, weights))
            report(f"fwd+bwd(no dW) BA={ba_b}", secs)
        except Exception as e:  # noqa: BLE001
            print(f"fwd+bwd BA={ba_b}: FAILED {type(e).__name__}: {str(e)[:120]}")
        finally:
            fl._block_atoms = orig


if __name__ == "__main__":
    main()
