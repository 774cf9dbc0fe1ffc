"""Isolate the W8A8 fused-layer kernels vs bf16 at the bench shape.

The r5 bench A/B measured qside+grouped+i8s LOSING by ~3.2 ms/call when
the static-scale design predicted a ~3 ms win. This micro times the
fused layer fwd and bwd kernels alone (bench geometry: A=11008, M=48,
D=128, H=8, d_ff=256) to locate the loss: the int8 kernels themselves,
or interactions elsewhere in the call.

Run: python benchmarks/micro_w8a8.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time  # noqa: E402

from metatrain_tpu.ops.pallas.fused_layer import (  # noqa: E402
    Int8Calib,
    LayerWeights,
    _forward_impl,
    _make_bwd_op,
)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    A, M, D, H, F = 11008, 48, 128, 8, 256
    scale = 1.0 / (16**0.5)
    rng = np.random.default_rng(0)

    def mk(shape, s=0.5):
        return jnp.asarray(rng.normal(0, s, size=shape), jnp.float32)

    w = LayerWeights(
        norm_attn=jnp.ones((D,)),
        w_qkv=mk((D, 3 * D), 0.08),
        b_qkv=mk((3 * D,), 0.02),
        w_out=mk((D, D), 0.08),
        b_out=mk((D,), 0.02),
        norm_mlp=jnp.ones((D,)),
        w_in=mk((D, 2 * F), 0.08),
        b_in=mk((2 * F,), 0.02),
        w_ffn_out=mk((F, D), 0.08),
        b_ffn_out=mk((D,), 0.02),
    )
    edges = jnp.asarray(rng.normal(size=(A, M, D)), jnp.bfloat16)
    center = jnp.asarray(rng.normal(size=(A, D)), jnp.bfloat16)
    cf = jnp.asarray(rng.uniform(0.1, 1.0, size=(A, M)), jnp.float32)
    g_edge = jnp.asarray(rng.normal(size=(A, M, D)), jnp.bfloat16)
    g_center = jnp.asarray(rng.normal(size=(A, D)), jnp.bfloat16)

    calib = Int8Calib(
        normed=8.0, q=6.0, k=6.0, h_norm=8.0, ffn_h=6.0,
        w_q=0.4, w_k=0.4, w_v=0.4, w_in=0.4, w_fo=0.4,
    )

    def fwd_bf16(e):
        return _forward_impl(e, center, cf, w, H, scale, None)[0]

    def fwd_i8(e):
        return _forward_impl(e, center, cf, w, H, scale, calib)[0]

    for name, fn in (("fwd bf16", fwd_bf16), ("fwd w8a8", fwd_i8)):
        secs = chain_time(fn, (edges,), n1=5, n2=25)
        print(f"{name}: {secs*1e3:.3f} ms", flush=True)

    bwd_bf = _make_bwd_op(H, scale, weight_grads=False, int8=False, calib=None)
    bwd_i8 = _make_bwd_op(H, scale, weight_grads=False, int8=False,
                          calib=calib)

    def run_bwd(op):
        def f(ge):
            return op(edges, center, cf, w, ge, g_center)[0]
        return f

    for name, op in (("bwd bf16", bwd_bf), ("bwd w8a8", bwd_i8)):
        secs = chain_time(run_bwd(op), (g_edge,), n1=5, n2=25)
        print(f"{name}: {secs*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
