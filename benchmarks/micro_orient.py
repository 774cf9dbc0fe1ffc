"""Compare MXU orientations of the window-attention core at the bench
shape (T=48, D=128, H=8, A~11k), inside Pallas kernels with the fused
layer's block structure.

The current fused-layer attention (ops/pallas/fused_layer.py:
_window_attention_block) computes scores TRANSPOSED, (BA, T_keys, H*T):
the score matmul streams only T=48 rows per window, paying the MXU
pipeline-fill per batched instance (~50 TF/s measured). Streaming the
expanded H*T=384-row operand instead should reach ~(384/(384+fill))
utilization. This micro measures:

  cur    : kq-transposed mexp (production)
  m384   : scores = q_exp @ k^T (BA, H*T, T) - softmax over minor T -
           AV streams weights rows (M=H*T)
  m384t  : scores = q_exp @ k^T, then VMEM-transpose to (T, H*T) for the
           lane-packed softmax, AV as production
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

from metatrain_tpu.ops.pallas.attention import _fold_heads  # noqa: E402
from metatrain_tpu.ops.pallas.fused_layer import (  # noqa: E402
    _expand_heads_scaled,
    _window_attention_block,
)

A, T, D, H = 11392, 48, 128, 8
SCALE = 1.0 / jnp.sqrt(16.0)
# useful score+AV flops (true math, per-head 16-dim)
TRUE = 2 * A * T * T * 16 * H * 2


def _core_cur(q, k, v, cf):
    return _window_attention_block(q, k, v, cf, H, float(SCALE))


def _core_m384(q, k, v, cf):
    BA, T_, D_ = q.shape
    head_dim = D_ // H
    acc = jnp.float32
    q_exp = _expand_heads_scaled(q, H, head_dim, float(SCALE))  # (BA, HT, D)
    scores = jax.lax.dot_general(
        q_exp,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=acc,
    )  # (BA, H*T, T_keys)  --- streams H*T rows
    e = jnp.exp(scores)
    w = e * cf.astype(acc)[:, None, :]
    denom = jnp.sum(w, axis=-1, keepdims=True)
    weights = (w / denom).astype(v.dtype)  # (BA, HT, T)
    out_exp = jax.lax.dot_general(
        weights,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc,
    )  # (BA, HT, D) --- streams H*T rows
    return _fold_heads(out_exp, H, T_, head_dim).astype(q.dtype)


def _core_m384t(q, k, v, cf):
    BA, T_, D_ = q.shape
    head_dim = D_ // H
    acc = jnp.float32
    cf_acc = cf.astype(acc)
    q_exp = _expand_heads_scaled(q, H, head_dim, float(SCALE))
    scores = jax.lax.dot_general(
        q_exp,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=acc,
    )  # (BA, HT, T)
    scores_t = jnp.swapaxes(scores, 1, 2)  # (BA, T, HT) VMEM transpose
    e = jnp.exp(scores_t)
    denom = jax.lax.dot_general(
        cf_acc[:, None, :],
        e,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc,
    )  # (BA, 1, HT)
    weights = (e / denom).astype(v.dtype)
    v_cf = v * cf[:, :, None].astype(v.dtype)
    out_exp = jax.lax.dot_general(
        weights,
        v_cf,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=acc,
    )  # (BA, HT, D)
    return _fold_heads(out_exp, H, T_, head_dim).astype(q.dtype)


def make_kernel(core, BA):
    def kern(q_ref, k_ref, v_ref, cf_ref, out_ref):
        out_ref[:] = core(q_ref[:], k_ref[:], v_ref[:], cf_ref[:])

    spec3 = pl.BlockSpec((BA, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((BA, T), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, k, v, cf):
        return pl.pallas_call(
            kern,
            grid=(A // BA,),
            in_specs=[spec3, spec3, spec3, spec2],
            out_specs=spec3,
            out_shape=jax.ShapeDtypeStruct((A, T, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, k, v, cf)

    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (A, T, D), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (A, T, D), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (A, T, D), dtype)
    cf = jnp.ones((A, T), jnp.float32) * 0.9

    cores = {"cur": _core_cur, "m384": _core_m384, "m384t": _core_m384t}
    outs = {}
    for name, core in cores.items():
        for BA in (32, 64, 128):
            fn = make_kernel(core, BA)
            outs[name] = fn(q, k, v, cf)
            secs = chain_time(fn, (q, k, v, cf))
            report(f"attn core {name} BA={BA}", secs, TRUE)
    # parity
    ref = outs["cur"].astype(jnp.float32)
    for name in ("m384", "m384t"):
        err = jnp.max(jnp.abs(outs[name].astype(jnp.float32) - ref))
        print(f"max |{name} - cur| = {float(err):.3e}")


if __name__ == "__main__":
    main()
