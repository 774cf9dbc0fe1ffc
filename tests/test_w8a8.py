"""W8A8 static-int8 fused-layer path: correctness vs the exact math.

The static-scale int8 forward (``ops/pallas/fused_layer._layer_math``
with ``w8a8``) must approximate the exact bf16/f32 layer within int8
quantization error, and the hand-written backward must (a) reproduce
the quantized primal recompute and (b) return straight-through gradients
close to the exact layer's gradients.  Runs the pure-XLA math directly
(no Pallas) so it tests on any backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatrain_tpu.ops.pallas.fused_layer import (
    Int8Calib,
    LayerWeights,
    _layer_bwd_math,
    _layer_math,
    calibrate_from_sow,
    clear_int8_calib,
    get_int8_calib,
    layer_probe_stats,
    quantize_layer_weights,
)


BA, M, D, H, F = 16, 16, 128, 8, 256
SCALE = 1.0 / (D // H) ** 0.5


def _weights(rng):
    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.05, size=shape), jnp.float32)

    return LayerWeights(
        norm_attn=jnp.ones((D,)) + w(D),
        w_qkv=w(D, 3 * D),
        b_qkv=w(3 * D),
        w_out=w(D, D),
        b_out=w(D),
        norm_mlp=jnp.ones((D,)) + w(D),
        w_in=w(D, 2 * F),
        b_in=w(2 * F),
        w_ffn_out=w(F, D),
        b_ffn_out=w(D),
    )


def _inputs(rng, dtype=jnp.float32):
    edges = jnp.asarray(rng.normal(size=(BA, M, D)), dtype)
    center = jnp.asarray(rng.normal(size=(BA, D)), dtype)
    cf = jnp.asarray(rng.uniform(0.2, 1.0, size=(BA, M)), jnp.float32)
    cf = cf.at[:, M - 1].set(1.0)
    return edges, center, cf


def _calib(edges, center, cf, w):
    stats = np.asarray(
        layer_probe_stats(edges, center, cf, w, H, SCALE), np.float64
    )

    def am(x):
        return float(np.max(np.abs(np.asarray(x, np.float64))))

    wq = np.asarray(w.w_qkv)
    return Int8Calib(
        normed=float(stats[0]),
        q=float(stats[1]),
        k=float(stats[2]),
        h_norm=float(stats[3]),
        ffn_h=float(stats[4]),
        w_q=am(wq[:, :D]),
        w_k=am(wq[:, D : 2 * D]),
        w_v=am(wq[:, 2 * D :]),
        w_in=am(w.w_in),
        w_fo=am(w.w_ffn_out),
    )


def test_w8a8_forward_close_to_exact():
    rng = np.random.default_rng(0)
    w = _weights(rng)
    edges, center, cf = _inputs(rng)
    calib = _calib(edges, center, cf, w)
    wi8 = quantize_layer_weights(w, calib)

    e_exact, c_exact = _layer_math(edges, center, cf, w, H, SCALE)
    e_q, c_q = _layer_math(
        edges, center, cf, w, H, SCALE, w8a8=(calib, wi8)
    )
    # int8 quantization noise: a few percent relative, never garbage
    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b**2).mean()) + 1e-12)

    assert rel(e_q, e_exact) < 0.05, rel(e_q, e_exact)
    assert rel(c_q, c_exact) < 0.05, rel(c_q, c_exact)
    # and it must NOT be bit-identical (the quantized path really ran)
    assert not np.allclose(np.asarray(e_q), np.asarray(e_exact))


def test_w8a8_backward_matches_exact_grads():
    rng = np.random.default_rng(1)
    w = _weights(rng)
    edges, center, cf = _inputs(rng)
    calib = _calib(edges, center, cf, w)
    wi8 = quantize_layer_weights(w, calib)
    g_edge = jnp.asarray(rng.normal(size=(BA, M, D)), jnp.float32)
    g_center = jnp.asarray(rng.normal(size=(BA, D)), jnp.float32)

    # exact-layer gradients via autodiff (the straight-through target)
    def f(edges, center, cf):
        eo, co = _layer_math(edges, center, cf, w, H, SCALE)
        return jnp.vdot(eo, g_edge) + jnp.vdot(co, g_center)

    de_ref, dc_ref, dcf_ref = jax.grad(f, argnums=(0, 1, 2))(
        edges, center, cf
    )

    de, dc, dcf, dw = _layer_bwd_math(
        edges, center, cf, w, g_edge, g_center, H, SCALE,
        weight_grads=False, w8a8=(calib, wi8),
    )
    assert dw is None

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b**2).mean()) + 1e-12)

    assert rel(de, de_ref) < 0.08, rel(de, de_ref)
    assert rel(dc, dc_ref) < 0.08, rel(dc, dc_ref)
    assert rel(dcf, dcf_ref) < 0.08, rel(dcf, dcf_ref)


def test_w8a8_bwd_primal_consistency():
    """The bwd recompute must reproduce the quantized fwd's primal values
    exactly: check via the d_cf cotangent, which depends on the quantized
    softmax weights (e) -- feed zero g_edge/g_center: cotangents vanish,
    so instead compare two runs for determinism and the fwd/bwd exp(scores)
    agreement indirectly through a finite-difference-free identity:
    bwd(g) with g built from the quantized fwd's own output must produce
    identical results across calls."""
    rng = np.random.default_rng(2)
    w = _weights(rng)
    edges, center, cf = _inputs(rng)
    calib = _calib(edges, center, cf, w)
    wi8 = quantize_layer_weights(w, calib)
    g_edge = jnp.ones((BA, M, D), jnp.float32)
    g_center = jnp.ones((BA, D), jnp.float32)
    out1 = _layer_bwd_math(
        edges, center, cf, w, g_edge, g_center, H, SCALE,
        weight_grads=False, w8a8=(calib, wi8),
    )
    out2 = _layer_bwd_math(
        edges, center, cf, w, g_edge, g_center, H, SCALE,
        weight_grads=False, w8a8=(calib, wi8),
    )
    for a, b in zip(out1[:3], out2[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibrate_from_sow_roundtrip():
    clear_int8_calib()
    rng = np.random.default_rng(3)
    w = _weights(rng)
    edges, center, cf = _inputs(rng)
    stats = layer_probe_stats(edges, center, cf, w, H, SCALE)
    inter = {"backbone": {"layer_0": {"int8_probe": (stats,)}}}
    params = {
        "backbone": {
            "layer_0": {
                "w_qkv": w.w_qkv,
                "w_in": w.w_in,
                "w_ffn_out": w.w_ffn_out,
            }
        }
    }
    n = calibrate_from_sow(inter, params)
    assert n == 1
    calib = get_int8_calib("backbone/layer_0")
    assert calib is not None
    assert calib.normed == pytest.approx(float(stats[0]))
    assert calib.w_in == pytest.approx(
        float(np.max(np.abs(np.asarray(w.w_in))))
    )
    clear_int8_calib()
