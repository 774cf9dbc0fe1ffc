"""Fused transformer layer kernel vs its XLA math (interpret mode).

Token convention: edges (A, M, D) with the last slot reserved (always
masked); the kernel writes the center token there, so cf[:, -1] must be 1
and edge_out[:, -1] comes back zeroed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.ops.pallas.fused_layer import (
    LayerWeights,
    _forward_impl,
    _layer_math,
    fused_transformer_layer,
)


def _random_weights(rng, D, F):
    def w(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)

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


def _random_inputs(rng, A, M, D):
    edges = jnp.asarray(rng.normal(size=(A, M, D)), dtype=jnp.float32)
    center = jnp.asarray(rng.normal(size=(A, D)), dtype=jnp.float32)
    cf = jnp.asarray(rng.uniform(0.05, 1.0, size=(A, M)), dtype=jnp.float32)
    cf = cf.at[:, -1].set(1.0)  # reserved slot holds the center: factor 1
    cf = cf.at[:, 0].set(0.0)  # one dead edge
    return edges, center, cf


@pytest.mark.parametrize("qside", ["0", "1"])
@pytest.mark.parametrize(
    "A,M,D,F,H",
    [(21, 9, 32, 16, 4), (21, 8, 32, 16, 4), (9, 48, 128, 64, 8)],
)
def test_fused_kernel_matches_math(A, M, D, F, H, qside, monkeypatch):
    # both attention formulations (q-side grouped-AV and kq-transposed
    # mexp) are live configurations: bench.py A/Bs them on hardware
    monkeypatch.setenv("MTT_QSIDE", qside)
    rng = np.random.default_rng(0)
    edges, center, cf = _random_inputs(rng, A, M, D)
    weights = _random_weights(rng, D, F)

    edge_k, center_k = _forward_impl(edges, center, cf, weights, H, 0.3)
    edge_m, center_m = _layer_math(edges, center, cf, weights, H, 0.3)
    np.testing.assert_allclose(
        np.asarray(edge_k), np.asarray(edge_m), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(center_k), np.asarray(center_m), atol=2e-5
    )
    # the reserved slot comes back zeroed
    np.testing.assert_array_equal(np.asarray(edge_k[:, -1, :]), 0.0)


def test_center_slot_equivalence_with_prepended_reference():
    """Center-in-last-slot must equal an independent center-FIRST
    formulation of the same PreLN layer (attention is permutation-
    invariant in the key order; each query row is independent)."""
    rng = np.random.default_rng(3)
    A, M, D, F, H = 7, 8, 32, 16, 4
    hd = D // H
    scale = 0.4
    edges, center, cf = _random_inputs(rng, A, M, D)
    w = _random_weights(rng, D, F)
    edge_m, center_m = _layer_math(edges, center, cf, w, H, scale)

    # independent reference: tokens [center | edges[:, :M-1]], additive
    # log-cutoff bias, plain jnp softmax attention, PreLN/SwiGLU
    tokens = jnp.concatenate([center[:, None, :], edges[:, : M - 1]], 1)
    cfr = jnp.concatenate([cf[:, -1:], cf[:, : M - 1]], 1)

    def rms(x, s):
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + 1e-6) * s

    normed = rms(tokens, w.norm_attn)
    qkv = normed @ w.w_qkv + w.b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(A, M, H, hd)
    kh = k.reshape(A, M, H, hd)
    vh = v.reshape(A, M, H, hd)
    scores = jnp.einsum("athd,auhd->ahtu", qh, kh) * scale
    scores = scores + jnp.log(jnp.clip(cfr, 1e-30, None))[:, None, None, :]
    wts = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("ahtu,auhd->athd", wts, vh).reshape(A, M, D)
    attn_out = attn @ w.w_out + w.b_out
    res = tokens + attn_out
    h = rms(res, w.norm_mlp)
    vg = h @ w.w_in + w.b_in
    val, gate = jnp.split(vg, 2, axis=-1)
    ffn = (val * jax.nn.sigmoid(gate)) @ w.w_ffn_out + w.b_ffn_out
    out = res + ffn

    np.testing.assert_allclose(
        np.asarray(center_m), np.asarray(attn_out[:, 0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(edge_m[:, : M - 1]), np.asarray(out[:, 1:]), atol=1e-5
    )


@pytest.mark.parametrize(
    "A,M,D,F,H", [(10, 7, 16, 8, 2), (10, 8, 16, 8, 2), (26, 16, 64, 32, 8)]
)
def test_fused_layer_gradients_and_double_backward(A, M, D, F, H):
    rng = np.random.default_rng(1)
    edges, center, cf = _random_inputs(rng, A, M, D)
    weights = _random_weights(rng, D, F)

    def loss_fused(edges, center, cf, weights):
        e, c = fused_transformer_layer(edges, center, cf, weights, H, 0.5)
        return jnp.sum(e**2) + jnp.sum(c**2)

    def loss_math(edges, center, cf, weights):
        e, c = _layer_math(edges, center, cf, weights, H, 0.5)
        return jnp.sum(e**2) + jnp.sum(c**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        edges, center, cf, weights
    )
    g_math = jax.grad(loss_math, argnums=(0, 1, 2, 3))(
        edges, center, cf, weights
    )
    for a, b in zip(g_fused[:3], g_math[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
    # weight gradients: accumulated across grid blocks inside the kernel
    for name, a, b in zip(g_fused[3]._fields, g_fused[3], g_math[3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}",
        )

    # grad-of-grad (training with forces through the fused layer)
    def outer(edges):
        g = jax.grad(loss_fused)(edges, center, cf, weights)
        return jnp.sum(g**2)

    gg = jax.grad(outer)(edges)

    def outer_math(edges):
        g = jax.grad(loss_math)(edges, center, cf, weights)
        return jnp.sum(g**2)

    gg_ref = jax.grad(outer_math)(edges)
    np.testing.assert_allclose(
        np.asarray(gg), np.asarray(gg_ref), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("qside", ["0", "1"])
@pytest.mark.parametrize(
    "A,M,D,F,H", [(7, 16, 32, 16, 4), (9, 48, 128, 64, 8)]
)
@pytest.mark.parametrize("weight_grads", [True, False])
def test_handwritten_bwd_matches_vjp(A, M, D, F, H, weight_grads, qside,
                                     monkeypatch):
    """The hand-written backward (_layer_bwd_math) computes the same
    function as jax.vjp of _layer_math, in both attention layouts."""
    monkeypatch.setenv("MTT_QSIDE", qside)
    from metatrain_tpu.ops.pallas.fused_layer import _layer_bwd_math

    rng = np.random.default_rng(11)
    edges, center, cf = _random_inputs(rng, A, M, D)
    w = _random_weights(rng, D, F)
    scale = 0.3
    g_edge = jnp.asarray(rng.normal(size=(A, M, D)), dtype=jnp.float32)
    g_center = jnp.asarray(rng.normal(size=(A, D)), dtype=jnp.float32)

    def f(edges, center, cf, weights):
        return _layer_math(edges, center, cf, weights, H, scale)

    _, vjp = jax.vjp(f, edges, center, cf, w)
    d_edges_r, d_center_r, d_cf_r, dw_r = vjp((g_edge, g_center))

    d_edges, d_center, d_cf, dw = _layer_bwd_math(
        edges, center, cf, w, g_edge, g_center, H, scale, weight_grads
    )
    np.testing.assert_allclose(
        np.asarray(d_edges), np.asarray(d_edges_r), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_center), np.asarray(d_center_r), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_cf), np.asarray(d_cf_r), atol=3e-5, rtol=1e-4
    )
    if weight_grads:
        for name, a, b in zip(dw_r._fields, dw, dw_r):
            np.testing.assert_allclose(
                np.asarray(a),
                np.asarray(b),
                atol=5e-5,
                rtol=5e-4,
                err_msg=f"weight grad {name}",
            )
    else:
        assert dw is None


class TestInt8Scores:
    """int8-quantized score matmuls (MTT_INT8_SCORES=1, bf16 compute).

    Quantization is kernel-internal: the pure-XLA fallback stays exact,
    so these compare against the exact math with a quantization-scale
    tolerance and check the straight-through grad plumbing.
    """

    A, M, D, F, H = 9, 48, 128, 64, 8
    scale = 0.3

    def _setup(self, monkeypatch):
        monkeypatch.setenv("MTT_QSIDE", "1")
        monkeypatch.setenv("MTT_INT8_SCORES", "1")
        rng = np.random.default_rng(5)
        edges, center, cf = _random_inputs(rng, self.A, self.M, self.D)
        w = _random_weights(rng, self.D, self.F)
        to_bf = lambda x: x.astype(jnp.bfloat16)  # noqa: E731
        return to_bf(edges), to_bf(center), cf.astype(jnp.bfloat16), w

    def test_kernel_close_to_exact(self, monkeypatch):
        edges, center, cf = (x for x in self._setup(monkeypatch)[:3])
        edges, center, cf, w = self._setup(monkeypatch)
        edge_k, center_k = _forward_impl(
            edges, center, cf, w, self.H, self.scale
        )
        # exact bf16 math (int8 defaults off in _layer_math)
        edge_m, center_m = _layer_math(edges, center, cf, w, self.H, self.scale)
        err = np.abs(
            np.asarray(edge_k, np.float64) - np.asarray(edge_m, np.float64)
        )
        ref = np.abs(np.asarray(edge_m, np.float64)).mean() + 1e-6
        assert err.mean() / ref < 0.05, (err.mean(), ref)

    def test_int8_math_matches_kernel_and_grads_flow(self, monkeypatch):
        edges, center, cf, w = self._setup(monkeypatch)

        from metatrain_tpu.ops.pallas.fused_layer import _use_int8_scores

        assert _use_int8_scores(jnp.bfloat16)
        assert not _use_int8_scores(jnp.float32)

        # kernel primal == int8 _layer_math (same quantized function)
        edge_k, center_k = _forward_impl(
            edges, center, cf, w, self.H, self.scale
        )
        edge_m, center_m = _layer_math(
            edges, center, cf, w, self.H, self.scale, int8=True
        )
        np.testing.assert_allclose(
            np.asarray(edge_k, np.float32),
            np.asarray(edge_m, np.float32),
            atol=5e-2,  # one bf16 ULP at |x|~4 (kernel block padding)
        )

        # straight-through: same VALUE, exact-path gradients (nonzero)
        def loss_st(edges):
            e, c = _layer_math(
                edges, center, cf, w, self.H, self.scale,
                int8=True, straight_through=True,
            )
            return jnp.sum(e.astype(jnp.float32) ** 2)

        e_st, _ = _layer_math(
            edges, center, cf, w, self.H, self.scale,
            int8=True, straight_through=True,
        )
        np.testing.assert_allclose(
            np.asarray(e_st, np.float32),
            np.asarray(edge_m, np.float32),
            atol=1e-2,
        )
        g = jax.grad(loss_st)(edges)
        assert float(jnp.sum(jnp.abs(g.astype(jnp.float32)))) > 0.0

    def test_custom_vjp_grad_and_gradgrad(self, monkeypatch):
        edges, center, cf, w = self._setup(monkeypatch)

        def loss_fused(edges):
            e, c = fused_transformer_layer(
                edges, center, cf, w, self.H, self.scale
            )
            return jnp.sum(e.astype(jnp.float32) ** 2) + jnp.sum(
                c.astype(jnp.float32) ** 2
            )

        def loss_exact(edges):
            e, c = _layer_math(edges, center, cf, w, self.H, self.scale)
            return jnp.sum(e.astype(jnp.float32) ** 2) + jnp.sum(
                c.astype(jnp.float32) ** 2
            )

        g = jax.grad(loss_fused)(edges)
        g_ref = jax.grad(loss_exact)(edges)
        ref = np.abs(np.asarray(g_ref, np.float64)).mean() + 1e-9
        err = np.abs(
            np.asarray(g, np.float64) - np.asarray(g_ref, np.float64)
        ).mean()
        assert err / ref < 0.1, (err, ref)

        # grad-of-grad flows (straight-through in the replay)
        def outer(edges):
            return jnp.sum(jax.grad(loss_fused)(edges).astype(jnp.float32) ** 2)

        gg = jax.grad(outer)(edges)
        gg_ref = jax.grad(
            lambda e: jnp.sum(
                jax.grad(loss_exact)(e).astype(jnp.float32) ** 2
            )
        )(edges)
        ref = np.abs(np.asarray(gg_ref, np.float64)).mean() + 1e-9
        err = np.abs(
            np.asarray(gg, np.float64) - np.asarray(gg_ref, np.float64)
        ).mean()
        assert err / ref < 0.2, (err, ref)
