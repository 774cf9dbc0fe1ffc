"""Fused transformer layer kernel vs its XLA math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

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


import pytest


@pytest.mark.parametrize(
    "A,T,D,F,H",
    [(21, 9, 32, 16, 4), (21, 8, 32, 16, 4), (9, 48, 128, 64, 8)],
)
def test_fused_kernel_matches_math(A, T, D, F, H):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    cf = jnp.asarray(rng.uniform(0.0, 1.0, size=(A, T)), dtype=jnp.float32)
    cf = cf.at[:, 0].set(1.0).at[:, -1].set(0.0)  # center = 1; a dead edge
    weights = _random_weights(rng, D, F)

    edge_k, center_k = _forward_impl(tokens, cf, weights, H, 0.3)
    edge_m, center_m = _layer_math(tokens, cf, weights, H, 0.3)
    np.testing.assert_allclose(
        np.asarray(edge_k), np.asarray(edge_m), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(center_k), np.asarray(center_m), atol=2e-5
    )


@pytest.mark.parametrize(
    "A,T,D,F,H", [(10, 7, 16, 8, 2), (10, 8, 16, 8, 2), (26, 16, 64, 32, 8)]
)
def test_fused_layer_gradients_and_double_backward(A, T, D, F, H):
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    cf = jnp.asarray(
        rng.uniform(0.05, 1.0, size=(A, T)), dtype=jnp.float32
    ).at[:, 0].set(1.0)
    weights = _random_weights(rng, D, F)

    def loss_fused(tokens, cf, weights):
        e, c = fused_transformer_layer(tokens, cf, weights, H, 0.5)
        return jnp.sum(e**2) + jnp.sum(c**2)

    def loss_math(tokens, cf, weights):
        e, c = _layer_math(tokens, cf, weights, H, 0.5)
        return jnp.sum(e**2) + jnp.sum(c**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(tokens, cf, weights)
    g_math = jax.grad(loss_math, argnums=(0, 1, 2))(tokens, cf, weights)
    for a, b in zip(g_fused[:2], g_math[:2]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
    # weight gradients: accumulated across grid blocks inside the kernel
    for name, a, b in zip(g_fused[2]._fields, g_fused[2], g_math[2]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}",
        )

    # grad-of-grad (training with forces through the fused layer)
    def outer(tokens):
        g = jax.grad(loss_fused)(tokens, cf, weights)
        return jnp.sum(g**2)

    gg = jax.grad(outer)(tokens)
    def outer_math(tokens):
        g = jax.grad(loss_math)(tokens, cf, weights)
        return jnp.sum(g**2)

    gg_ref = jax.grad(outer_math)(tokens)
    np.testing.assert_allclose(
        np.asarray(gg), np.asarray(gg_ref), rtol=1e-3, atol=1e-3
    )
