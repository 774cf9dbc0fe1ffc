"""Fused window attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.ops.pallas.attention import (
    reference_window_attention,
    window_attention,
)


@pytest.mark.parametrize(
    "A,T,D,H",
    [
        (10, 9, 32, 4),
        (65, 17, 64, 8),
        # T % 8 == 0 -> M-expanded kernel path
        (10, 8, 32, 4),
        (65, 16, 64, 8),
        (20, 48, 128, 8),
    ],
)
def test_forward_matches_reference(A, T, D, H):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    bias = jnp.asarray(
        np.where(rng.random((A, T)) < 0.3, -34.0, rng.normal(size=(A, T))),
        dtype=jnp.float32,
    )
    scale = 1.0 / np.sqrt(D // H)
    out = window_attention(q, k, v, bias, H, scale)
    ref = reference_window_attention(q, k, v, bias, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("A,T,D,H", [(12, 7, 32, 4), (12, 16, 32, 4), (9, 48, 128, 8)])
def test_gradients_match_reference(A, T, D, H):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    bias = jnp.asarray(rng.normal(size=(A, T)), dtype=jnp.float32)
    scale = 0.25
    g = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)

    def loss_fused(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, H, scale) * g)

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference_window_attention(q, k, v, bias, H, scale) * g)

    grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(grads_fused, grads_ref, "qkvb"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("A,T,D,H", [(6, 5, 16, 2), (6, 8, 16, 2), (5, 16, 64, 8)])
def test_double_backward(A, T, D, H):
    """grad-of-grad through the kernel (training with forces)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(A, T, D)), dtype=jnp.float32)
    bias = jnp.asarray(rng.normal(size=(A, T)), dtype=jnp.float32)

    def inner(q):
        out = window_attention(q, k, v, bias, H, 0.5)
        return jnp.sum(out**2)

    def outer(q):
        g = jax.grad(inner)(q)
        return jnp.sum(g**2)

    def outer_ref(q):
        def inner_ref(q):
            return jnp.sum(reference_window_attention(q, k, v, bias, H, 0.5) ** 2)

        return jnp.sum(jax.grad(inner_ref)(q) ** 2)

    gg = jax.grad(outer)(q)
    gg_ref = jax.grad(outer_ref)(q)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref), rtol=1e-3, atol=1e-4)
