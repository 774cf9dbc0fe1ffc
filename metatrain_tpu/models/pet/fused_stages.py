"""PET edge-stage math for the fused row-block kernels.

Each function is pure jnp, shape-polymorphic in the leading (edge) dim,
and serves both as the Pallas kernel body (ops/pallas/rowblock.py) and
the XLA fallback -- one set of parameters, two compute paths. The math
reproduces the reference modules exactly (``pet/modules/transformer.py``
compress MLP, ``backend.py`` combination MLP / heads), so parameter trees
stay nn.Dense-compatible and checkpoints are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(x, w, acc):
    return jax.lax.dot_general(
        x,
        w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=acc,
    )


def compress_math(inputs, weights):
    """compress_0 (over concatenated D-wide parts) -> SiLU -> compress_1.

    :param inputs: tuple of (E, D) parts (edge embedding, optional
        neighbor-species embedding, incoming messages); the concat is
        algebraically split into one matmul per part against the matching
        row-slice of ``w0`` -- no (E, 3D) materialization.
    """
    w0, b0, w1, b1 = weights
    acc = jnp.promote_types(jnp.float32, inputs[0].dtype)
    D = inputs[0].shape[-1]
    h = b0.astype(acc)
    for i, part in enumerate(inputs):
        h = h + _dot(part, w0[i * D : (i + 1) * D], acc)
    h = jax.nn.silu(h).astype(inputs[0].dtype)
    out = _dot(h, w1, acc) + b1.astype(acc)
    return (out.astype(inputs[0].dtype),)


def combination_math(inputs, weights):
    """LayerNorm(concat(edges, reversed)) -> Dense(2D) -> SiLU -> Dense(D),
    then the message update ``messages + edges + combined``
    (reference ``backend.py:556-566``)."""
    edges, reversed_edges, messages = inputs
    ln_scale, ln_bias, w0, b0, w1, b1 = weights
    acc = jnp.promote_types(jnp.float32, edges.dtype)

    x = jnp.concatenate([edges, reversed_edges], axis=-1).astype(acc)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    xn = centered * jax.lax.rsqrt(var + 1e-6)
    xn = (xn * ln_scale.astype(acc) + ln_bias.astype(acc)).astype(edges.dtype)

    h = jax.nn.silu(_dot(xn, w0, acc) + b0.astype(acc)).astype(edges.dtype)
    combined = _dot(h, w1, acc) + b1.astype(acc)
    out = messages.astype(acc) + edges.astype(acc) + combined
    return (out.astype(edges.dtype),)


def head_math(inputs, weights):
    """Two-layer SiLU head (reference ``backend.py:171-193``)."""
    (x,) = inputs
    w0, b0, w1, b1 = weights
    acc = jnp.promote_types(jnp.float32, x.dtype)
    h = jax.nn.silu(_dot(x, w0, acc) + b0.astype(acc)).astype(x.dtype)
    h = jax.nn.silu(_dot(h, w1, acc) + b1.astype(acc))
    return (h.astype(x.dtype),)
