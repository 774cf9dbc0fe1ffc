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
    xn = centered * jax.lax.rsqrt(var + 1e-5)
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


# ---------------------------------------------------------------------------
# Hand-written backwards (registered with ops/pallas/rowblock.register_bwd):
# same math as jax.vjp of the functions above (parity-tested), but every
# cotangent matmul stays in the compute dtype -- autodiff promotes them to
# f32 (3-6 MXU passes each in bf16 runs). Conventions: d_inputs returned
# in compute dtype; weight-grad leaves in f32; weight_grads=False skips
# the dW matmuls entirely (inference force calls).
# ---------------------------------------------------------------------------


def _dot_t(g, w, acc):
    """Cotangent-side projection ``g @ w.T`` with ``g`` cast to the
    compute dtype of ``w``'s forward operand."""
    return jax.lax.dot_general(
        g,
        w,
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=acc,
    )


def _dot_rows(a, b):
    """Weight gradient ``a.T @ b`` contracted over rows, f32 output."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _silu_grad(pre, sig):
    """d silu(pre) / d pre given sig = sigmoid(pre)."""
    return sig * (1.0 + pre * (1.0 - sig))


def compress_bwd(inputs, weights, g, weight_grads):
    w0, b0, w1, b1 = weights
    cd = inputs[0].dtype
    acc = jnp.promote_types(jnp.float32, cd)
    D = inputs[0].shape[-1]
    w0c, w1c = w0.astype(cd), w1.astype(cd)

    pre = b0.astype(acc)
    for i, part in enumerate(inputs):
        pre = pre + _dot(part, w0c[i * D : (i + 1) * D], acc)
    sig = jax.nn.sigmoid(pre)
    h = (pre * sig).astype(cd)

    (g0,) = g
    g0c = g0.astype(cd)
    d_h = _dot_t(g0c, w1c, acc)
    d_pre = d_h * _silu_grad(pre, sig)
    d_pre_c = d_pre.astype(cd)
    d_inputs = tuple(
        _dot_t(d_pre_c, w0c[i * D : (i + 1) * D], acc).astype(cd)
        for i in range(len(inputs))
    )
    if not weight_grads:
        return d_inputs, []
    dw0 = jnp.concatenate(
        [_dot_rows(part, d_pre_c) for part in inputs], axis=0
    )
    dw = [
        dw0,
        jnp.sum(d_pre, axis=0).astype(jnp.float32),
        _dot_rows(h, g0c),
        jnp.sum(g0.astype(jnp.float32), axis=0),
    ]
    return d_inputs, dw


def combination_bwd(inputs, weights, g, weight_grads):
    edges, reversed_edges, messages = inputs
    ln_scale, ln_bias, w0, b0, w1, b1 = weights
    cd = edges.dtype
    acc = jnp.promote_types(jnp.float32, cd)
    W = edges.shape[-1] + reversed_edges.shape[-1]
    w0c, w1c = w0.astype(cd), w1.astype(cd)

    x = jnp.concatenate([edges, reversed_edges], axis=-1).astype(acc)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + 1e-5)
    xn0 = centered * rs
    xn = (xn0 * ln_scale.astype(acc) + ln_bias.astype(acc)).astype(cd)
    pre0 = _dot(xn, w0c, acc) + b0.astype(acc)
    sig0 = jax.nn.sigmoid(pre0)
    h = (pre0 * sig0).astype(cd)

    (g0,) = g
    g0c = g0.astype(cd)
    d_h = _dot_t(g0c, w1c, acc)
    d_pre0 = d_h * _silu_grad(pre0, sig0)
    d_pre0_c = d_pre0.astype(cd)
    d_xn = _dot_t(d_pre0_c, w0c, acc)  # f32 (E, W)
    d_xn0 = d_xn * ln_scale.astype(acc)
    # layernorm backward: dx = rs*(d - mean(d) - xn0 * mean(d*xn0))
    d_x = rs * (
        d_xn0
        - jnp.mean(d_xn0, axis=-1, keepdims=True)
        - xn0 * jnp.mean(d_xn0 * xn0, axis=-1, keepdims=True)
    )
    De = edges.shape[-1]
    d_edges = (d_x[:, :De] + g0.astype(acc)).astype(cd)
    d_rev = d_x[:, De:].astype(cd)
    d_messages = g0c
    d_inputs = (d_edges, d_rev, d_messages)
    if not weight_grads:
        return d_inputs, []
    dw = [
        jnp.sum((d_xn * xn0).astype(jnp.float32), axis=0),
        jnp.sum(d_xn.astype(jnp.float32), axis=0),
        _dot_rows(xn, d_pre0_c),
        jnp.sum(d_pre0, axis=0).astype(jnp.float32),
        _dot_rows(h, g0c),
        jnp.sum(g0.astype(jnp.float32), axis=0),
    ]
    return d_inputs, dw


def head_bwd(inputs, weights, g, weight_grads):
    (x,) = inputs
    w0, b0, w1, b1 = weights
    cd = x.dtype
    acc = jnp.promote_types(jnp.float32, cd)
    w0c, w1c = w0.astype(cd), w1.astype(cd)

    pre0 = _dot(x, w0c, acc) + b0.astype(acc)
    sig0 = jax.nn.sigmoid(pre0)
    h0 = (pre0 * sig0).astype(cd)
    pre1 = _dot(h0, w1c, acc) + b1.astype(acc)
    sig1 = jax.nn.sigmoid(pre1)

    (g0,) = g
    d_pre1 = g0.astype(acc) * _silu_grad(pre1, sig1)
    d_pre1_c = d_pre1.astype(cd)
    d_h0 = _dot_t(d_pre1_c, w1c, acc)
    d_pre0 = d_h0 * _silu_grad(pre0, sig0)
    d_pre0_c = d_pre0.astype(cd)
    d_x = _dot_t(d_pre0_c, w0c, acc).astype(cd)
    if not weight_grads:
        return (d_x,), []
    dw = [
        _dot_rows(x, d_pre0_c),
        jnp.sum(d_pre0, axis=0).astype(jnp.float32),
        _dot_rows(h0, d_pre1_c),
        jnp.sum(d_pre1, axis=0).astype(jnp.float32),
    ]
    return (d_x,), dw


def _register():
    from ...ops.pallas.rowblock import register_bwd

    register_bwd(compress_math, compress_bwd)
    register_bwd(combination_math, combination_bwd)
    register_bwd(head_math, head_bwd)


_register()
