"""Fused neighborhood-window attention (Pallas TPU kernel).

PET's hot op is multi-head attention over each atom's neighborhood window
``(A, T, D)`` with a log-cutoff additive bias. A naive XLA lowering
materializes the ``(A, H, T, T)`` score tensor (~640 MB per layer at 10k
atoms) and 5-D head-split layouts with head_dim=16 in the lane dimension
(8x padding waste) -- at 4 GNN layers this OOMs a 16 GB chip.

This kernel keeps everything in VMEM per block of atoms: per head, scores
are computed, biased, softmaxed and contracted against values without
ever touching HBM; q/k/v/out keep the MXU-friendly ``(A, T, 128)`` layout.
The backward pass (custom VJP) recomputes scores flash-attention style
from the saved q/k/v, so residual memory is just the inputs.

Interpret mode runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_atoms(T: int, dtype, backward: bool = False) -> int:
    # VMEM budget with double-buffered pipelining: ~2x(q,k,v[,g]) inputs +
    # (1 or 4) outputs + per-head score temps must stay under the 16 MB
    # scoped limit; the backward kernel has ~2x the live buffers
    if T <= 48:
        return 16 if backward else 32
    if T <= 96:
        return 8 if backward else 16
    return 4 if backward else 8


def _use_mexp(T: int, D: int, num_heads: int) -> bool:
    """The M-expanded kernel needs full-sublane head blocks (T % 8 == 0)
    and an even head split of D."""
    return T % 8 == 0 and D % num_heads == 0


def _block_atoms_mexp(T: int, D: int, num_heads: int, dtype, backward: bool) -> int:
    """Per-window VMEM of the M-expanded kernels is dominated by the
    (H*T, D) expansions and (H*T, T) score tensors; size the atom block to
    a ~5 MB working set (leaving room for Mosaic's double buffering)."""
    itemsize = jnp.dtype(dtype).itemsize
    HT = num_heads * T
    per_window = (
        (4 + (3 if backward else 0)) * T * D * itemsize  # q,k,v,out(+g,dq,dk)
        + (3 if backward else 2) * HT * D * itemsize  # expansions
        + (4 if backward else 3) * HT * T * 4  # scores/exp/weights (f32)
    )
    budget = 5 * 1024 * 1024
    ba = max(budget // max(per_window, 1), 8)
    # the (BA, T) bias block needs BA % 8 == 0 (sublane tiling)
    return int(min(ba, 128)) // 8 * 8


def _head_col_mask(h: int, D: int, head_dim: int, dtype):
    """(1, 1, D) mask selecting head ``h``'s feature columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    return (col // head_dim == h).astype(dtype)


def _expand_heads(x, num_heads: int, head_dim: int):
    """(BA, T, D) -> (BA, H*T, D) with row block h = x masked to head h's
    columns. All slicing is along full sublane blocks (requires T % 8 == 0),
    so Mosaic lowers it without relayouts."""
    D = x.shape[-1]
    return jnp.concatenate(
        [x * _head_col_mask(h, D, head_dim, x.dtype) for h in range(num_heads)],
        axis=1,
    )


def _fold_heads(x_exp, num_heads: int, T: int, head_dim: int):
    """Inverse routing of :func:`_expand_heads` outputs: out[t, d] =
    x_exp[head(d)*T + t, d]."""
    D = x_exp.shape[-1]
    out = x_exp[:, 0:T, :] * _head_col_mask(0, D, head_dim, x_exp.dtype)
    for h in range(1, num_heads):
        out = out + x_exp[:, h * T : (h + 1) * T, :] * _head_col_mask(
            h, D, head_dim, x_exp.dtype
        )
    return out


def _pair_mask(HT: int, T: int, windows_per_row: int):
    """(HT, T) additive mask for window-packed attention: token t' may
    only attend to keys u' of its own sub-window. -1e30 (not -inf: avoids
    exp(-inf - -inf) NaNs) for cross-window entries."""
    if windows_per_row == 1:
        return None
    half = T // windows_per_row
    r = jax.lax.broadcasted_iota(jnp.int32, (HT, T), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (HT, T), 1)
    valid = (r % T) // half == c // half
    return jnp.where(valid, 0.0, -1e30).astype(jnp.float32)


def _attention_fwd_kernel_mexp(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    out_ref,
    *,
    num_heads: int,
    scale: float,
    windows_per_row: int = 1,
):
    """M-expanded window attention: per block of BA windows, ONE batched
    (H*T, D) x (D, T) matmul computes every head's scores (full 128-wide
    contraction, M = H*T large), instead of H tiny head_dim-contraction
    dots. Softmax reduces over the last (lane) axis only; head routing is
    static full-sublane slices. ~12x issued-FLOP inflation, but the MXU
    runs these shapes ~30x faster than the per-head formulation
    (benchmarks/micro_attention.py), a large net win.
    """
    BA, T, D = q_ref.shape
    H = num_heads
    head_dim = D // H

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    bias = bias_ref[:].astype(jnp.float32)  # (BA, T)

    q_exp = _expand_heads(q, H, head_dim)  # (BA, H*T, D)
    scores = jax.lax.dot_general(
        q_exp,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, H*T, T): row h*T+t holds head h's scores for query t
    scores = scores * scale + bias[:, None, :]
    pmask = _pair_mask(H * T, T, windows_per_row)
    if pmask is not None:
        scores = scores + pmask[None]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    # exp lands directly in the compute dtype: the weights feed a
    # same-dtype matmul anyway, and the (BA, H*T, T) tensor is the
    # kernel's dominant VPU stream (no-op for f32/f64)
    exp = jnp.exp(scores).astype(v.dtype)
    denom = jnp.sum(exp.astype(jnp.float32), axis=-1, keepdims=True)
    weights = exp / denom.astype(v.dtype)

    out_exp = jax.lax.dot_general(
        weights,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, H*T, D)
    out_ref[:] = _fold_heads(out_exp, H, T, head_dim).astype(out_ref.dtype)


def _attention_bwd_kernel_mexp(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    dbias_ref,
    *,
    num_heads: int,
    scale: float,
    windows_per_row: int = 1,
):
    """Backward of the M-expanded attention: recomputes the softmax
    (flash-style, no score residuals), then produces every gradient with
    H*T-sized matmuls."""
    BA, T, D = q_ref.shape
    H = num_heads
    head_dim = D // H

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    bias = bias_ref[:].astype(jnp.float32)

    q_exp = _expand_heads(q, H, head_dim)
    scores = jax.lax.dot_general(
        q_exp,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale + bias[:, None, :]
    pmask = _pair_mask(H * T, T, windows_per_row)
    if pmask is not None:
        scores = scores + pmask[None]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    weights = exp / jnp.sum(exp, axis=-1, keepdims=True)  # (BA, H*T, T) f32

    g_exp = _expand_heads(g, H, head_dim)  # (BA, H*T, D)
    # dv[u, d] = sum_{h,t} w[(h,t), u] g[t, d] m_h[d]
    dv = jax.lax.dot_general(
        weights.astype(g_exp.dtype),
        g_exp,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, T, D)
    # dw[(h,t), u] = sum_d g_exp[(h,t), d] v[u, d]
    dw = jax.lax.dot_general(
        g_exp,
        v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, H*T, T)
    ds = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    dbias_ref[:] = jnp.sum(ds, axis=1).astype(dbias_ref.dtype)

    ds_cast = ds.astype(k.dtype)
    # dq[t, d] = scale * sum_h m_h[d] * (ds @ k)[(h,t), d]
    dq_exp = jax.lax.dot_general(
        ds_cast,
        k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, H*T, D)
    dq_ref[:] = (
        _fold_heads(dq_exp, H, T, head_dim) * scale
    ).astype(dq_ref.dtype)
    # dk[u, d] = scale * sum_{h,t} ds[(h,t), u] q[t, d] m_h[d]
    dk = jax.lax.dot_general(
        ds_cast,
        q_exp,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BA, T, D)
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _attention_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, out_ref, *, num_heads: int, scale: float
):
    BA, T, D = q_ref.shape
    head_dim = D // num_heads
    bias = bias_ref[:].astype(jnp.float32)  # (BA, T)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q_h = q_ref[:, :, sl]
        k_h = k_ref[:, :, sl]
        v_h = v_ref[:, :, sl]
        scores = jax.lax.dot_general(
            q_h,
            k_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BA, T, T)
        scores = scores * scale + bias[:, None, :]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        exp = jnp.exp(scores)
        weights = exp / jnp.sum(exp, axis=-1, keepdims=True)
        out_h = jax.lax.dot_general(
            weights.astype(v_h.dtype),
            v_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, sl] = out_h.astype(out_ref.dtype)


def _attention_bwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    dbias_ref,
    *,
    num_heads: int,
    scale: float,
):
    BA, T, D = q_ref.shape
    head_dim = D // num_heads
    bias = bias_ref[:].astype(jnp.float32)
    dbias_acc = jnp.zeros((BA, T), dtype=jnp.float32)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q_h = q_ref[:, :, sl]
        k_h = k_ref[:, :, sl]
        v_h = v_ref[:, :, sl]
        g_h = g_ref[:, :, sl].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q_h,
            k_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale + bias[:, None, :]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        exp = jnp.exp(scores)
        weights = exp / jnp.sum(exp, axis=-1, keepdims=True)  # (BA, T, T)

        # dv = w^T g
        dv_h = jax.lax.dot_general(
            weights,
            g_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dw = g v^T
        dw = jax.lax.dot_general(
            g_h,
            v_h.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # softmax backward: ds = w * (dw - sum_k(dw * w))
        ds = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
        # dq = ds k * scale ; dk = ds^T q * scale
        dq_h = (
            jax.lax.dot_general(
                ds,
                k_h.astype(jnp.float32),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dk_h = (
            jax.lax.dot_general(
                ds,
                q_h.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dq_ref[:, :, sl] = dq_h.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk_h.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv_h.astype(dv_ref.dtype)
        # bias is shared over heads and query positions: sum ds over both
        dbias_acc = dbias_acc + jnp.sum(ds, axis=1)

    dbias_ref[:] = dbias_acc.astype(dbias_ref.dtype)


def _pad_atoms(x, BA):
    A = x.shape[0]
    pad = (-A) % BA
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, A


def _window_packing(T: int, D: int, num_heads: int) -> int:
    """Windows packed per kernel row-block: pairs double the batched-dot
    sizes for free (the lane padding T -> 128 absorbs the second window's
    keys; the (A, T, D) -> (A/2, 2T, D) reshape is layout-identical).

    Measured NEUTRAL on v5e at T=48 (the kernel is VPU/VMEM-bound on the
    f32 score tensors, not on batched-dot issue overhead), so disabled;
    the mechanism is kept (and tested) for shapes where it may win."""
    return 1


def _fwd_impl(q, k, v, bias, num_heads, scale):
    A, T, D = q.shape
    wpr = _window_packing(T, D, num_heads)
    if _use_mexp(T, D, num_heads):
        Tk = wpr * T
        kernel = functools.partial(
            _attention_fwd_kernel_mexp, windows_per_row=wpr
        )
        BA = max(
            _block_atoms_mexp(Tk, D, num_heads, q.dtype, backward=False), 8
        )
    else:
        Tk = T
        kernel = _attention_fwd_kernel
        BA = _block_atoms(T, q.dtype)
    (q_p, _), (k_p, _), (v_p, _) = (
        _pad_atoms(q, BA * wpr),
        _pad_atoms(k, BA * wpr),
        _pad_atoms(v, BA * wpr),
    )
    bias_p, _ = _pad_atoms(bias, BA * wpr)
    A_p = q_p.shape[0]
    if wpr > 1:
        q_p = q_p.reshape(A_p // wpr, Tk, D)
        k_p = k_p.reshape(A_p // wpr, Tk, D)
        v_p = v_p.reshape(A_p // wpr, Tk, D)
        bias_p = bias_p.reshape(A_p // wpr, Tk)
    rows = q_p.shape[0]

    grid = (rows // BA,)
    spec3 = pl.BlockSpec((BA, Tk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((BA, Tk), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads, scale=scale),
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec2],
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct((rows, Tk, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=_use_interpret(),
    )(q_p, k_p, v_p, bias_p)
    if wpr > 1:
        out = out.reshape(A_p, T, D)
    return out[:A]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def window_attention(q, k, v, bias, num_heads: int, scale: float):
    """Fused windowed MHA: softmax(q k^T * scale + bias) v, per head.

    :param q,k,v: (A, T, D) with D = num_heads * head_dim.
    :param bias: (A, T) additive pre-softmax bias (same for all queries
        and heads; the log-cutoff mask).
    :return: (A, T, D).
    """
    return _fwd_impl(q, k, v, bias, num_heads, scale)


def _window_attention_fwd(q, k, v, bias, num_heads, scale):
    # NOTE: recurse through the custom_vjp wrapper (not _fwd_impl) so that
    # higher-order differentiation keeps hitting the custom rules instead
    # of trying to linearize the raw pallas_call.
    out = window_attention(q, k, v, bias, num_heads, scale)
    return out, (q, k, v, bias)


def _bwd_math_reference(q, k, v, bias, g, num_heads, scale):
    """Pure-XLA implementation of the attention backward math; used only
    to differentiate the backward pass itself (grad-of-grad, i.e.
    training with forces in the loss)."""

    def fwd(q, k, v, bias):
        return reference_window_attention(q, k, v, bias, num_heads, scale)

    _, vjp = jax.vjp(fwd, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias.astype(jnp.float32)


def _make_bwd_op(num_heads, scale):
    @jax.custom_vjp
    def bwd_op(q, k, v, bias, g):
        A, T, D = q.shape
        wpr = _window_packing(T, D, num_heads)
        if _use_mexp(T, D, num_heads):
            Tk = wpr * T
            kernel = functools.partial(
                _attention_bwd_kernel_mexp, windows_per_row=wpr
            )
            BA = max(
                _block_atoms_mexp(Tk, D, num_heads, q.dtype, backward=True), 8
            )
        else:
            Tk = T
            kernel = _attention_bwd_kernel
            BA = _block_atoms(T, q.dtype, backward=True)
        (q_p, _), (k_p, _), (v_p, _) = (
            _pad_atoms(q, BA * wpr),
            _pad_atoms(k, BA * wpr),
            _pad_atoms(v, BA * wpr),
        )
        bias_p, _ = _pad_atoms(bias, BA * wpr)
        g_p, _ = _pad_atoms(g, BA * wpr)
        A_p = q_p.shape[0]
        if wpr > 1:
            q_p = q_p.reshape(A_p // wpr, Tk, D)
            k_p = k_p.reshape(A_p // wpr, Tk, D)
            v_p = v_p.reshape(A_p // wpr, Tk, D)
            g_p = g_p.reshape(A_p // wpr, Tk, D)
            bias_p = bias_p.reshape(A_p // wpr, Tk)
        rows = q_p.shape[0]

        grid = (rows // BA,)
        spec3 = pl.BlockSpec(
            (BA, Tk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        spec2 = pl.BlockSpec((BA, Tk), lambda i: (i, 0), memory_space=pltpu.VMEM)

        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(kernel, num_heads=num_heads, scale=scale),
            grid=grid,
            in_specs=[spec3, spec3, spec3, spec2, spec3],
            out_specs=(spec3, spec3, spec3, spec2),
            out_shape=(
                jax.ShapeDtypeStruct((rows, Tk, D), q.dtype),
                jax.ShapeDtypeStruct((rows, Tk, D), k.dtype),
                jax.ShapeDtypeStruct((rows, Tk, D), v.dtype),
                jax.ShapeDtypeStruct((rows, Tk), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=_use_interpret(),
        )(q_p, k_p, v_p, bias_p, g_p)
        if wpr > 1:
            dq = dq.reshape(A_p, T, D)
            dk = dk.reshape(A_p, T, D)
            dv = dv.reshape(A_p, T, D)
            dbias = dbias.reshape(A_p, T)
        return dq[:A], dk[:A], dv[:A], dbias[:A]

    def bwd_op_fwd(q, k, v, bias, g):
        return bwd_op(q, k, v, bias, g), (q, k, v, bias, g)

    def bwd_op_bwd(residuals, cotangents):
        # second-order sweep: differentiate the XLA reference backward
        _, vjp = jax.vjp(
            lambda *args: _bwd_math_reference(*args, num_heads, scale),
            *residuals,
        )
        return vjp(cotangents)

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)
    return bwd_op


_BWD_OPS = {}


def _window_attention_bwd(num_heads, scale, residuals, g):
    q, k, v, bias = residuals
    key = (num_heads, float(scale))
    if key not in _BWD_OPS:
        _BWD_OPS[key] = _make_bwd_op(num_heads, scale)
    dq, dk, dv, dbias = _BWD_OPS[key](q, k, v, bias, g)
    return dq, dk, dv, dbias.astype(bias.dtype)


window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


def reference_window_attention(q, k, v, bias, num_heads: int, scale: float):
    """Pure-XLA reference (tests / fallback)."""
    A, T, D = q.shape
    head_dim = D // num_heads
    acc_dtype = jnp.promote_types(jnp.float32, q.dtype)
    q_h = q.reshape(A, T, num_heads, head_dim).transpose(0, 2, 1, 3)
    k_h = k.reshape(A, T, num_heads, head_dim).transpose(0, 2, 1, 3)
    v_h = v.reshape(A, T, num_heads, head_dim).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "ahqd,ahkd->ahqk", q_h, k_h, preferred_element_type=acc_dtype
    ) * scale
    scores = scores + bias[:, None, None, :].astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "ahqk,ahkd->ahqd", weights, v_h, preferred_element_type=acc_dtype
    )
    return out.transpose(0, 2, 1, 3).reshape(A, T, D).astype(q.dtype)
