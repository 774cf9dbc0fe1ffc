"""Generic fused row-block ops (Pallas TPU).

Many PET stages are "apply a small MLP stack to every row of a big
(A, ...) array" -- edge compression, the combination MLP, readout heads.
Under XLA each Dense/norm/concat round-trips hundreds of MB of HBM;
here the whole stage runs per block of rows with activations resident in
VMEM, weights resident across the grid.

``fused_rowblock(math_fn, inputs, weights)``:

- ``inputs``: tuple of arrays with a shared leading row dim A (blocked);
- ``weights``: pytree of small arrays (replicated to every block);
- ``math_fn(inputs_block, weights) -> tuple of outputs`` where every
  output keeps the block's leading row dim. Must be shape-polymorphic in
  the block size and pure jnp (it is traced inside the kernel AND used
  as the XLA fallback/reference).

Backward: a second kernel recomputes the block and pulls the cotangent
back via ``jax.vjp`` of the same math; weight gradients accumulate in
f32 across the sequential grid, and are skipped entirely when traced
under ``ops.inference.no_param_grads()`` (inference force calls).
Grad-of-grad differentiates a pure-XLA replay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_block(n: int) -> int:
    return max(n // 8 * 8, 8)


def _pick_block_rows(inputs, outputs_shapes, backward: bool) -> int:
    """Rows per block from a ~4 MB activation budget (double-buffered IO
    and vjp temporaries push actual use to a few x this).

    Prefers the largest block that DIVIDES the row count: a divisible
    grid needs no row padding, and each pad/slice of an (A, M, D) array
    is a full HBM copy (~0.4 ms at bench shape)."""
    A = inputs[0].shape[0]
    bytes_per_row = 0
    for x in inputs:
        bytes_per_row += int(x.nbytes // max(x.shape[0], 1))
    for s in outputs_shapes:
        per = jnp.dtype(s.dtype).itemsize
        for d in s.shape[1:]:
            per *= d
        bytes_per_row += int(per)
    budget = 4 * 1024 * 1024 // (3 if backward else 1)
    rows = _round_block(min(max(budget // max(bytes_per_row, 1), 8), 2048))
    for b in range(rows, 7, -8):
        if A % b == 0:
            return b
    return rows


def _pad_rows(x, rows):
    pad = (-x.shape[0]) % rows
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _block_spec(x, rows):
    ndim = x.ndim
    return pl.BlockSpec(
        (rows,) + x.shape[1:],
        (lambda i, _n=ndim: (i,) + (0,) * (_n - 1)),
        memory_space=pltpu.VMEM,
    )


def _full_spec(w):
    ndim = w.ndim
    return pl.BlockSpec(
        w.shape, (lambda i, _n=ndim: (0,) * _n), memory_space=pltpu.VMEM
    )


_COMPILER = functools.partial(pltpu.CompilerParams, vmem_limit_bytes=100 * 1024 * 1024)


def _forward_impl(math_fn, inputs, weights):
    A = inputs[0].shape[0]
    w_leaves, w_treedef = jax.tree_util.tree_flatten(weights)

    out_shapes = jax.eval_shape(
        lambda ins, w: tuple(math_fn(ins, w)), inputs, weights
    )
    rows = _pick_block_rows(inputs, out_shapes, backward=False)
    inputs_p = tuple(_pad_rows(x, rows) for x in inputs)
    A_p = inputs_p[0].shape[0]

    def kernel(*refs):
        in_refs = refs[: len(inputs)]
        wrefs = refs[len(inputs) : len(inputs) + len(w_leaves)]
        out_refs = refs[len(inputs) + len(w_leaves) :]
        w = jax.tree_util.tree_unflatten(w_treedef, [r[:] for r in wrefs])
        outs = math_fn(tuple(r[:] for r in in_refs), w)
        for ref, val in zip(out_refs, outs):
            ref[:] = val.astype(ref.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(A_p // rows,),
        in_specs=[_block_spec(x, rows) for x in inputs_p]
        + [_full_spec(w) for w in w_leaves],
        out_specs=tuple(
            _block_spec(jnp.empty((rows,) + s.shape[1:], s.dtype), rows)
            for s in out_shapes
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((A_p,) + s.shape[1:], s.dtype)
            for s in out_shapes
        ),
        compiler_params=_COMPILER(dimension_semantics=("parallel",)),
        interpret=_use_interpret(),
    )(*inputs_p, *w_leaves)
    return tuple(o[:A] for o in outs)


_FWD_OPS = {}
_BWD_OPS = {}

# math_fn -> bwd_fn(inputs, weights, g, weight_grads) returning
# (d_inputs tuple, d_weight_leaves list, [] when weight_grads=False).
# Hand-written backwards avoid jax.vjp's f32-promoted cotangent matmuls
# (3-6 MXU passes each in bf16 runs); registered via register_bwd.
_HANDWRITTEN_BWD = {}


def register_bwd(math_fn, bwd_fn):
    """Register a hand-written backward for ``math_fn`` (used inside the
    backward kernel instead of tracing ``jax.vjp``; the grad-of-grad
    replay still differentiates the autodiff reference). ``bwd_fn`` must
    compute the same mathematical function as ``jax.vjp(math_fn)``
    (asserted by tests) and be pure-jnp Mosaic-lowerable."""
    _HANDWRITTEN_BWD[math_fn] = bwd_fn


def fused_rowblock(math_fn, inputs, weights):
    """Run ``math_fn`` over row blocks as one fused TPU kernel.

    :param math_fn: module-level pure function (hashable identity; used
        as the jit cache key).
    :param inputs: tuple of (A, ...) arrays.
    :param weights: pytree of block-invariant arrays.
    :return: tuple of (A, ...) outputs.
    """
    if math_fn not in _FWD_OPS:
        _FWD_OPS[math_fn] = _make_op(math_fn)
    return _FWD_OPS[math_fn](tuple(inputs), weights)


def _make_op(math_fn):
    @jax.custom_vjp
    def op(inputs, weights):
        return _forward_impl(math_fn, inputs, weights)

    def op_fwd(inputs, weights):
        return op(inputs, weights), (inputs, weights)

    def op_bwd(residuals, g):
        from ..inference import param_grads_needed

        inputs, weights = residuals
        weight_grads = param_grads_needed()
        key = (math_fn, weight_grads)
        if key not in _BWD_OPS:
            _BWD_OPS[key] = _make_bwd_op(math_fn, weight_grads)
        d_inputs, d_weights = _BWD_OPS[key](inputs, weights, g)
        if not weight_grads:
            d_weights = jax.tree_util.tree_map(jnp.zeros_like, weights)
        return d_inputs, d_weights

    op.defvjp(op_fwd, op_bwd)
    return op


def _bwd_math_reference(math_fn, inputs, weights, g):
    handwritten = _HANDWRITTEN_BWD.get(math_fn)
    if handwritten is not None:
        # lean replay for grad-of-grad (same function as autodiff;
        # compute-dtype matmuls)
        d_inputs, d_w_leaves = handwritten(inputs, weights, g, True)
        d_weights = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(weights),
            [x.astype(jnp.float32) for x in d_w_leaves],
        )
        return tuple(d_inputs), d_weights

    def f(ins, w):
        return tuple(math_fn(ins, w))

    _, vjp = jax.vjp(f, inputs, weights)
    d_inputs, d_weights = vjp(tuple(g))
    d_weights = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), d_weights
    )
    return d_inputs, d_weights


def _make_bwd_op(math_fn, weight_grads):
    @jax.custom_vjp
    def bwd_op(inputs, weights, g):
        A = inputs[0].shape[0]
        w_leaves, w_treedef = jax.tree_util.tree_flatten(weights)
        out_shapes = jax.eval_shape(
            lambda ins, w: tuple(math_fn(ins, w)), inputs, weights
        )
        rows = _pick_block_rows(inputs, out_shapes, backward=True)
        inputs_p = tuple(_pad_rows(x, rows) for x in inputs)
        g_p = tuple(_pad_rows(x, rows) for x in g)
        A_p = inputs_p[0].shape[0]
        n_in, n_w = len(inputs), len(w_leaves)

        def kernel(*refs):
            in_refs = refs[:n_in]
            wrefs = refs[n_in : n_in + n_w]
            g_refs = refs[n_in + n_w : n_in + n_w + len(g_p)]
            din_refs = refs[n_in + n_w + len(g_p) : 2 * n_in + n_w + len(g_p)]
            dw_refs = refs[2 * n_in + n_w + len(g_p) :]

            w = jax.tree_util.tree_unflatten(
                w_treedef, [r[:] for r in wrefs]
            )
            ins = tuple(r[:] for r in in_refs)
            cot = tuple(r[:] for r in g_refs)

            handwritten = _HANDWRITTEN_BWD.get(math_fn)
            if handwritten is not None:
                d_ins, d_w_leaves = handwritten(ins, w, cot, weight_grads)
            elif weight_grads:
                def f(ins, w):
                    return tuple(math_fn(ins, w))

                _, vjp = jax.vjp(f, ins, w)
                d_ins, d_w = vjp(cot)
                d_w_leaves = jax.tree_util.tree_leaves(d_w)
            else:
                def f(ins):
                    return tuple(math_fn(ins, w))

                _, vjp = jax.vjp(f, ins)
                (d_ins,) = vjp(cot)
                d_w_leaves = []

            for ref, val in zip(din_refs, d_ins):
                ref[:] = val.astype(ref.dtype)

            is_first = pl.program_id(0) == 0
            for ref, val in zip(dw_refs, d_w_leaves):
                val32 = val.astype(jnp.float32)

                @pl.when(is_first)
                def _(ref=ref, val32=val32):
                    ref[:] = val32

                @pl.when(jnp.logical_not(is_first))
                def _(ref=ref, val32=val32):
                    ref[:] = ref[:] + val32

        dw_specs = [_full_spec(w) for w in w_leaves] if weight_grads else []
        dw_shapes = (
            [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_leaves]
            if weight_grads
            else []
        )
        outs = pl.pallas_call(
            kernel,
            grid=(A_p // rows,),
            in_specs=[_block_spec(x, rows) for x in inputs_p]
            + [_full_spec(w) for w in w_leaves]
            + [_block_spec(x, rows) for x in g_p],
            out_specs=tuple(
                [_block_spec(x, rows) for x in inputs_p] + dw_specs
            ),
            out_shape=tuple(
                [
                    jax.ShapeDtypeStruct(x.shape, x.dtype)
                    for x in inputs_p
                ]
                + dw_shapes
            ),
            compiler_params=_COMPILER(
                dimension_semantics=(
                    ("arbitrary",) if weight_grads else ("parallel",)
                )
            ),
            interpret=_use_interpret(),
        )(*inputs_p, *w_leaves, *g_p)
        d_inputs = tuple(o[:A] for o in outs[: len(inputs)])
        if weight_grads:
            d_weights = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(weights), list(outs[len(inputs) :])
            )
        else:
            d_weights = jax.tree_util.tree_map(jnp.zeros_like, weights)
        return d_inputs, d_weights

    def bwd_op_fwd(inputs, weights, g):
        return bwd_op(inputs, weights, g), (inputs, weights, g)

    def bwd_op_bwd(residuals, cotangents):
        inputs, weights, g = residuals
        # rematerialized second-order replay (see fused_layer.bwd_op_bwd)
        replay = jax.checkpoint(
            lambda ins, w, g: _bwd_math_reference(math_fn, ins, w, g)
        )
        _, vjp = jax.vjp(replay, inputs, weights, g)
        return vjp(cotangents)

    bwd_op.defvjp(bwd_op_fwd, bwd_op_bwd)
    return bwd_op


def reference_rowblock(math_fn, inputs, weights):
    """Pure-XLA reference of the same math (tests / non-TPU fallback)."""
    return tuple(math_fn(tuple(inputs), weights))
