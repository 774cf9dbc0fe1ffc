"""Involutive row-permutation primitive with a gather-only transpose.

PET's reversed-edge lookup and the edge-vector position gather both
transpose to duplicate-index scatter-adds under generic autodiff -- ~3x
slower than a gather on TPU (benchmarks/micro_edges.py). Because the
reversal index is an involutive permutation, the true adjoint is the SAME
gather. This module defines ``permute_rows`` as a first-class JAX
primitive with impl / abstract_eval / JVP / transpose / batching rules,
so every transform (grad, jacfwd, jacrev, vmap, jit) works and reverse
mode never materializes a scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir


permute_rows_p = jex_core.Primitive("involutive_permute_rows")


def permute_rows(x, rev):
    """``x[rev]`` for an INVOLUTIVE permutation ``rev`` of axis-0 rows
    (rev[rev] == arange). The transpose under autodiff is the same
    permutation -- a gather, never a scatter."""
    return permute_rows_p.bind(x, rev)


def _impl(x, rev):
    return jnp.take(x, rev, axis=0)


def _abstract_eval(x, rev):
    return x.update(shape=x.shape, dtype=x.dtype)


def _jvp(primals, tangents):
    x, rev = primals
    dx, _ = tangents
    out = permute_rows(x, rev)
    if type(dx) is ad.Zero:
        return out, ad.Zero.from_primal_value(out)
    return out, permute_rows(dx, rev)


def _transpose(ct, x, rev):
    if type(ct) is ad.Zero:
        return ad.Zero.from_primal_value(x), None
    return permute_rows(ct, rev), None


def _batching(args, dims):
    x, rev = args
    xdim, rdim = dims
    if rdim is not None:
        raise NotImplementedError("batched permutation indices")
    # move the batch axis off axis 0, permute, move it back
    x_moved = jnp.moveaxis(x, xdim, -1)
    out = permute_rows(x_moved, rev)
    return jnp.moveaxis(out, -1, xdim), xdim


permute_rows_p.def_impl(_impl)
permute_rows_p.def_abstract_eval(_abstract_eval)
ad.primitive_jvps[permute_rows_p] = _jvp
ad.primitive_transposes[permute_rows_p] = _transpose
batching.primitive_batchers[permute_rows_p] = _batching
mlir.register_lowering(
    permute_rows_p, mlir.lower_fun(_impl, multiple_results=False)
)


# -- NEF-native variant: same involutive edge permutation, but indexed as
# (atom, slot) pairs directly on the (A, M, ...) layout. Avoids the
# (A, M, D) <-> (A*M, D) reshapes around the flat form: with M not a
# multiple of the sublane tile those reshapes are full HBM relayout
# copies under XLA (~0.4 ms each at 10k atoms).

permute_nef_p = jex_core.Primitive("involutive_permute_nef")


def permute_nef(x, rev_i, rev_m):
    """``x[rev_i, rev_m]`` for an involutive permutation of the leading
    (A, M) axes given as separate atom/slot index arrays of shape (A, M).
    The autodiff transpose is the same gather."""
    return permute_nef_p.bind(x, rev_i, rev_m)


def _nef_impl(x, rev_i, rev_m):
    return x[rev_i, rev_m]


def _nef_abstract_eval(x, rev_i, rev_m):
    return x.update(shape=x.shape, dtype=x.dtype)


def _nef_jvp(primals, tangents):
    x, rev_i, rev_m = primals
    dx = tangents[0]
    out = permute_nef(x, rev_i, rev_m)
    if type(dx) is ad.Zero:
        return out, ad.Zero.from_primal_value(out)
    return out, permute_nef(dx, rev_i, rev_m)


def _nef_transpose(ct, x, rev_i, rev_m):
    if type(ct) is ad.Zero:
        return ad.Zero.from_primal_value(x), None, None
    return permute_nef(ct, rev_i, rev_m), None, None


def _nef_batching(args, dims):
    x, rev_i, rev_m = args
    xdim, idim, mdim = dims
    if idim is not None or mdim is not None:
        raise NotImplementedError("batched permutation indices")
    x_moved = jnp.moveaxis(x, xdim, -1)
    out = permute_nef(x_moved, rev_i, rev_m)
    return jnp.moveaxis(out, -1, xdim), xdim


permute_nef_p.def_impl(_nef_impl)
permute_nef_p.def_abstract_eval(_nef_abstract_eval)
ad.primitive_jvps[permute_nef_p] = _nef_jvp
ad.primitive_transposes[permute_nef_p] = _nef_transpose
batching.primitive_batchers[permute_nef_p] = _nef_batching
mlir.register_lowering(
    permute_nef_p, mlir.lower_fun(_nef_impl, multiple_results=False)
)

# -- Neighbor-position gather: ``pos[nbr_indices]`` whose transpose uses
# the edge involution instead of a duplicate-index scatter-add. The
# reversed slot's CENTER equals ``nbr_indices[i, m]`` (padded slots
# self-map and carry zero cotangents), so the exact adjoint is
# ``dpos[p] = sum_m ct[reverse(p, m)]``: a gather + window sum (~2x
# faster than the scatter on TPU, benchmarks/micro_m48.py).

nbr_gather_p = jex_core.Primitive("involutive_nbr_gather")


def nbr_gather(pos, nbr_indices, nbr_reverse):
    """``pos[nbr_indices]`` (A, ...) -> (A, M, ...) with a scatter-free
    transpose via the involutive edge-reversal index ``nbr_reverse``
    (flat indices into A*M; padded slots self-referencing)."""
    return nbr_gather_p.bind(pos, nbr_indices, nbr_reverse)


def _nbr_impl(pos, nbr_indices, nbr_reverse):
    return jnp.take(pos, nbr_indices, axis=0)


def _nbr_abstract_eval(pos, nbr_indices, nbr_reverse):
    return pos.update(
        shape=nbr_indices.shape + pos.shape[1:], dtype=pos.dtype
    )


def _nbr_jvp(primals, tangents):
    pos, idx, rev = primals
    dpos = tangents[0]
    out = nbr_gather(pos, idx, rev)
    if type(dpos) is ad.Zero:
        return out, ad.Zero.from_primal_value(out)
    return out, nbr_gather(dpos, idx, rev)


def _nbr_transpose(ct, pos, idx, rev):
    if type(ct) is ad.Zero:
        return ad.Zero.from_primal_value(pos), None, None
    A, M = idx.shape
    flat = ct.reshape((A * M,) + ct.shape[2:])
    rev_ct = permute_rows(flat, rev.reshape(-1)).reshape(ct.shape)
    return jnp.sum(rev_ct, axis=1), None, None


def _nbr_batching(args, dims):
    pos, idx, rev = args
    pdim, idim, rdim = dims
    if idim is not None or rdim is not None:
        raise NotImplementedError("batched gather indices")
    pos_moved = jnp.moveaxis(pos, pdim, -1)  # batch axis trailing
    out = nbr_gather(pos_moved, idx, rev)  # (A, M, ..., B)
    return out, out.ndim - 1


nbr_gather_p.def_impl(_nbr_impl)
nbr_gather_p.def_abstract_eval(_nbr_abstract_eval)
ad.primitive_jvps[nbr_gather_p] = _nbr_jvp
ad.primitive_transposes[nbr_gather_p] = _nbr_transpose
batching.primitive_batchers[nbr_gather_p] = _nbr_batching
mlir.register_lowering(
    nbr_gather_p, mlir.lower_fun(_nbr_impl, multiple_results=False)
)
