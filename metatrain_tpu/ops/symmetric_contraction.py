"""Exact MACE symmetric contractions (the paper's B-basis).

Implements the generalized Clebsch-Gordan contraction of the MACE paper
(arXiv:2206.07697, eq. 10-11): degree-``nu`` products of one atom's
A-basis features contracted with *symmetrized* coupling tensors

    B^{nu, L}_{i k eta M} = sum_{d1..dnu} U^{nu, L}_{d1..dnu, eta, M}
                              A_{i k d1} ... A_{i k dnu}

where ``U`` spans an independent basis of the permutation-symmetric,
O(3)-equivariant maps from ``nu`` copies of the feature space (irreps
l = 0..lmax with natural parity (-1)^l) to the output irrep ``(L,
(-1)^L)``. This replaces the reference's dependency on e3nn /
mace-torch's CUDA contraction kernels
(``/root/reference/src/metatrain/experimental/mace/model.py:7-12``) with
precomputed dense U tables driving jnp einsums -- large batched matmuls
that map straight onto the MXU.

Construction of U (host-side, cached):

1. enumerate all left-associative coupling trees
   ``(((l1, l2) -> k2, l3) -> k3, ...) -> L`` over feature orders
   ``l_i <= lmax`` with the parity constraint ``(-1)^{sum l_i} ==
   (-1)^L`` (non-matching trees produce pseudo-tensors, which the MACE
   B-basis discards -- e3nn drops them because the target irreps carry
   natural parity);
2. realize each tree as a dense tensor ``T[d1.., M]`` from the exact
   real-CG tables (``ops/cg.py``);
3. symmetrize over the ``nu!`` permutations of the input axes (the
   product A x A x ... is symmetric, so only the symmetric part of the
   coupling acts);
4. orthonormalize the symmetrized tree tensors (SVD) to an independent
   path basis ``eta = 1..P`` -- this is what makes the parameterization
   *exact* rather than the overcomplete iterated-CG span: each
   independent symmetric coupling appears exactly once, with one weight.

Evaluation follows mace-torch's iterative scheme (contract the weighted
U tensor with A one axis at a time), so peak memory is
``(N, K, D^(nu-1) * (2L+1))``, and every step is a single einsum.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import product as iter_product
from typing import Any, Dict, List, Tuple

import numpy as np

from .cg import real_clebsch_gordan


def _offsets(lmax: int) -> List[int]:
    return [l * l for l in range(lmax + 1)]


def feature_dim(lmax: int) -> int:
    """Flattened dimension of irreps l = 0..lmax: sum (2l+1) = (lmax+1)^2."""
    return (lmax + 1) ** 2


def _tree_tensors(lmax: int, L: int, nu: int) -> List[np.ndarray]:
    """Dense tensors (D,)*nu + (2L+1,) for every parity-allowed coupling
    tree of ``nu`` inputs to output order ``L``."""
    D = feature_dim(lmax)
    off = _offsets(lmax)
    trees: List[np.ndarray] = []

    if nu == 1:
        if L <= lmax:
            T = np.zeros((D, 2 * L + 1))
            for m in range(2 * L + 1):
                T[off[L] + m, m] = 1.0
            trees.append(T)
        return trees

    def couple_chain(ls: Tuple[int, ...], inters: Tuple[int, ...]) -> np.ndarray:
        """Tensor for the chain l1, l2 -> k1; k1, l3 -> k2; ... -> L."""
        # current: (d1..dj, 2k+1)
        cur = np.zeros((2 * ls[0] + 1, 2 * ls[0] + 1))
        np.fill_diagonal(cur, 1.0)  # identity: (d1, m) for the first leg
        k_prev = ls[0]
        for j in range(1, len(ls)):
            k_next = inters[j - 1] if j - 1 < len(inters) else L
            cg = real_clebsch_gordan(k_prev, ls[j], k_next)
            # (..., p) x (p, q, r) -> (..., q, r)
            cur = np.tensordot(cur, cg, axes=([-1], [0]))
            k_prev = k_next
        return cur  # (m1, m2, ..., m_nu, M)

    for ls in iter_product(range(lmax + 1), repeat=nu):
        if (-1) ** sum(ls) != (-1) ** L:
            continue  # pseudo-tensor path: not in the B-basis
        # enumerate intermediate orders k1..k_{nu-2}
        def inter_options(prefix: Tuple[int, ...], depth: int):
            k_prev = ls[0] if depth == 0 else prefix[-1]
            lo, hi = abs(k_prev - ls[depth + 1]), k_prev + ls[depth + 1]
            if depth == nu - 2:  # last coupling must land on L
                if lo <= L <= hi:
                    yield prefix
                return
            for k in range(lo, hi + 1):
                yield from inter_options(prefix + (k,), depth + 1)

        for inters in inter_options((), 0):
            chain = couple_chain(ls, inters)
            if not np.any(chain):
                continue
            # place the (m1..mnu, M) block into the full (D..D, M) tensor
            T = np.zeros((feature_dim(lmax),) * nu + (2 * L + 1,))
            idx = tuple(
                slice(off[l], off[l] + 2 * l + 1) for l in ls
            ) + (slice(None),)
            T[idx] = chain
            trees.append(T)
    return trees


def _symmetrize(T: np.ndarray, nu: int) -> np.ndarray:
    """Average over the nu! permutations of the input axes."""
    from itertools import permutations

    out = np.zeros_like(T)
    count = 0
    for perm in permutations(range(nu)):
        out += np.transpose(T, perm + (nu,))
        count += 1
    return out / count


@lru_cache(maxsize=None)
def u_matrix(lmax: int, L: int, nu: int) -> np.ndarray:
    """Independent symmetric coupling basis ``U[(d,)*nu, eta, 2L+1]``.

    Rows are orthonormal (as flattened tensors); ``eta`` counts the
    independent permutation-symmetric equivariant couplings -- the exact
    path multiplicity of the MACE B-basis at (lmax, L, nu). Shape
    ``(D,)*nu + (P, 2L+1)`` with ``P == 0`` possible (no allowed path).
    """
    D = feature_dim(lmax)
    trees = _tree_tensors(lmax, L, nu)
    if not trees:
        return np.zeros((D,) * nu + (0, 2 * L + 1))
    sym = [_symmetrize(T, nu) for T in trees]
    V = np.stack([t.reshape(-1) for t in sym])  # (n_trees, D^nu*(2L+1))
    # independent orthonormal basis of the row span
    _, s, vt = np.linalg.svd(V, full_matrices=False)
    tol = max(V.shape) * np.finfo(np.float64).eps * (s[0] if len(s) else 1.0)
    P = int(np.sum(s > max(tol, 1e-10)))
    basis = vt[:P]  # (P, D^nu*(2L+1)), orthonormal
    U = basis.reshape((P,) + (D,) * nu + (2 * L + 1,))
    # move path axis before M: (D..D, P, M)
    U = np.moveaxis(U, 0, nu)
    return np.ascontiguousarray(U)


def num_paths(lmax: int, L: int, nu: int) -> int:
    return u_matrix(lmax, L, nu).shape[nu]


def contract_symmetric(
    A: Any,
    weights: Dict[Tuple[int, int], Any],
    lmax: int,
    lmax_out: int,
    correlation: int,
    jnp=None,
):
    """Evaluate the B-basis for every output order L = 0..lmax_out.

    :param A: (N, K, D) natural-parity feature blocks, m-flattened.
    :param weights: ``{(nu, L): (N, P_{nu L}, K)}`` per-node (typically
        per-species-embedded) path weights.
    :returns: ``{L: (N, K, 2L+1)}`` summed over correlation orders.

    Evaluation uses the power-tensor form: the degree-nu monomials
    ``A^{(x) nu}`` (N, K, D^nu) are built once per order (shared across
    every output L) and each (nu, L) reduces to ONE large matmul
    ``(N*K, D^nu) @ (D^nu, P*(2L+1))`` -- ideal MXU shape -- followed by
    a small per-node path-weight contraction. This is mathematically
    identical to mace-torch's iterated axis contraction (U is fully
    symmetric, so contracting all axes against the same A commutes) but
    avoids its (N, K, D^{nu-1}, ...) intermediates.
    """
    if jnp is None:
        import jax.numpy as jnp  # noqa: PLC0415

    N, K, D = A.shape
    acc = jnp.promote_types(jnp.float32, A.dtype)
    A_acc = A.astype(acc)

    # monomial tensors A^{(x)nu}: pow_nu (N, K, D^nu)
    powers: Dict[int, Any] = {1: A_acc}
    for nu in range(2, correlation + 1):
        prev = powers[nu - 1].reshape(N, K, -1)
        powers[nu] = (prev[:, :, :, None] * A_acc[:, :, None, :]).reshape(
            N, K, -1
        )

    out: Dict[int, Any] = {}
    for L in range(lmax_out + 1):
        ML = 2 * L + 1
        total = None
        for nu in range(1, correlation + 1):
            key = (nu, L)
            U = u_matrix(lmax, L, nu)
            P = U.shape[nu]
            if P == 0 or key not in weights:
                continue
            Uf = jnp.asarray(U.reshape(D**nu, P * ML), dtype=acc)
            s = (powers[nu].reshape(N * K, D**nu) @ Uf).reshape(
                N, K, P, ML
            )
            term = jnp.einsum("nkpm,npk->nkm", s, weights[key].astype(acc))
            total = term if total is None else total + term
        if total is not None:
            out[L] = total
    return out
