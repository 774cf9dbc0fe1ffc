"""Clebsch-Gordan coefficients for real spherical harmonics.

Replaces the reference's Rust ``wigners`` dependency
(``soap_bpnn/modules/tensor_basis.py:10``, SPACE): complex CG coefficients
are computed exactly with the Racah formula (Python fractions), then
transformed to the real-spherical-harmonics basis. Results are cached as
dense ``(2l1+1, 2l2+1, 2L+1)`` numpy tables, loaded once as jnp constants
by the equivariant architectures.

Equivariance property (tested against our Wigner-D matrices):
``(Y^l1 x Y^l2)^L`` built with these tables transforms with ``D^L``.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache
from typing import Dict, Tuple

import numpy as np


@lru_cache(maxsize=None)
def _factorial(n: int) -> int:
    return math.factorial(n)


def clebsch_gordan(
    j1: int, m1: int, j2: int, m2: int, j3: int, m3: int
) -> float:
    """Exact <j1 m1; j2 m2 | j3 m3> via the Racah formula."""
    if m3 != m1 + m2:
        return 0.0
    if not (abs(j1 - j2) <= j3 <= j1 + j2):
        return 0.0
    if abs(m1) > j1 or abs(m2) > j2 or abs(m3) > j3:
        return 0.0

    f = _factorial
    prefactor_sq = (
        Fraction(2 * j3 + 1)
        * Fraction(f(j3 + j1 - j2) * f(j3 - j1 + j2) * f(j1 + j2 - j3), f(j1 + j2 + j3 + 1))
        * Fraction(
            f(j3 + m3) * f(j3 - m3),
            f(j1 - m1) * f(j1 + m1) * f(j2 - m2) * f(j2 + m2),
        )
    )

    total = Fraction(0)
    for k in range(0, j3 + j2 + m1 + 1):
        denominators = [
            j3 - j1 + j2 - k,
            j3 + m3 - k,
            k,
            j1 - j2 - m3 + k,
        ]
        if any(d < 0 for d in denominators):
            continue
        numerator_args = [j2 + j3 + m1 - k, j1 - m1 + k]
        if any(a < 0 for a in numerator_args):
            continue
        term = Fraction(
            f(numerator_args[0]) * f(numerator_args[1]),
            f(denominators[0]) * f(denominators[1]) * f(denominators[2]) * f(denominators[3]),
        )
        total += (-1) ** (k + j2 + m2) * term

    if total == 0:
        return 0.0
    sign = 1.0 if total > 0 else -1.0
    return sign * math.sqrt(float(prefactor_sq)) * abs(float(total))


def _real_to_complex_matrix(l: int) -> np.ndarray:
    """U with Y_complex = U @ Y_real (Condon-Shortley convention matching
    our real SH: m>0 ~ cos, m<0 ~ sin)."""
    dim = 2 * l + 1
    U = np.zeros((dim, dim), dtype=np.complex128)
    sqrt2_inv = 1.0 / math.sqrt(2.0)
    for m in range(-l, l + 1):
        row = m + l
        if m == 0:
            U[row, l] = 1.0
        elif m > 0:
            # Y_l^m = (-1)^m (Y_{real,m} + i Y_{real,-m}) / sqrt(2)
            U[row, m + l] = (-1) ** m * sqrt2_inv
            U[row, -m + l] = 1j * (-1) ** m * sqrt2_inv
        else:  # m < 0
            am = -m
            # Y_l^{-am} = (Y_{real,am} - i Y_{real,-am}) / sqrt(2)
            U[row, am + l] = sqrt2_inv
            U[row, -am + l] = -1j * sqrt2_inv
    return U


@lru_cache(maxsize=None)
def real_clebsch_gordan(l1: int, l2: int, L: int) -> np.ndarray:
    """Real-basis CG table C[m1, m2, M] with shape (2l1+1, 2l2+1, 2L+1).

    Defined so that if u transforms with D^{l1} and v with D^{l2}, then
    ``w_M = sum_{m1 m2} C[m1, m2, M] u_{m1} v_{m2}`` transforms with D^L.
    Tables are real up to a global phase, which is fixed so the result is
    purely real.
    """
    complex_cg = np.zeros(
        (2 * l1 + 1, 2 * l2 + 1, 2 * L + 1), dtype=np.float64
    )
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            m3 = m1 + m2
            if abs(m3) <= L:
                complex_cg[m1 + l1, m2 + l2, m3 + L] = clebsch_gordan(
                    l1, m1, l2, m2, L, m3
                )

    u1 = _real_to_complex_matrix(l1)
    u2 = _real_to_complex_matrix(l2)
    u3 = _real_to_complex_matrix(L)
    # C_real[r1, r2, R] = sum_{m1 m2 M} conj(U1[m1,r1]) conj(U2[m2,r2])
    #                      C[m1,m2,M] U3[M,R]
    real = np.einsum(
        "ma,nb,mnp,pc->abc", u1.conj(), u2.conj(), complex_cg, u3
    )
    # the result is either purely real or purely imaginary per (l1,l2,L)
    re_norm = np.abs(real.real).max()
    im_norm = np.abs(real.imag).max()
    if im_norm > 1e-10 and re_norm > 1e-10:
        raise RuntimeError(
            f"real CG for ({l1},{l2},{L}) is neither real nor imaginary"
        )
    table = real.real if re_norm >= im_norm else real.imag
    return np.ascontiguousarray(table)


def cg_paths(l_max: int) -> Dict[Tuple[int, int, int], np.ndarray]:
    """All coupling paths (l1, l2, L) with every l <= l_max."""
    paths = {}
    for l1 in range(l_max + 1):
        for l2 in range(l_max + 1):
            for L in range(abs(l1 - l2), min(l1 + l2, l_max) + 1):
                paths[(l1, l2, L)] = real_clebsch_gordan(l1, l2, L)
    return paths


@lru_cache(maxsize=1)
def spherical_to_cartesian_rank2() -> np.ndarray:
    """Intertwiner ``W[i, j, M]`` of shape (3, 3, 9) mapping the
    concatenated real-spherical components M of (l=0, l=1, l=2) to a 3x3
    Cartesian tensor ``T_ij = sum_M W[i, j, M] s_M``.

    Convention: real-SH m-order (-1, 0, 1) corresponds to (y, z, x)
    (reference ``soap_bpnn/model.py:382-396``); equivariant architectures
    predict the (0, 1), (1, -1), (2, 1) spherical parts of a rank-2
    Cartesian target and convert with this matrix, so the output
    transforms as ``R T R^T`` by construction.
    """
    # U[i, m]: Cartesian row i in (x, y, z) picks the real-SH m index
    u = np.zeros((3, 3))
    u[0, 2] = u[1, 0] = u[2, 1] = 1.0
    w = np.zeros((3, 3, 9))
    offset = 0
    for L in (0, 1, 2):
        cg = real_clebsch_gordan(1, 1, L)  # (3, 3, 2L+1)
        w[:, :, offset : offset + 2 * L + 1] = np.einsum(
            "im,jn,mnp->ijp", u, u, cg
        )
        offset += 2 * L + 1
    return w
