"""Real spherical harmonics in pure JAX (the sphericart replacement).

The reference uses the C++/CUDA ``sphericart-torch`` library
(``soap_bpnn/modules/tensor_basis.py:8``). Here the real spherical
harmonics are generated as fully-unrolled polynomial recurrences --
ideal for XLA: no data-dependent control flow, every (l, m) term is a
fused polynomial in the unit vector components, and derivatives come from
autodiff (smooth at the poles because the azimuthal factors are the
polynomials Re/Im[(x+iy)^m], never atan2).

Convention: orthonormal real spherical harmonics with Condon-Shortley
phase removed, ordered m = -l..l per l (matching metatensor's ``o3_mu``
component ordering).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List

import jax.numpy as jnp
import numpy as np


def real_spherical_harmonics(
    unit_vectors: jnp.ndarray, l_max: int
) -> List[jnp.ndarray]:
    """Real spherical harmonics Y_lm on unit vectors.

    :param unit_vectors: (..., 3) unit vectors.
    :param l_max: maximum angular momentum (static).
    :return: list of l_max+1 arrays, each of shape (..., 2l+1), ordered
        m = -l..l.
    """
    x = unit_vectors[..., 0]
    y = unit_vectors[..., 1]
    z = unit_vectors[..., 2]

    # azimuthal polynomials: A_m = Re[(x+iy)^m], B_m = Im[(x+iy)^m]
    A = [jnp.ones_like(x)]
    B = [jnp.zeros_like(x)]
    for m in range(1, l_max + 1):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    # scaled associated Legendre: P~_l^m = P_l^m / sin^m(theta)
    # (a polynomial in z; the sin^m factor lives inside A_m/B_m)
    P = {}
    P[(0, 0)] = jnp.ones_like(z)
    for m in range(1, l_max + 1):
        P[(m, m)] = P[(m - 1, m - 1)] * (2 * m - 1)
    for m in range(0, l_max):
        P[(m + 1, m)] = z * (2 * m + 1) * P[(m, m)]
    for m in range(0, l_max + 1):
        for l in range(m + 2, l_max + 1):
            P[(l, m)] = (
                (2 * l - 1) * z * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)

    out: List[jnp.ndarray] = []
    for l in range(l_max + 1):
        components = []
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                norm = math.sqrt((2 * l + 1) / (4 * math.pi))
                value = norm * P[(l, 0)]
            else:
                norm = math.sqrt(
                    (2 * l + 1)
                    / (2 * math.pi)
                    * math.factorial(l - am)
                    / math.factorial(l + am)
                )
                angular = B[am] if m < 0 else A[am]
                value = norm * P[(l, am)] * angular
            components.append(value)
        out.append(jnp.stack(components, axis=-1))
    return out


def real_spherical_harmonics_stacked(
    unit_vectors: jnp.ndarray, l_max: int
) -> jnp.ndarray:
    """Same as :func:`real_spherical_harmonics`, concatenated to
    (..., (l_max+1)^2)."""
    return jnp.concatenate(
        real_spherical_harmonics(unit_vectors, l_max), axis=-1
    )


def reference_real_sph(unit_vectors: np.ndarray, l_max: int) -> List[np.ndarray]:
    """Slow scipy-based reference implementation (tests only)."""
    from scipy.special import sph_harm_y

    x, y, z = unit_vectors[..., 0], unit_vectors[..., 1], unit_vectors[..., 2]
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)
    out = []
    for l in range(l_max + 1):
        comps = []
        for m in range(-l, l + 1):
            am = abs(m)
            ylm = sph_harm_y(l, am, theta, phi)  # complex
            if m == 0:
                value = ylm.real
            elif m > 0:
                value = math.sqrt(2) * (-1) ** m * ylm.real
            else:
                value = math.sqrt(2) * (-1) ** am * ylm.imag
            comps.append(value)
        out.append(np.stack(comps, axis=-1))
    return out
