"""Ewald summation for long-range electrostatics on TPU.

Replaces torch-pme (reference ``utils/long_range.py:47-95``). The
reciprocal-space sum is expressed as dense (n_k, n_atoms) cos/sin matmuls
-- MXU-friendly, fully differentiable through positions (forces/stress
flow via the shared autograd engine). Non-periodic systems use the direct
1/r sum over the NEF neighbor layout.

Conventions: Gaussian charge smearing ``sigma``; potential at atom i
excludes its own self-interaction; units of e^2/(4 pi eps0) = 1 (callers
scale by the Coulomb constant if physical units are needed).
"""

from __future__ import annotations

import itertools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kvectors_for_cell(
    cell: np.ndarray, kspace_cutoff: float
) -> np.ndarray:
    """Integer reciprocal-lattice multiples with |k| <= cutoff (host).

    :param cell: (3, 3) row-vector cell.
    :param kspace_cutoff: reciprocal-space cutoff (1/length units).
    :return: (n_k, 3) integer triples (half-space, k and -k folded).
    """
    recip = 2 * np.pi * np.linalg.inv(cell).T
    b_norms = np.linalg.norm(recip, axis=1)
    n_max = np.maximum(np.ceil(kspace_cutoff / np.maximum(b_norms, 1e-10)), 1)
    triples = []
    for n1 in range(0, int(n_max[0]) + 1):
        r2 = range(-int(n_max[1]), int(n_max[1]) + 1)
        r3 = range(-int(n_max[2]), int(n_max[2]) + 1)
        for n2, n3 in itertools.product(r2, r3):
            if n1 == 0 and (n2 < 0 or (n2 == 0 and n3 <= 0)):
                continue  # half-space: use cos symmetry, skip k=0
            k = n1 * recip[0] + n2 * recip[1] + n3 * recip[2]
            if np.linalg.norm(k) <= kspace_cutoff:
                triples.append((n1, n2, n3))
    return np.asarray(triples, dtype=np.int32).reshape(-1, 3)


def ewald_potential_periodic(
    positions: jnp.ndarray,  # (A, 3)
    charges: jnp.ndarray,  # (A,)
    cell: jnp.ndarray,  # (3, 3)
    k_triples: jnp.ndarray,  # (n_k, 3) int
    atom_mask: jnp.ndarray,  # (A,)
    smearing: float,
) -> jnp.ndarray:
    """Reciprocal-space Ewald potential at each atom, (A,).

    phi_i = (4 pi / V) sum_k exp(-sigma^2 k^2/2)/k^2
            * [cos(k.r_i) Re S(k) + sin(k.r_i) Im S(k)] * 2 (half-space)
            - self term.
    """
    volume = jnp.abs(jnp.linalg.det(cell))
    recip = 2 * jnp.pi * jnp.linalg.inv(cell).T
    kvecs = k_triples.astype(positions.dtype) @ recip  # (n_k, 3)
    k2 = jnp.sum(kvecs * kvecs, axis=1)
    k2 = jnp.maximum(k2, 1e-10)
    weights = jnp.exp(-0.5 * smearing**2 * k2) / k2  # (n_k,)

    phases = positions @ kvecs.T  # (A, n_k) -- the MXU matmul
    cos_p = jnp.cos(phases)
    sin_p = jnp.sin(phases)
    masked_q = jnp.where(atom_mask, charges, 0.0)
    re_s = cos_p.T @ masked_q  # (n_k,)
    im_s = sin_p.T @ masked_q

    phi = (cos_p * (weights * re_s)[None, :]).sum(1) + (
        sin_p * (weights * im_s)[None, :]
    ).sum(1)
    phi = phi * (4.0 * jnp.pi / volume) * 2.0  # half-space doubling

    # remove Gaussian self-interaction
    self_term = 2.0 * charges / (smearing * jnp.sqrt(2.0 * jnp.pi))
    return jnp.where(atom_mask, phi - self_term, 0.0)


def _bspline4(t):
    """Cardinal B-spline M4 weights at fractional offset t in [0, 1):
    returns the 4 weights for mesh points floor(u)-1 .. floor(u)+2.
    (Standard PME order-4 interpolation, Essmann et al. 1995.)"""
    # M4 evaluated at x = t+1, t, t-1... expressed directly:
    w0 = (1.0 - t) ** 3 / 6.0
    w1 = (4.0 - 6.0 * t * t + 3.0 * t**3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t * t - 3.0 * t**3) / 6.0
    w3 = t**3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)  # (..., 4)


def _bspline_deconvolution(n: int) -> np.ndarray:
    """|B(m)|^-2 deconvolution factors for order-4 cardinal B-splines on
    an n-point axis (host, exact): B(m) = sum_j M4(j+1) exp(2 pi i m j / n)."""
    m = np.arange(n)
    # M4 at integer nodes 1, 2, 3 (support of the order-4 spline)
    mvals = np.array([1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0])
    b = np.zeros(n, dtype=np.complex128)
    for j, val in enumerate(mvals):
        b += val * np.exp(2j * np.pi * m * j / n)
    mag2 = np.abs(b) ** 2
    # Nyquist-type modes where B ~ 0 carry no spline-representable signal
    return np.where(mag2 > 1e-10, 1.0 / np.maximum(mag2, 1e-10), 0.0)


def pme_potential_periodic(
    positions: jnp.ndarray,  # (A, 3)
    charges: jnp.ndarray,  # (A,)
    cell: jnp.ndarray,  # (3, 3)
    atom_mask: jnp.ndarray,  # (A,)
    smearing: float,
    mesh: int = 32,
) -> jnp.ndarray:
    """Smooth particle-mesh Ewald reciprocal potential, O(N + mesh^3 log).

    The scalable counterpart of :func:`ewald_potential_periodic`
    (reference inference path uses torch-pme's P3M,
    ``utils/long_range.py:148-192``): order-4 B-spline charge spreading
    onto a static ``mesh^3`` grid, one 3-D FFT convolution with the
    smeared Coulomb influence function (B-spline-deconvolved), and
    B-spline back-interpolation. Fully differentiable (forces/stress via
    the shared autograd engine); the spreading scatter-add transposes to
    the interpolation gather and vice versa.
    """
    dtype = positions.dtype
    volume = jnp.abs(jnp.linalg.det(cell))
    masked_q = jnp.where(atom_mask, charges, 0.0)

    # fractional coordinates in [0, 1)
    frac = positions @ jnp.linalg.inv(cell)
    frac = frac - jnp.floor(frac)
    u = frac * mesh  # (A, 3)
    base = jnp.floor(u).astype(jnp.int32)  # spline anchored at base-1..base+2
    t = u - base  # (A, 3) in [0, 1)
    w = _bspline4(t)  # (A, 3, 4)

    # spread charges: 64 static offsets, scatter-add with wrap-around
    rho = jnp.zeros((mesh, mesh, mesh), dtype=dtype)
    for jx in range(4):
        ix = (base[:, 0] + jx - 1) % mesh
        wx = w[:, 0, jx] * masked_q
        for jy in range(4):
            iy = (base[:, 1] + jy - 1) % mesh
            wxy = wx * w[:, 1, jy]
            for jz in range(4):
                iz = (base[:, 2] + jz - 1) % mesh
                rho = rho.at[ix, iy, iz].add(wxy * w[:, 2, jz])

    # influence function on the half-complex grid (rfftn layout)
    recip = 2 * np.pi * jnp.linalg.inv(cell).T  # rows = b1, b2, b3
    mx = jnp.fft.fftfreq(mesh) * mesh  # signed mode numbers
    mz = jnp.fft.rfftfreq(mesh) * mesh
    kx = mx[:, None, None, None] * recip[0]
    ky = mx[None, :, None, None] * recip[1]
    kz = mz[None, None, :, None] * recip[2]
    kvec = kx + ky + kz  # (mesh, mesh, mesh//2+1, 3)
    k2 = jnp.sum(kvec * kvec, axis=-1)
    k2_safe = jnp.maximum(k2, 1e-10)
    green = (4.0 * jnp.pi / volume) * jnp.exp(-0.5 * smearing**2 * k2_safe) / k2_safe
    green = jnp.where(k2 > 1e-10, green, 0.0)  # zero the k=0 (tinfoil) mode
    dec = jnp.asarray(_bspline_deconvolution(mesh))
    green = (
        green
        * dec[:, None, None]
        * dec[None, :, None]
        * jnp.asarray(_bspline_deconvolution(mesh))[None, None, : mesh // 2 + 1]
    )

    rho_k = jnp.fft.rfftn(rho)
    # mode sum, not the normalized inverse transform: scale by mesh^3
    phi_mesh = (
        jnp.fft.irfftn(rho_k * green, s=(mesh, mesh, mesh)) * mesh**3
    ).astype(dtype)

    # back-interpolate the potential to atom positions (gather)
    phi = jnp.zeros(positions.shape[:1], dtype=dtype)
    for jx in range(4):
        ix = (base[:, 0] + jx - 1) % mesh
        for jy in range(4):
            iy = (base[:, 1] + jy - 1) % mesh
            wxy = w[:, 0, jx] * w[:, 1, jy]
            for jz in range(4):
                iz = (base[:, 2] + jz - 1) % mesh
                phi = phi + wxy * w[:, 2, jz] * phi_mesh[ix, iy, iz]

    self_term = 2.0 * charges / (smearing * jnp.sqrt(2.0 * jnp.pi))
    return jnp.where(atom_mask, phi - self_term, 0.0)


def direct_potential_nonperiodic(
    distances: jnp.ndarray,  # (A, M) NEF distances
    nbr_indices: jnp.ndarray,
    nbr_mask: jnp.ndarray,
    charges: jnp.ndarray,  # (A,)
    smearing: float,
) -> jnp.ndarray:
    """Smeared direct Coulomb sum over the neighbor list, (A,)."""
    q_j = charges[nbr_indices]
    pair = (
        q_j
        * jax.scipy.special.erf(distances / (smearing * jnp.sqrt(2.0)))
        / jnp.maximum(distances, 1e-10)
    )
    pair = jnp.where(nbr_mask, pair, 0.0)
    return jnp.sum(pair, axis=1)
