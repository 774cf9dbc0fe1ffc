"""Radial bases for spherical expansions.

Replaces torch-spex's Laplacian-eigenstate radial basis
(``soap_bpnn/modules/power_spectrum.py:3,42``) with TPU-friendly closed
forms: the sine/Bessel embedding ``sqrt(2/rc) sin(n pi r / rc) / r``
(the l=0 Laplacian eigenstates, a complete smooth basis) and a Gaussian
basis, both multiplied by a smooth cutoff so every feature vanishes with
all derivatives at the cutoff.
"""

from __future__ import annotations

import math
from typing import Literal

import jax.numpy as jnp


def cosine_cutoff(r: jnp.ndarray, cutoff: float, width: float) -> jnp.ndarray:
    scaled = (r - (cutoff - width)) / width
    clamped = jnp.clip(scaled, 0.0, 1.0)
    return 0.5 * (1.0 + jnp.cos(jnp.pi * clamped))


def bessel_basis(
    r: jnp.ndarray, cutoff: float, n_max: int
) -> jnp.ndarray:
    """Sine/Bessel radial embedding: (..., n_max) features.

    ``R_n(r) = sqrt(2/rc) * sin(n pi r / rc) / r`` -- the spherical Bessel
    functions j_0(z_n r / rc), i.e. the l=0 Laplacian eigenstates.
    """
    n = jnp.arange(1, n_max + 1, dtype=r.dtype)
    safe_r = jnp.maximum(r, 1e-10)
    arg = n * jnp.pi / cutoff * safe_r[..., None]
    return math.sqrt(2.0 / cutoff) * jnp.sin(arg) / safe_r[..., None]


def gaussian_basis(
    r: jnp.ndarray, cutoff: float, n_max: int
) -> jnp.ndarray:
    """Evenly-spaced Gaussians on [0, rc] with sigma = spacing."""
    centers = jnp.linspace(0.0, cutoff, n_max, dtype=r.dtype)
    sigma = cutoff / max(n_max - 1, 1)
    diff = (r[..., None] - centers) / sigma
    return jnp.exp(-0.5 * diff * diff)


def radial_basis(
    r: jnp.ndarray,
    cutoff: float,
    n_max: int,
    kind: Literal["bessel", "gaussian"] = "bessel",
    cutoff_width: float = 0.5,
) -> jnp.ndarray:
    """Radial features with the smooth cutoff applied: (..., n_max)."""
    if kind == "bessel":
        basis = bessel_basis(r, cutoff, n_max)
    elif kind == "gaussian":
        basis = gaussian_basis(r, cutoff, n_max)
    else:
        raise ValueError(f"unknown radial basis {kind!r}")
    fc = cosine_cutoff(r, cutoff, cutoff_width)
    return basis * fc[..., None]
