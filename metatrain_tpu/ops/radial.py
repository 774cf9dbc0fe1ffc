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


def hermite_spline_basis(
    r: jnp.ndarray,
    values: jnp.ndarray,
    derivatives: jnp.ndarray,
    spacing: float,
) -> jnp.ndarray:
    """Cubic Hermite interpolation of splined radial functions.

    torch-spex ships its (Laplacian-eigenstate) radial basis as a
    uniform-knot cubic Hermite spline inside every checkpoint
    (``soap_calculator.calculator.radial.spliner.spline_{values,
    derivatives,_spacing}``) -- evaluating it reproduces the reference
    descriptor's radial functions EXACTLY, with no spex install.

    :param r: (...,) distances.
    :param values: (n_knots, n_functions) knot values.
    :param derivatives: (n_knots, n_functions) knot derivatives.
    :param spacing: uniform knot spacing (knot k at ``k * spacing``).
    :return: (..., n_functions); zero beyond the last knot.
    """
    n_knots = values.shape[0]
    t = r / spacing
    idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n_knots - 2)
    u = (t - idx.astype(r.dtype))[..., None]
    h00 = (1.0 + 2.0 * u) * (1.0 - u) ** 2
    h10 = u * (1.0 - u) ** 2
    h01 = u * u * (3.0 - 2.0 * u)
    h11 = u * u * (u - 1.0)
    v0 = values[idx]
    v1 = values[idx + 1]
    d0 = derivatives[idx]
    d1 = derivatives[idx + 1]
    out = h00 * v0 + h10 * spacing * d0 + h01 * v1 + h11 * spacing * d1
    in_range = (r >= 0.0) & (r <= (n_knots - 1) * spacing)
    return jnp.where(in_range[..., None], out, 0.0)


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


# ---- Laplacian-eigenstate (LE) basis: per-l spherical Bessel j_l --------

from functools import lru_cache  # noqa: E402

import numpy as np  # noqa: E402


@lru_cache(maxsize=None)
def spherical_bessel_zeros(l: int, n_zeros: int) -> tuple:
    """First ``n_zeros`` positive zeros z_ln of the spherical Bessel
    function j_l, by bisection between sign changes (z_0n = n pi exactly;
    higher-l zeros interlace, so a pi-step scan brackets each)."""
    from scipy.optimize import brentq
    from scipy.special import spherical_jn

    if l == 0:
        return tuple(np.pi * np.arange(1, n_zeros + 1))
    zeros = []
    # j_l's first zero lies above l + 2 (approx); scan in pi/8 steps
    x = l + 1.0
    step = np.pi / 8
    previous = spherical_jn(l, x)
    while len(zeros) < n_zeros:
        x_next = x + step
        current = spherical_jn(l, x_next)
        if previous == 0.0:
            zeros.append(x)
        elif previous * current < 0:
            zeros.append(brentq(lambda t: spherical_jn(l, t), x, x_next))
        x, previous = x_next, current
    return tuple(zeros[:n_zeros])


def le_channel_budgets(e_max: float, cutoff: float, l_cap: int = 12):
    """Per-l radial counts n_max_l from an eigenvalue cutoff:
    E_ln = (z_ln / rc)^2 <= E_max (the reference SPACE physical-basis
    budget scheme, ``space/modules/physical_basis.py:9-76``; here with
    the Laplacian-eigenstate spectrum). Returns a list over l, truncated
    at the last l with a non-empty basis."""
    budgets = []
    for l in range(l_cap + 1):
        count = 0
        zeros = spherical_bessel_zeros(l, 64)
        for z in zeros:
            if (z / cutoff) ** 2 <= e_max:
                count += 1
        if count == 0:
            break
        budgets.append(count)
    return budgets


def le_radial_basis(
    r: jnp.ndarray, cutoff: float, n_max_l, cutoff_width: float = 0.5
):
    """Laplacian-eigenstate radial basis: per-l lists of features.

    ``R_ln(r) = N_ln j_l(z_ln r / rc)`` with ``N_ln = sqrt(2) /
    (rc^{3/2} |j_{l+1}(z_ln)|)`` so that ``int_0^rc R_ln^2 r^2 dr = 1``
    (the eigenstates of the Laplacian in a ball with Dirichlet walls --
    the reference's spliner evaluates a numerically-precomputed variant
    of this family). A smooth cutoff multiplies every feature.

    :param n_max_l: per-l feature counts (see :func:`le_channel_budgets`).
    :return: list over l of (..., n_max_l[l]) arrays.
    """
    from scipy.special import spherical_jn

    fc = cosine_cutoff(r, cutoff, cutoff_width)
    safe_r = jnp.maximum(r, 1e-10)
    out = []
    for l, n_max in enumerate(n_max_l):
        zeros = np.asarray(spherical_bessel_zeros(l, n_max))
        norms = np.sqrt(2.0) / (
            cutoff**1.5 * np.abs(spherical_jn(l + 1, zeros))
        )
        x = zeros * (safe_r[..., None] / cutoff)  # (..., n_max)
        out.append(
            _spherical_jl(l, x)
            * jnp.asarray(norms, dtype=r.dtype)
            * fc[..., None]
        )
    return out


#: cached (e_max, cutoff, n_knots) -> spline-table tuples (host build
#: cost is ~10 ms; MD/eval re-traces should not repeat it)
_PHYS_SPLINE_CACHE: dict = {}


def physical_spline_tables(e_max: float, cutoff: float, n_knots: int = 256):
    """Hermite-spline tables of the physical (eigenstate) radial basis.

    Reference SPACE splines its physical-basis eigenfunctions once and
    evaluates the spline in the hot path
    (``space/modules/physical_basis.py:9-76`` + ``splines.py``; the
    repo's JAX port consumes the same tables, ``eqx.py:37-70``). The
    generating family here is the Laplacian-eigenstate basis (the
    ``physical_basis`` package that tabulates the reference's confined
    eigenfunctions is not installable in this environment -- exact
    tables from a reference checkpoint can be passed through
    ``radial_basis.spline_tables`` instead, same consumption path as the
    SOAP-BPNN spex import). Values carry the reference's sphere-volume
    normalization ``sqrt(r_cut^3 / 3)``.

    :return: ``(values (n_knots, n_cols), derivatives, spacing,
        n_max_l)`` numpy arrays; columns l-major (all n of l=0, then
        l=1, ...).
    """
    key = (float(e_max), float(cutoff), int(n_knots))
    cached = _PHYS_SPLINE_CACHE.get(key)
    if cached is not None:
        return cached
    from scipy.special import spherical_jn

    n_max_l = le_channel_budgets(e_max, cutoff)
    spacing = cutoff / (n_knots - 1)
    r = np.linspace(0.0, cutoff, n_knots)
    norm_sphere = np.sqrt(cutoff**3 / 3.0)
    cols_v, cols_d = [], []
    for l, n_max in enumerate(n_max_l):
        zeros = np.asarray(spherical_bessel_zeros(l, n_max))
        norms = (
            np.sqrt(2.0)
            / (cutoff**1.5 * np.abs(spherical_jn(l + 1, zeros)))
            * norm_sphere
        )
        x = zeros[None, :] * (r[:, None] / cutoff)  # (n_knots, n_max)
        safe_x = np.maximum(x, 1e-10)
        jl = spherical_jn(l, safe_x)
        djl = spherical_jn(l, safe_x, derivative=True)
        if l > 0:  # j_l(0) = 0 for l > 0; the guard above breaks that
            jl = np.where(x < 1e-10, 0.0, jl)
            djl = np.where(x < 1e-10, (1.0 / 3.0) if l == 1 else 0.0, djl)
        cols_v.append(jl * norms[None, :])
        cols_d.append(djl * (zeros[None, :] / cutoff) * norms[None, :])
    out = (
        np.concatenate(cols_v, axis=1),
        np.concatenate(cols_d, axis=1),
        float(spacing),
        [int(n) for n in n_max_l],
    )
    _PHYS_SPLINE_CACHE[key] = out
    return out


def _spherical_jl(l: int, x: jnp.ndarray) -> jnp.ndarray:
    """j_l(x) by the closed-form ascending recurrence (stable for the
    small l used here; x is bounded away from 0)."""
    x = jnp.maximum(x, 1e-10)
    j0 = jnp.sin(x) / x
    if l == 0:
        return j0
    j1 = jnp.sin(x) / (x * x) - jnp.cos(x) / x
    if l == 1:
        return j1
    j_prev, j_curr = j0, j1
    for n in range(1, l):
        j_prev, j_curr = j_curr, (2 * n + 1) / x * j_curr - j_prev
    return j_curr
