"""Laplacian-eigenstate radial basis: zeros, budgets, orthonormality."""

import numpy as np
from scipy.special import spherical_jn

from metatrain_tpu.ops.radial import (
    le_channel_budgets,
    le_radial_basis,
    spherical_bessel_zeros,
)


def test_spherical_bessel_zeros():
    for l in range(7):
        zeros = np.asarray(spherical_bessel_zeros(l, 8))
        assert np.all(np.diff(zeros) > 0)
        assert np.abs(spherical_jn(l, zeros)).max() < 1e-9
    np.testing.assert_allclose(
        spherical_bessel_zeros(0, 3), np.pi * np.arange(1, 4)
    )


def test_le_channel_budgets_monotone():
    budgets = le_channel_budgets(20.0, 4.0)
    assert budgets[0] >= budgets[-1] > 0
    assert all(a >= b for a, b in zip(budgets, budgets[1:]))
    # larger E_max -> at least as many functions everywhere
    bigger = le_channel_budgets(40.0, 4.0)
    assert len(bigger) >= len(budgets)
    assert all(b >= a for a, b in zip(budgets, bigger))


def test_le_radial_orthonormality():
    import jax.numpy as jnp

    rc = 4.0
    r = np.linspace(1e-6, rc, 20001)
    feats = le_radial_basis(
        jnp.asarray(r, dtype=jnp.float64), rc, [4, 3, 3], cutoff_width=1e-9
    )
    for l, features in enumerate(feats):
        R = np.asarray(features)  # (n_r, n_max)
        gram = np.trapezoid(
            R.T[:, None, :] * R.T[None, :, :] * r**2, r, axis=-1
        )
        np.testing.assert_allclose(
            gram, np.eye(R.shape[1]), atol=5e-4
        )
