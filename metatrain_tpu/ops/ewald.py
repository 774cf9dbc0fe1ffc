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
