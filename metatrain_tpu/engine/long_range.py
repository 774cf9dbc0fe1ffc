"""Learned long-range electrostatic features (flax module).

Counterpart of the reference ``utils/long_range.py`` (torch-pme Ewald/P3M):
charges are predicted from short-range node features, the electrostatic
potential is evaluated with the TPU Ewald matmuls (``ops/ewald.py``) for
periodic systems or the direct smeared sum for non-periodic ones, and the
potential is projected back into feature space by an MLP. Shared by PET
and FlashMD (reference ``utils/long_range.py:28-195``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ewald import (
    direct_potential_nonperiodic,
    ewald_potential_periodic,
    pme_potential_periodic,
)


def _static_half_space_triples(n_max: int) -> np.ndarray:
    triples = []
    for n1 in range(0, n_max + 1):
        for n2 in range(-n_max, n_max + 1):
            for n3 in range(-n_max, n_max + 1):
                if n1 == 0 and (n2 < 0 or (n2 == 0 and n3 <= 0)):
                    continue
                triples.append((n1, n2, n3))
    return np.asarray(triples, dtype=np.int32)


class LongRangeFeaturizer(nn.Module):
    """Charges -> Ewald/PME potential -> feature projection.

    ``method="ewald"`` uses the dense k-space matmuls (small periodic
    systems / training, reference default); ``method="pme"`` uses the
    O(N + mesh^3 log) FFT-mesh solver (large systems / inference,
    reference ``utils/long_range.py:148-192`` uses torch-pme P3M there).
    """

    d_out: int
    smearing: float = 1.4
    n_kmax: int = 4
    method: str = "ewald"
    mesh: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_features, batch_data: Dict[str, Any]):
        positions = batch_data["positions"]
        cells = batch_data["cells"]  # (S, 3, 3)
        system_index = batch_data["system_index"]
        atom_mask = batch_data["atom_mask"]
        pbc = batch_data["pbc"]  # (S, 3)

        charges = nn.Dense(1, dtype=self.dtype, name="charges_map")(
            node_features
        )[:, 0].astype(positions.dtype)
        charges = jnp.where(atom_mask, charges, 0.0)

        k_triples = jnp.asarray(_static_half_space_triples(self.n_kmax))

        # periodic potential per system, vmapped over the (small) system axis
        def per_system_phi(cell, sys_i):
            in_system = (system_index == sys_i) & atom_mask
            # guard singular cells of padded / non-periodic systems
            safe_cell = jnp.where(
                jnp.abs(jnp.linalg.det(cell)) > 1e-10, cell, jnp.eye(3, dtype=cell.dtype)
            )
            if self.method == "pme":
                return pme_potential_periodic(
                    positions,
                    charges,
                    safe_cell,
                    in_system,
                    self.smearing,
                    mesh=self.mesh,
                )
            return ewald_potential_periodic(
                positions,
                charges,
                safe_cell,
                k_triples,
                in_system,
                self.smearing,
            )

        S = cells.shape[0]
        phi_periodic = jax.vmap(per_system_phi)(
            cells, jnp.arange(S)
        )  # (S, A)
        phi_periodic = jnp.sum(
            phi_periodic
            * (system_index[None, :] == jnp.arange(S)[:, None]),
            axis=0,
        )

        phi_direct = direct_potential_nonperiodic(
            batch_data["edge_distances"],
            batch_data["nbr_indices"],
            batch_data["nbr_mask"],
            charges,
            self.smearing,
        )

        is_periodic = pbc.all(axis=1)[system_index]
        phi = jnp.where(is_periodic, phi_periodic, phi_direct)
        phi = jnp.where(atom_mask, phi, 0.0).astype(self.dtype)

        hidden = nn.Dense(self.d_out, dtype=self.dtype, name="project_0")(
            (charges.astype(self.dtype) * phi)[:, None]
        )
        hidden = jax.nn.silu(hidden)
        return nn.Dense(self.d_out, dtype=self.dtype, name="project_1")(hidden)
