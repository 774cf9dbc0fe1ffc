"""ZBL universal screened-Coulomb repulsion baseline.

Re-design of the reference ``utils/additive/zbl.py``: the
Ziegler-Biersack-Littmark universal repulsive potential, used as an
additive physical baseline for energies at short range. Device-side
forward in NEF layout (differentiable: forces/stress come through the
shared autograd engine) plus a host-side evaluation for collate-time
target removal.

E_ij = (Z_i Z_j e^2 / 4 pi eps0 r) phi(r/a) * fc(r),
phi(x) = 0.18175 e^{-3.19980 x} + 0.50986 e^{-0.94229 x}
       + 0.28022 e^{-0.40290 x} + 0.02817 e^{-0.20162 x},
a = 0.46850 / (Z_i^0.23 + Z_j^0.23)   [Angstrom].
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.dataset import Sample
from ..data.target_info import DatasetInfo, TargetInfo
from ..ops.segment import sum_over_atoms


# e^2 / (4 pi eps0) in eV * Angstrom
COULOMB_EV_ANGSTROM = 14.399645478425668

_PHI_COEFFS = (0.18175, 0.50986, 0.28022, 0.02817)
_PHI_EXPONENTS = (3.19980, 0.94229, 0.40290, 0.20162)


def _phi(x):
    total = 0.0
    for c, e in zip(_PHI_COEFFS, _PHI_EXPONENTS):
        total = total + c * jnp.exp(-e * x)
    return total


def _phi_np(x):
    return sum(c * np.exp(-e * x) for c, e in zip(_PHI_COEFFS, _PHI_EXPONENTS))


from ..ops.radial import cosine_cutoff as _cosine_switch  # noqa: E402


class ZBL:
    """Additive ZBL model for energy targets.

    :param cutoff: smooth truncation radius (the model's NL cutoff).
    :param cutoff_width: switching width.
    """

    def __init__(
        self,
        dataset_info: DatasetInfo,
        cutoff: float,
        cutoff_width: float = 0.5,
    ):
        self.dataset_info = dataset_info
        self.cutoff = float(cutoff)
        self.cutoff_width = float(cutoff_width)
        # applies only to non-per-atom scalar energy targets (the host
        # removal subtracts per-SYSTEM totals)
        self.target_names = [
            name
            for name, info in dataset_info.targets.items()
            if info.quantity == "energy"
            and info.is_scalar
            and not info.per_atom
        ]

    # -- device forward ---------------------------------------------------

    def atomic_energies(self, batch: SystemBatch) -> jnp.ndarray:
        """Per-atom ZBL energies (A,) -- half pair sum, differentiable."""
        _, distances = batch.edge_vectors()
        z = batch.types.astype(distances.dtype)
        z_i = z[:, None]
        z_j = z[batch.nbr_indices]
        a = 0.46850 / (z_i**0.23 + z_j**0.23)
        pair_e = (
            COULOMB_EV_ANGSTROM
            * z_i
            * z_j
            / jnp.maximum(distances, 1e-6)
            * _phi(distances / a)
            * _cosine_switch(distances, self.cutoff, self.cutoff_width)
        )
        pair_e = jnp.where(batch.nbr_mask, pair_e, 0.0)
        return 0.5 * jnp.sum(pair_e, axis=1)

    def forward(
        self, batch: SystemBatch, outputs: Sequence[str], selected_atoms=None
    ) -> Dict[str, TensorMap]:
        results: Dict[str, TensorMap] = {}
        amask = batch.atom_mask
        if selected_atoms is not None:
            amask = amask & selected_atoms
        atom_e = self.atomic_energies(batch)
        for name in outputs:
            if name not in self.target_names:
                continue
            info = self.dataset_info.targets[name]
            layout_block = info.layout.block(0)
            if info.per_atom:
                values = jnp.where(amask, atom_e, 0.0)[:, None]
                samples = Labels(
                    ["system", "atom"],
                    jnp.stack(
                        [
                            batch.system_index,
                            jnp.arange(
                                batch.n_atoms_padded, dtype=jnp.int32
                            ),
                        ],
                        axis=1,
                    ),
                )
                mask = amask
            else:
                values = sum_over_atoms(
                    atom_e,
                    batch.system_index,
                    batch.n_systems_padded,
                    amask,
                )[:, None]
                samples = Labels.range("system", batch.n_systems_padded)
                mask = batch.system_mask
            block = TensorBlock(
                values=values,
                samples=samples,
                components=layout_block.components,
                properties=layout_block.properties,
                mask=mask,
            )
            results[name] = TensorMap(info.layout.keys, [block])
        return results

    # -- host removal -----------------------------------------------------------

    def predict_host(self, system) -> Dict[str, np.ndarray]:
        """Host-side per-system ZBL energy + forces (float64) for removal."""
        from ..ops.neighbors import neighbor_pairs

        centers, neighbors, shifts = neighbor_pairs(
            system.positions, system.cell, system.pbc, self.cutoff, full_list=True
        )
        if len(centers) == 0:
            return {
                "energy": 0.0,
                "position_gradient": np.zeros((len(system), 3)),
            }
        r_vec = (
            system.positions[neighbors]
            - system.positions[centers]
            + shifts @ system.cell
        )
        r = np.linalg.norm(r_vec, axis=1)
        z = system.types.astype(np.float64)
        zi, zj = z[centers], z[neighbors]
        a = 0.46850 / (zi**0.23 + zj**0.23)
        x = r / a
        phi = _phi_np(x)
        scaled = (r - (self.cutoff - self.cutoff_width)) / self.cutoff_width
        fc = 0.5 * (1.0 + np.cos(np.pi * np.clip(scaled, 0.0, 1.0)))
        pair_e = COULOMB_EV_ANGSTROM * zi * zj / r * phi * fc
        energy = 0.5 * float(pair_e.sum())

        # analytic pair force via dE/dr (finite-diff-free)
        dphi = sum(
            -e * c * np.exp(-e * x) for c, e in zip(_PHI_COEFFS, _PHI_EXPONENTS)
        ) / a
        in_switch = (scaled > 0) & (scaled < 1)
        dfc = np.where(
            in_switch,
            -0.5 * np.pi / self.cutoff_width * np.sin(np.pi * np.clip(scaled, 0, 1)),
            0.0,
        )
        prefactor = COULOMB_EV_ANGSTROM * zi * zj
        de_dr = prefactor * (
            (-phi / r**2 + dphi / r) * fc + phi / r * dfc
        )
        unit = r_vec / r[:, None]
        # dE/dpos_i for edge i->j is -0.5*de_dr*unit + symmetric partner; with a
        # full pair list each unordered pair appears twice, summing correctly
        grad = np.zeros((len(system), 3))
        np.add.at(grad, centers, -0.5 * de_dr[:, None] * unit)
        np.add.at(grad, neighbors, 0.5 * de_dr[:, None] * unit)
        return {"energy": energy, "position_gradient": grad}

    def remove_transform(self, samples: List[Sample]) -> List[Sample]:
        """Collate transform subtracting ZBL energies (and gradients)."""
        out = []
        for sample in samples:
            prediction = self.predict_host(sample.system)
            new_targets = dict(sample.targets)
            for name in self.target_names:
                if name not in new_targets:
                    continue
                tmap = new_targets[name]
                block = tmap.block(0)
                new_block = TensorBlock(
                    np.asarray(block.values) - prediction["energy"],
                    block.samples,
                    block.components,
                    block.properties,
                    block.mask,
                )
                for gname, grad in block.gradients():
                    if gname == "positions":
                        new_block.add_gradient(
                            gname,
                            TensorBlock(
                                np.asarray(grad.values)
                                - prediction["position_gradient"][:, :, None],
                                grad.samples,
                                grad.components,
                                grad.properties,
                                grad.mask,
                            ),
                        )
                    else:
                        new_block.add_gradient(gname, grad)
                new_targets[name] = TensorMap(tmap.keys, [new_block])
            out.append(Sample(sample.system, new_targets, sample.extra_data))
        return out
