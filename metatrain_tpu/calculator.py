"""MD-engine calculator: one compiled force call, called O(1e6) times.

The reference's exported TorchScript ``AtomisticModel`` is consumed by MD
engines through metatomic adapters (SURVEY.md section 3.5). The TPU-native
serving contract is this :class:`Calculator`: load an exported ``.mtt``
model and call :meth:`compute` per MD step. Design points for MD rates:

- geometric size bucketing -> one XLA compilation per bucket, reused
  across steps (pattern from the reference's own JAX calculator,
  ``experimental/space/calculator.py:19-60``);
- Verlet-skin neighbor-list reuse: the host cell-list only rebuilds when
  an atom moved more than skin/2;
- energies, forces and stress from a single jitted value-and-grad call.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .containers import System, batch_from_systems, bucket_atoms, bucket_neighbors, bucket_size
from .data.target_info import get_energy_target_info
from .engine.evaluate import evaluate_model
from .ops.neighbors import VerletNeighborList


class Calculator:
    """Serve force calls from an exported model.

    :param model: exported ``.mtt`` path or a live model object.
    :param target: energy target name (default: the model's first output).
    :param skin: Verlet skin distance for neighbor-list reuse.
    :param bucket_ratio: geometric padding ratio (compile count vs waste).
    """

    def __init__(
        self,
        model,
        target: Optional[str] = None,
        skin: float = 0.5,
        bucket_ratio: float = 1.1,
        dtype=jnp.float32,
    ):
        if isinstance(model, str):
            from .utils.io import load_model

            model = load_model(model, context="export")
        self.model = model
        self.target = target or next(iter(model.supported_outputs()))
        self.cutoff = model.requested_neighbor_cutoff() or 5.0
        self.skin = skin
        self.bucket_ratio = bucket_ratio
        self.dtype = dtype
        self._vnl = VerletNeighborList(self.cutoff, skin)
        self._jitted = {}

        self._info_e = get_energy_target_info("eV")
        self._info_ef = get_energy_target_info("eV", add_position_gradients=True)
        self._info_efs = get_energy_target_info(
            "eV", add_position_gradients=True, add_strain_gradients=True
        )

    def _force_call(self, forces: bool, stress: bool):
        key = (forces, stress)
        if key not in self._jitted:
            info = (
                self._info_efs if stress else self._info_ef if forces else self._info_e
            )
            forward = getattr(self.model, "forward_eval", self.model.forward)
            target = self.target

            @jax.jit
            def call(params, batch):
                preds = evaluate_model(
                    forward, params, batch, {target: info}, is_training=False
                )
                block = preds[target].block(0)
                out = {"energy": block.values}
                if forces:
                    out["position_gradient"] = block.gradient(
                        "positions"
                    ).values
                if stress:
                    out["strain_gradient"] = block.gradient("strain").values
                return out

            self._jitted[key] = call
        return self._jitted[key]

    def compute(
        self,
        system: System,
        forces: bool = True,
        stress: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Energy (+forces, +stress) for one system.

        :return: dict with ``energy`` (float), ``forces`` ((n, 3), eV/A)
            and ``stress`` ((3, 3), dE/dstrain / volume) as requested.
        """
        n = len(system)
        nbr = self._vnl.update(system)
        A = bucket_atoms(n, self.bucket_ratio)
        M = bucket_neighbors(nbr.max_neighbors, self.bucket_ratio)
        batch = batch_from_systems(
            [system],
            [nbr],
            n_atoms_padded=A,
            n_systems_padded=2,
            max_neighbors=M,
            dtype=self.dtype,
        )
        out = self._force_call(forces, stress)(self.model.params, batch)
        result: Dict[str, np.ndarray] = {
            "energy": float(np.asarray(out["energy"])[0, 0])
        }
        if forces:
            grad = np.asarray(out["position_gradient"])[:n, :, 0]
            result["forces"] = -grad
        if stress:
            volume = float(abs(np.linalg.det(system.cell)))
            strain_grad = np.asarray(out["strain_gradient"])[0, :, :, 0]
            result["stress"] = strain_grad / volume if volume > 0 else strain_grad
            result["virial"] = -strain_grad
        return result

    def run_md_nve(
        self,
        system: System,
        masses: np.ndarray,
        timestep: float,
        n_steps: int,
    ) -> System:
        """Minimal velocity-Verlet NVE driver (units: eV, A, amu;
        timestep in ASE time units) -- mostly for integration tests."""
        # 1 ASE time unit: sqrt(amu A^2 / eV)
        pos = system.positions.copy()
        vel = np.zeros_like(pos)
        out = self.compute(System(pos, system.types, system.cell, system.pbc))
        acc = out["forces"] / masses[:, None]
        for _ in range(n_steps):
            pos = pos + vel * timestep + 0.5 * acc * timestep**2
            current = System(pos, system.types, system.cell, system.pbc)
            out = self.compute(current)
            new_acc = out["forces"] / masses[:, None]
            vel = vel + 0.5 * (acc + new_acc) * timestep
            acc = new_acc
        return System(pos, system.types, system.cell, system.pbc)
