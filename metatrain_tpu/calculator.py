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
    :param colored: colored-slot NEF layout (slot = edge color): makes the
        reversed-edge permutation slot-preserving so PET's message
        reversal runs as banded MXU matmuls (~3x faster at 10k atoms,
        ``ops/pallas/color_gather.py``). Costs ~13 ms extra per neighbor
        rebuild at 10k atoms; transparently falls back to the packed
        layout when the native coloring library is unavailable.
    """

    def __init__(
        self,
        model,
        target: Optional[str] = None,
        skin: float = 0.5,
        bucket_ratio: float = 1.1,
        dtype=jnp.float32,
        colored: bool = True,
    ):
        from .utils.autotune import apply_tuned_config

        apply_tuned_config()
        if isinstance(model, str):
            from .utils.io import load_model

            model = load_model(model, context="export")
        self.model = model
        self.target = target or next(iter(model.supported_outputs()))
        self.cutoff = model.requested_neighbor_cutoff() or 5.0
        self.skin = skin
        self.bucket_ratio = bucket_ratio
        self.dtype = dtype
        self._vnl = VerletNeighborList(self.cutoff, skin, colored=colored)
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

        MD-rate fast path: while the Verlet-skin list is reused, the
        cached device batch is reused too and only the (A, 3) positions
        (plus the cell) are re-uploaded per step -- rebuilding and
        re-uploading the padded NEF index arrays (~100 MB at 10k atoms)
        every step costs more than the force call itself.
        """
        n = len(system)
        nbr = self._vnl.update(system)
        reused = nbr is getattr(self, "_last_nbr", None)
        if reused and self._last_batch is not None and len(
            self._last_types
        ) == n and np.array_equal(self._last_types, system.types):
            A = self._last_batch.n_atoms_padded
            pos_pad = np.zeros((A, 3), np.dtype(self.dtype))
            pos_pad[:n] = system.positions
            cells = np.zeros(
                (self._last_batch.n_systems_padded, 3, 3),
                np.dtype(self.dtype),
            )
            cells[0] = system.cell
            # ONE host->device transfer for both arrays (each transfer
            # pays fixed RPC latency on tunneled runtimes)
            pos_dev, cells_dev = jax.device_put((pos_pad, cells))
            batch = self._last_batch.replace(
                positions=pos_dev, cells=cells_dev
            )
        else:
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
        self._last_nbr = nbr
        self._last_batch = batch
        self._last_types = np.asarray(system.types).copy()
        out = self._force_call(forces, stress)(self.model.params, batch)
        out = jax.device_get(out)  # one device->host fetch for the tree
        result: Dict[str, np.ndarray] = {
            "energy": float(out["energy"][0, 0])
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
        check_interval: int = 10,
    ) -> System:
        """Device-resident velocity-Verlet NVE driver (units: eV, A, amu;
        timestep in ASE time units).

        MD-rate design: positions/velocities live ON DEVICE; a jitted
        ``lax.scan`` integrates ``check_interval`` steps per dispatch, and
        the only host round-trip per chunk is one scalar -- the max
        displacement since the last neighbor build. The neighbor list is
        rebuilt (host cell list) only when that exceeds skin/2, exactly
        like the per-call Verlet logic but without per-step transfers.
        """
        import functools

        n = len(system)
        nbr = self._vnl.update(system)
        A = bucket_atoms(n, self.bucket_ratio)
        M = bucket_neighbors(nbr.max_neighbors, self.bucket_ratio)

        def make_batch(sys_now, nbr_now):
            return batch_from_systems(
                [sys_now],
                [nbr_now],
                n_atoms_padded=A,
                n_systems_padded=2,
                max_neighbors=M,
                dtype=self.dtype,
            )

        batch = make_batch(system, nbr)
        force_call = self._force_call(True, False)
        mass_pad = np.ones((A,), np.float64)
        mass_pad[:n] = masses
        amask = np.zeros((A,), bool)
        amask[:n] = True

        @functools.partial(jax.jit, static_argnums=(8,))
        def chunk(params, batch, pos, vel, acc, ref_pos, mass, mask, k):
            def step(carry, _):
                pos, vel, acc = carry
                pos = pos + vel * timestep + 0.5 * acc * timestep**2
                out = force_call(
                    params, batch.replace(positions=pos.astype(self.dtype))
                )
                forces = -out["position_gradient"][:, :, 0].astype(
                    jnp.float64 if pos.dtype == jnp.float64 else jnp.float32
                )
                new_acc = jnp.where(
                    mask[:, None], forces / mass[:, None], 0.0
                )
                vel = vel + 0.5 * (acc + new_acc) * timestep
                return (pos, vel, new_acc), None

            (pos, vel, acc), _ = jax.lax.scan(
                step, (pos, vel, acc), None, length=k
            )
            disp = jnp.max(
                jnp.where(
                    mask,
                    jnp.linalg.norm(pos - ref_pos, axis=1),
                    0.0,
                )
            )
            return pos, vel, acc, disp

        pos_pad = np.zeros((A, 3))
        pos_pad[:n] = system.positions
        pos_d = jnp.asarray(pos_pad, jnp.float32)
        vel_d = jnp.zeros_like(pos_d)
        mask_d = jnp.asarray(amask)
        mass_d = jnp.asarray(mass_pad, jnp.float32)

        out = force_call(
            self.model.params,
            batch.replace(positions=pos_d.astype(self.dtype)),
        )
        acc_d = jnp.where(
            mask_d[:, None],
            -out["position_gradient"][:, :, 0].astype(jnp.float32)
            / mass_d[:, None],
            0.0,
        )
        ref_d = pos_d

        done = 0
        while done < n_steps:
            k = min(check_interval, n_steps - done)
            pos_d, vel_d, acc_d, disp = chunk(
                self.model.params, batch, pos_d, vel_d, acc_d,
                ref_d, mass_d, mask_d, k,
            )
            done += k
            if float(disp) > self.skin / 2.0:  # one scalar fetch per chunk
                host_pos = np.asarray(jax.device_get(pos_d))[:n].astype(
                    np.float64
                )
                current = System(
                    host_pos, system.types, system.cell, system.pbc
                )
                nbr = self._vnl.update(current)
                if nbr.max_neighbors > M - 1:
                    M = bucket_neighbors(nbr.max_neighbors, self.bucket_ratio)
                batch = make_batch(current, nbr)
                pad = np.zeros((A, 3))
                pad[:n] = host_pos
                ref_d = jnp.asarray(pad, jnp.float32)
                pos_d = ref_d

        final = np.asarray(jax.device_get(pos_d))[:n].astype(np.float64)
        return System(final, system.types, system.cell, system.pbc)
