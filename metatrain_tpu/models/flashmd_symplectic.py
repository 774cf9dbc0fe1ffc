"""FlashMD-symplectic: structure-preserving direct MD-step prediction.

Re-design of the reference ``src/metatrain/experimental/flashmd_symplectic/``
with a JAX-native construction: instead of regressing positions/momenta
freely (plain FlashMD) the step is a *learned leapfrog*,

    p_half = p - 1/2 grad_q V_theta(q)
    q'     = q + dt_eff * p_half / m
    p'     = p_half - 1/2 grad_q V_theta(q')

with ``V_theta`` a learned effective potential (PET backbone energy
head). Each sub-step is an exact shear in phase space, so the composed
map is symplectic *by construction* -- the structure preservation the
reference enforces architecturally falls out of autodiff here. The
neighbor list is reused across the sub-steps (valid for displacements
within the Verlet skin, the FlashMD operating regime).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.target_info import DatasetInfo
from ..engine.trainer import DEFAULT_TRAINER_HYPERS, NNTrainer
from .flashmd import FlashMD, DEFAULT_MODEL_HYPERS as FLASHMD_DEFAULTS
from .nn_base import AtomisticNNModel
from .pet.model import PET
from .pet.modules import PETModule


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    **copy.deepcopy(FLASHMD_DEFAULTS),
    "effective_timestep": 1.0,
}


class FlashMDSymplectic(AtomisticNNModel):
    ARCHITECTURE_NAME = "experimental.flashmd_symplectic"
    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float32]

    def __init__(self, hypers, dataset_info: DatasetInfo, compute_dtype=jnp.float32):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        super().__init__(full, dataset_info, compute_dtype)
        required = {"positions", "momenta"}
        if not required <= set(self.target_infos):
            raise ValueError(
                "flashmd_symplectic needs 'positions' and 'momenta' targets"
            )
        hp = self.hypers
        self.cutoff = float(hp["cutoff"])
        self.cutoff_width = float(hp["cutoff_width"])
        self.cutoff_function = hp["cutoff_function"].lower()
        self.num_neighbors_adaptive = hp["num_neighbors_adaptive"]
        self.cutoff_width_adaptive = float(hp["cutoff_width_adaptive"])
        # the learned effective potential: a PET energy backbone
        self.module = PETModule(
            hypers={
                k: hp[k]
                for k in (
                    "d_pet", "d_node", "d_head", "d_feedforward", "num_heads",
                    "num_attention_layers", "num_gnn_layers", "normalization",
                    "activation", "attention_temperature", "transformer_type",
                    "featurizer_type",
                )
            },
            num_species=len(self.atomic_types),
            output_shapes={"__potential__": {"0": 1}},
            dtype=compute_dtype,
        )

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        return PET.preprocess(self, batch)

    def init_params(self, rng: jax.Array):
        dummy = self._dummy_batch()
        batch_data = self.preprocess(dummy)
        with jax.disable_jit():
            self.params = self.module.init(
                rng, batch_data, ("__potential__",)
            )
        return self.params

    def _potential(self, params, batch: SystemBatch, positions) -> jnp.ndarray:
        """Total learned potential (scalar) at given positions."""
        moved = batch.replace(positions=positions)
        batch_data = self.preprocess(moved)
        raw = self.module.apply(params, batch_data, ("__potential__",))
        per_atom = raw["__potential__"]["0"][:, 0]
        per_atom = jnp.where(batch.atom_mask, per_atom, 0.0)
        return jnp.sum(per_atom)

    def forward(
        self,
        params,
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms=None,  # MD step prediction: full-system by nature
    ) -> Dict[str, TensorMap]:
        A = batch.n_atoms_padded
        dtype = batch.positions.dtype
        momenta = batch.extra.get("momenta", jnp.zeros((A, 3), dtype=dtype))
        masses = jnp.maximum(
            batch.extra.get("masses", jnp.ones((A,), dtype=dtype)), 1e-6
        )
        dt = float(self.hypers["effective_timestep"])

        grad_v = jax.grad(
            lambda pos: self._potential(params, batch, pos)
        )

        p_half = momenta - 0.5 * grad_v(batch.positions)
        q_new = batch.positions + dt * p_half / masses[:, None]
        p_new = p_half - 0.5 * grad_v(q_new)

        samples = Labels(
            ["system", "atom"],
            jnp.stack(
                [batch.system_index, jnp.arange(A, dtype=jnp.int32)], axis=1
            ),
        )

        results: Dict[str, TensorMap] = {}
        for name, values in (("positions", q_new), ("momenta", p_new)):
            if name not in outputs:
                continue
            info = self.target_infos[name]
            layout_block = info.layout.block(0)
            values = jnp.where(batch.atom_mask[:, None], values, 0.0)
            block = TensorBlock(
                values=values[:, :, None].astype(
                    jnp.promote_types(jnp.float32, values.dtype)
                ),
                samples=samples,
                components=layout_block.components,
                properties=layout_block.properties,
                mask=batch.atom_mask,
            )
            results[name] = TensorMap(info.layout.keys, [block])
        return results

    # symplectic forward already predicts absolute positions/momenta: no
    # baselines or scaling are removed/applied
    def forward_eval(self, params, batch, outputs, selected_atoms=None):
        return self.forward(params, batch, outputs, selected_atoms)

    def extra_removal_transforms(self):
        return []

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff

    def requested_extra_system_keys(self) -> Sequence[str]:
        return ("momenta", "masses")

    def step_map(self, params, batch: SystemBatch):
        """(q, p) -> (q', p') as a pure function -- used by the
        symplecticity test (Jacobian satisfies J^T Omega J = Omega)."""

        def phase_map(q, p):
            masses = jnp.maximum(
                batch.extra.get(
                    "masses", jnp.ones((batch.n_atoms_padded,), dtype=q.dtype)
                ),
                1e-6,
            )
            dt = float(self.hypers["effective_timestep"])
            grad_v = jax.grad(lambda pos: self._potential(params, batch, pos))
            p_half = p - 0.5 * grad_v(q)
            q_new = q + dt * p_half / masses[:, None]
            p_new = p_half - 0.5 * grad_v(q_new)
            return q_new, p_new

        return phase_map


class FlashMDSymplecticTrainer(NNTrainer):
    DEFAULT_HYPERS = copy.deepcopy(DEFAULT_TRAINER_HYPERS)
    DEFAULT_HYPERS.update(
        {"o3_augmentation": False, "scale_targets": False}
    )


__model__ = FlashMDSymplectic
__trainer__ = FlashMDSymplecticTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": copy.deepcopy(FlashMDSymplecticTrainer.DEFAULT_HYPERS),
}
