"""FlashMD: direct prediction of the MD step (positions + momenta).

Re-design of the reference ``src/metatrain/experimental/flashmd/``
(paper arXiv:2505.19350: 60-90x speedup over force-based MD): instead of
forces, the model predicts the future positions and momenta after a large
timestep directly. Built on the PET backbone; per-system momenta/masses
enter as learned node conditioning; position targets are trained as
*displacements* (the current position is an additive baseline, reference
``flashmd/modules/additive.py``), and momenta optionally as differences
(``predict_momenta_as_difference``).

Targets (per-atom Cartesian rank-1): conventionally named ``positions``
and ``momenta``, read from extra columns of the dataset.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..containers import SystemBatch, TensorBlock, TensorMap
from ..data.dataset import Sample
from ..data.target_info import DatasetInfo
from ..engine.trainer import DEFAULT_TRAINER_HYPERS, NNTrainer
from .nn_base import AtomisticNNModel
from .pet.model import DEFAULT_MODEL_HYPERS as PET_DEFAULTS
from .pet.model import PET
from .pet.modules import PETBackbone, Head


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    **copy.deepcopy(PET_DEFAULTS),
    "predict_momenta_as_difference": False,
}


class FlashMDModule(nn.Module):
    """PET backbone + momentum conditioning + per-atom vector heads."""

    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any], requested: Sequence[str]):
        d_node = self.hypers["d_node"]
        momenta = batch_data["momenta"]  # (A, 3)
        masses = batch_data["masses"]  # (A,)
        p_norm = jnp.linalg.norm(momenta, axis=-1, keepdims=True)
        cond_in = jnp.concatenate(
            [momenta, p_norm, masses[:, None]], axis=-1
        ).astype(self.dtype)
        conditioning = nn.Dense(d_node, dtype=self.dtype, name="momentum_embed")(
            cond_in
        )
        conditioning = jax.nn.silu(conditioning)
        conditioning = nn.Dense(
            d_node,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,  # zero-init gate, like the
            name="momentum_gate",  # reference conditioning (conditioning.py:8-52)
        )(conditioning)

        backbone_data = dict(batch_data)
        backbone_data["conditioning"] = conditioning
        node_features, edge_features = PETBackbone(
            self.hypers, self.num_species, dtype=self.dtype, name="backbone"
        )(backbone_data)

        cutoff_factors = jnp.where(
            batch_data["nbr_mask"], batch_data["cutoff_factors"], 0.0
        )
        d_head = self.hypers["d_head"]
        results: Dict[str, Any] = {"_features": node_features[-1]}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            per_block: Dict[str, jnp.ndarray] = {}
            for layer_i, (nf, ef) in enumerate(zip(node_features, edge_features)):
                node_ll = Head(d_head, dtype=self.dtype, name=f"node_head_{safe}_{layer_i}")(nf)
                edge_ll = Head(d_head, dtype=self.dtype, name=f"edge_head_{safe}_{layer_i}")(ef)
                for block_key, size in shapes.items():
                    node_pred = nn.Dense(
                        size, dtype=self.dtype,
                        name=f"node_last_{safe}_{layer_i}_{block_key}",
                    )(node_ll)
                    edge_pred = nn.Dense(
                        size, dtype=self.dtype,
                        name=f"edge_last_{safe}_{layer_i}_{block_key}",
                    )(edge_ll)
                    edge_pred = jnp.sum(
                        edge_pred * cutoff_factors[:, :, None], axis=1
                    )
                    total = node_pred + edge_pred
                    per_block[block_key] = per_block.get(block_key, 0) + total
            results[target_name] = per_block
            results[f"_ll_features::{target_name}"] = node_ll
        return results


class FlashMD(AtomisticNNModel):
    ARCHITECTURE_NAME = "experimental.flashmd"
    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float32, jnp.bfloat16]
    __default_metadata__ = {
        "references": {"architecture": ["https://arxiv.org/abs/2505.19350"]}
    }

    def __init__(self, hypers, dataset_info: DatasetInfo, compute_dtype=jnp.float32):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        super().__init__(full, dataset_info, compute_dtype)
        for name, info in self.target_infos.items():
            if not (info.is_cartesian and info.per_atom and info.rank == 1):
                raise ValueError(
                    "FlashMD targets must be per-atom Cartesian vectors "
                    f"(got '{name}': {info})"
                )
        hp = self.hypers
        self.cutoff = float(hp["cutoff"])
        self.cutoff_width = float(hp["cutoff_width"])
        self.cutoff_function = hp["cutoff_function"].lower()
        self.num_neighbors_adaptive = hp["num_neighbors_adaptive"]
        self.cutoff_width_adaptive = float(hp["cutoff_width_adaptive"])
        self.module = FlashMDModule(
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
            output_shapes=self.output_shapes,
            dtype=compute_dtype,
        )

    # PET geometry preprocessing + momenta/masses passthrough
    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        pet_pre = PET.preprocess  # reuse the PET implementation
        data = pet_pre(self, batch)
        A = batch.n_atoms_padded
        dtype = batch.positions.dtype
        momenta = batch.extra.get(
            "momenta", jnp.zeros((A, 3), dtype=dtype)
        ).astype(dtype)
        masses = batch.extra.get("masses", jnp.ones((A,), dtype=dtype)).astype(
            dtype
        )
        data["momenta"] = momenta
        data["masses"] = masses
        return data

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff

    def requested_extra_system_keys(self) -> Sequence[str]:
        return ("momenta", "masses")

    def extra_removal_transforms(self):
        return [self.remove_baseline_transform]

    # -- additive baselines: current positions / momenta -----------------------

    def remove_baseline_transform(self, samples: List[Sample]) -> List[Sample]:
        """Train on displacements: subtract current positions from the
        ``positions`` target (and optionally current momenta)."""
        out = []
        for sample in samples:
            new_targets = dict(sample.targets)
            if "positions" in new_targets:
                new_targets["positions"] = _subtract_per_atom(
                    new_targets["positions"], sample.system.positions
                )
            if (
                self.hypers["predict_momenta_as_difference"]
                and "momenta" in new_targets
                and "momenta" in sample.system.extra
            ):
                new_targets["momenta"] = _subtract_per_atom(
                    new_targets["momenta"],
                    np.asarray(sample.system.extra["momenta"]),
                )
            out.append(Sample(sample.system, new_targets, sample.extra_data))
        return out

    def forward_eval(self, params, batch, outputs, selected_atoms=None):
        results = self.forward(params, batch, outputs, selected_atoms)
        results = self.scaler.apply_scales(results, batch)
        if "positions" in results:
            results["positions"] = _add_per_atom(
                results["positions"], batch.positions
            )
        if (
            self.hypers["predict_momenta_as_difference"]
            and "momenta" in results
            and "momenta" in batch.extra
        ):
            results["momenta"] = _add_per_atom(
                results["momenta"], batch.extra["momenta"]
            )
        return results


def _subtract_per_atom(tmap: TensorMap, values: np.ndarray) -> TensorMap:
    block = tmap.block(0)
    new_block = TensorBlock(
        np.asarray(block.values) - values[:, :, None],
        block.samples,
        block.components,
        block.properties,
        block.mask,
    )
    return TensorMap(tmap.keys, [new_block])


def _add_per_atom(tmap: TensorMap, values) -> TensorMap:
    block = tmap.block(0)
    new_block = TensorBlock(
        block.values + values[:, :, None].astype(block.values.dtype),
        block.samples,
        block.components,
        block.properties,
        block.mask,
    )
    return TensorMap(tmap.keys, [new_block])


class FlashMDTrainer(NNTrainer):
    DEFAULT_HYPERS = copy.deepcopy(DEFAULT_TRAINER_HYPERS)
    DEFAULT_HYPERS.update({"o3_augmentation": False})


__model__ = FlashMD
__trainer__ = FlashMDTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": copy.deepcopy(FlashMDTrainer.DEFAULT_HYPERS),
}
