"""PET: Point Edge Transformer, the flagship architecture.

TPU-native re-design of the reference ``src/metatrain/pet/model.py`` (+
``modules/backend.py``): all preprocessing (edge vectors, cutoff factors,
adaptive cutoffs, NEF species indices) runs inside the jitted forward on
the already-NEF-shaped :class:`SystemBatch`; the heavy compute is the
flax :class:`PETModule`. Forces and stress are produced by the shared
autograd engine (``engine/evaluate.py``), not here.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Sequence

import jax.numpy as jnp

from ...containers import SystemBatch
from ...data.target_info import DatasetInfo
from ..nn_base import AtomisticNNModel
from .adaptive import get_adaptive_cutoffs
from .modules import PETModule, cutoff_func_bump, cutoff_func_cosine


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # reference defaults: pet/documentation.py:156-260
    "cutoff": 4.5,
    "num_neighbors_adaptive": None,
    "adaptive_cutoff_method": "solver",
    "cutoff_function": "Bump",
    "cutoff_width": 0.5,
    "cutoff_width_adaptive": 1.0,
    "d_pet": 128,
    "d_head": 128,
    "d_node": 256,
    "d_feedforward": 256,
    "num_heads": 8,
    "num_attention_layers": 2,
    "num_gnn_layers": 2,
    "normalization": "RMSNorm",
    "activation": "SwiGLU",
    "attention_temperature": 1.0,
    "transformer_type": "PreLN",
    "featurizer_type": "feedforward",
    "zbl": False,
    "long_range": {
        "enable": False,
        "smearing": 1.4,
        "n_kmax": 4,
        "method": "ewald",
        "mesh": 32,
    },
    "system_conditioning": False,
    "max_charge": 10,
    "max_spin_multiplicity": 10,
    # TPU memory knob: rematerialize GNN layers in the backward pass
    "remat": False,
    # fully-fused Pallas transformer layers (PreLN/RMSNorm/SwiGLU only):
    # one HBM read + write per layer, M-expanded attention inside, fused
    # accumulating backward (ops/pallas/fused_layer.py)
    "fused_layers": True,
    # Pallas window-attention kernel in the unfused layer path; False =
    # pure-XLA attention (native grad-of-grad, no replay)
    "fused_attention": True,
}


class PET(AtomisticNNModel):
    """Point Edge Transformer."""

    ARCHITECTURE_NAME = "pet"
    __checkpoint_version__ = 3
    __supported_dtypes__ = [jnp.float32, jnp.bfloat16]
    __default_metadata__ = {
        "references": {
            "architecture": [
                "https://arxiv.org/abs/2305.19302",  # PET
                "https://arxiv.org/abs/2504.12353",  # PET-MAD
            ]
        }
    }

    def __init__(
        self,
        hypers: Dict[str, Any],
        dataset_info: DatasetInfo,
        compute_dtype=jnp.float32,
    ):
        full_hypers = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full_hypers.update(hypers or {})
        super().__init__(full_hypers, dataset_info, compute_dtype)
        hp = self.hypers

        self.cutoff = float(hp["cutoff"])
        self.cutoff_width = float(hp["cutoff_width"])
        self.cutoff_function = hp["cutoff_function"].lower()
        self.num_neighbors_adaptive = hp["num_neighbors_adaptive"]
        self.cutoff_width_adaptive = float(hp["cutoff_width_adaptive"])

        if hp["zbl"]:
            from ..zbl import ZBL

            self.zbl = ZBL(dataset_info, self.cutoff, self.cutoff_width)

        self.module = PETModule(
            hypers={
                k: hp[k]
                for k in (
                    "d_pet",
                    "d_node",
                    "d_head",
                    "d_feedforward",
                    "num_heads",
                    "num_attention_layers",
                    "num_gnn_layers",
                    "normalization",
                    "activation",
                    "attention_temperature",
                    "transformer_type",
                    "featurizer_type",
                    "remat",
                    "fused_layers",
                    "fused_attention",
                    "system_conditioning",
                    "max_charge",
                    "max_spin_multiplicity",
                )
            },
            num_species=len(self.atomic_types),
            output_shapes=self.output_shapes,
            dtype=compute_dtype,
            long_range=dict(hp["long_range"]),
        )

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        """Edge vectors, distances, cutoff factors and NEF indices.

        Counterpart of reference ``pet/modules/structures.py:115-378``,
        with two structural differences: the NEF layout and reversed-edge
        index come precomputed from the host neighbor builder, and the
        adaptive cutoff acts via smooth factors instead of edge filtering.
        """
        vectors, distances = batch.edge_vectors()
        species_index = self.species_index(batch)
        neighbor_species_index = species_index[batch.nbr_indices]

        if self.num_neighbors_adaptive is not None:
            if self.hypers.get("adaptive_cutoff_method") == "probe":
                # SPACE's probe-grid scheme (reference
                # experimental/space/modules/adaptive_cutoff.py)
                from .adaptive import get_probe_adaptive_cutoffs

                adaptive_fn = get_probe_adaptive_cutoffs
            else:
                adaptive_fn = get_adaptive_cutoffs
            atomic_cutoffs = adaptive_fn(
                distances,
                batch.nbr_mask,
                float(self.num_neighbors_adaptive),
                self.cutoff,
                self.cutoff_width_adaptive,
            )
            # symmetrize between edge endpoints (reference
            # ``structures.py:253-255``)
            nbr_cutoffs = atomic_cutoffs[batch.nbr_indices]
            pair_cutoffs = 0.5 * (atomic_cutoffs[:, None] + nbr_cutoffs)
        else:
            atomic_cutoffs = jnp.full(
                (batch.n_atoms_padded,), self.cutoff, dtype=distances.dtype
            )
            pair_cutoffs = jnp.full_like(distances, self.cutoff)

        if self.cutoff_function == "bump":
            cutoff_factors = cutoff_func_bump(
                distances, pair_cutoffs, self.cutoff_width
            )
        else:
            cutoff_factors = cutoff_func_cosine(
                distances, pair_cutoffs, self.cutoff_width
            )
        cutoff_factors = jnp.where(batch.nbr_mask, cutoff_factors, 0.0)

        # geometry stays in the batch dtype (>= compute dtype): cutoff
        # factors weight the readout sum and must not lose precision
        return {
            "species_index": species_index,
            "neighbor_species_index": neighbor_species_index,
            "edge_vectors": vectors,
            "edge_distances": distances,
            "nbr_mask": batch.nbr_mask,
            "nbr_indices": batch.nbr_indices,
            "nbr_reverse": batch.nbr_reverse,
            # colored reversed-edge kernel inputs (color_band == 0 and
            # color_groups == () when the batch was not built with the
            # colored NEF layout)
            "color_band": batch.color_band,
            "color_groups": batch.color_groups,
            "color_fixup_split": batch.color_fixup_split,
            "nbr_fixup_src": batch.nbr_fixup_src,
            "nbr_fixup_dst": batch.nbr_fixup_dst,
            "cutoff_factors": cutoff_factors,
            "atomic_cutoffs": atomic_cutoffs,
            # long-range featurizer inputs
            "positions": batch.positions,
            "cells": batch.cells,
            "pbc": batch.pbc,
            "system_index": batch.system_index,
            "atom_mask": batch.atom_mask,
            # conditioning inputs (defaults: neutral singlet, reference
            # pet/documentation.py:80-84)
            "charge": batch.extra.get(
                "charge", jnp.zeros((batch.n_systems_padded,))
            ),
            "spin_multiplicity": batch.extra.get(
                "spin_multiplicity", jnp.ones((batch.n_systems_padded,))
            ),
        }

    def forward(self, params, batch, outputs, selected_atoms=None):
        """Adds ``mtt::aux::cutoff_stats`` (column 0 = per-atom adaptive
        cutoff, column 1 = smoothed neighbor count; reference
        ``pet/model.py:125-133``) on top of the shared aux outputs."""
        stats_name = "mtt::aux::cutoff_stats"
        names = [n for n in outputs if n != stats_name]
        results = (
            super().forward(params, batch, names, selected_atoms)
            if names
            else {}
        )
        if stats_name in outputs:
            amask = batch.atom_mask
            if selected_atoms is not None:
                amask = amask & selected_atoms
            d = self.preprocess(batch)
            smooth_counts = jnp.sum(
                jnp.where(d["nbr_mask"], d["cutoff_factors"], 0.0), axis=1
            )
            stats = jnp.stack(
                [d["atomic_cutoffs"], smooth_counts], axis=1
            )
            results[stats_name] = self._per_atom_feature_map(
                stats, batch, amask
            )
        return results

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff

    def requested_extra_system_keys(self) -> Sequence[str]:
        if self.hypers["system_conditioning"]:
            return ("charge", "spin_multiplicity")
        return ()

    @classmethod
    def upgrade_v1_v2(cls, checkpoint):
        """v1 checkpoints predate the ``fused_layers`` default flip (their
        parameters use the unfused TransformerLayer structure): pin the
        hypers that select the parameter layout they were saved with."""
        hypers = dict(checkpoint["hypers"])
        hypers.setdefault("fused_layers", False)
        hypers.setdefault("remat", False)
        checkpoint = dict(checkpoint)
        checkpoint["hypers"] = hypers
        return checkpoint

    @classmethod
    def upgrade_v2_v3(cls, checkpoint):
        """v3 records the ``fused_attention`` hyper explicitly and carries
        the scaler's full decomposition (``scales`` lists +
        ``per_target``; the scaler sub-checkpoint's own v1->v2 migration
        rebuilds it). Parameters are unchanged: fill the new hyper with
        the value v2 models behaved as."""
        hypers = dict(checkpoint["hypers"])
        hypers.setdefault("fused_attention", True)
        checkpoint = dict(checkpoint)
        checkpoint["hypers"] = hypers
        return checkpoint
