"""MACE-family: higher-order equivariant message passing.

TPU-native replacement for the reference's wrapper around ``mace-torch``/
``e3nn`` (``src/metatrain/experimental/mace/``): instead of wrapping an
external CUDA-kernel library, the equivariant stack is built natively --
our exact real-CG tables (``ops/cg.py``) drive dense per-path einsums over
the NEF layout, which XLA maps straight onto the MXU (the "padded per-L
dense einsum" strategy from SURVEY.md section 7.2 item 3).

Model structure per interaction (MACE-style, SO(3)):

- edge attributes: Bessel radial basis x spherical harmonics Y^l(u_ij),
  smooth cutoff envelope;
- density/interaction: for every CG path (l1, l2 -> L), neighbor features
  h_j^{l1} are combined with edge attributes l2 into messages m_i^L with
  learned per-path radial weights;
- product: optional on-node CG self-product (correlation order 2,
  MACE's B-basis idea) mixed back into the features;
- update: per-l linear channel mixing + residual;
- readout: invariant (l=0) channels -> per-atom MLP -> targets.

Exact parity with the MACE paper's symmetric contractions (arXiv:2206.07697)
is future work; this is the native equivariant-MPNN capability slot.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..containers import SystemBatch
from ..data.target_info import DatasetInfo
from ..engine.trainer import DEFAULT_TRAINER_HYPERS, NNTrainer
from ..ops.cg import real_clebsch_gordan
from ..ops.radial import radial_basis
from ..ops.spherical import real_spherical_harmonics
from .nn_base import AtomisticNNModel


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # reference mace-torch defaults, adapted (experimental/mace/documentation.py)
    "cutoff": 5.0,
    "cutoff_width": 0.5,
    "num_radial": 8,
    "max_ell": 2,  # highest irrep order carried on nodes/messages
    "num_channels": 32,
    "num_interactions": 2,
    "correlation": 2,  # 1: linear messages; 2: + on-node CG self-product
    "mlp_width": 64,
}


class EquivariantInteraction(nn.Module):
    """One interaction: CG-coupled neighbor aggregation + channel mixing."""

    max_ell: int
    num_channels: int
    num_radial: int
    correlation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], edge_data):
        # features[l]: (A, C, 2l+1)
        radial, sph, nbr_idx, nbr_mask = edge_data
        A, M = nbr_mask.shape
        C = self.num_channels
        lmax = self.max_ell

        messages: List[jnp.ndarray] = [
            jnp.zeros((A, C, 2 * L + 1), dtype=self.dtype)
            for L in range(lmax + 1)
        ]
        acc = jnp.promote_types(jnp.float32, self.dtype)
        for l1 in range(lmax + 1):
            # gather neighbor features once per l1: (A, M, C, 2l1+1)
            h_nbr = features[l1][nbr_idx]
            for l2 in range(lmax + 1):
                for L in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                    cg = jnp.asarray(
                        real_clebsch_gordan(l1, l2, L), dtype=acc
                    )
                    # learned per-channel radial weights for this path
                    w = nn.Dense(
                        C,
                        use_bias=False,
                        dtype=self.dtype,
                        name=f"radial_{l1}_{l2}_{L}",
                    )(radial)  # (A, M, C)
                    weighted = h_nbr * w[:, :, :, None]
                    # sum over neighbors: (A, C, 2l1+1, 2l2+1)
                    outer = jnp.einsum(
                        "amcp,amq->acpq",
                        weighted,
                        sph[l2],
                        preferred_element_type=acc,
                    )
                    messages[L] = messages[L] + jnp.einsum(
                        "acpq,pqk->ack", outer, cg, preferred_element_type=acc
                    ).astype(self.dtype)

        if self.correlation >= 2:
            # on-node self-product (MACE B-basis flavor): couple the
            # invariant channels with each irrep to re-weight messages
            gate = nn.Dense(
                C, dtype=self.dtype, name="product_gate"
            )(messages[0][:, :, 0])
            gate = jax.nn.silu(gate)
            messages = [
                m * gate[:, :, None] if L > 0 else m
                for L, m in enumerate(messages)
            ]

        # channel mixing per l (contract the channel axis) + residual
        out: List[jnp.ndarray] = []
        for L in range(lmax + 1):
            mixed = nn.Dense(
                C, use_bias=False, dtype=self.dtype, name=f"mix_{L}"
            )(messages[L].transpose(0, 2, 1)).transpose(0, 2, 1)
            out.append(features[L] + mixed)
        return out


class MACEModule(nn.Module):
    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any], requested: Sequence[str]):
        hp = self.hypers
        lmax, C = hp["max_ell"], hp["num_channels"]
        A, M = batch_data["nbr_mask"].shape

        distances = batch_data["edge_distances"]
        radial = radial_basis(
            distances, hp["cutoff"], hp["num_radial"], "bessel", hp["cutoff_width"]
        )
        radial = jnp.where(
            batch_data["nbr_mask"][:, :, None], radial, 0.0
        ).astype(self.dtype)
        unit = batch_data["edge_vectors"] / jnp.maximum(distances, 1e-10)[
            :, :, None
        ]
        sph = [
            jnp.where(
                batch_data["nbr_mask"][:, :, None], y, 0.0
            ).astype(self.dtype)
            for y in real_spherical_harmonics(unit, lmax)
        ]

        # initial features: species embedding in the invariant channel
        h0 = nn.Embed(
            self.num_species, C, dtype=self.dtype, name="species_embedding"
        )(batch_data["species_index"])
        features: List[jnp.ndarray] = [h0[:, :, None]] + [
            jnp.zeros((A, C, 2 * L + 1), dtype=self.dtype)
            for L in range(1, lmax + 1)
        ]

        edge_data = (radial, sph, batch_data["nbr_indices"], batch_data["nbr_mask"])
        for t in range(hp["num_interactions"]):
            features = EquivariantInteraction(
                max_ell=lmax,
                num_channels=C,
                num_radial=hp["num_radial"],
                correlation=hp["correlation"],
                dtype=self.dtype,
                name=f"interaction_{t}",
            )(features, edge_data)

        invariants = features[0][:, :, 0]  # (A, C)
        hidden = nn.Dense(hp["mlp_width"], dtype=self.dtype, name="readout_0")(
            invariants
        )
        hidden = jax.nn.silu(hidden)

        results: Dict[str, Any] = {"_features": invariants}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            head = nn.Dense(
                hp["mlp_width"], dtype=self.dtype, name=f"head_{safe}"
            )(hidden)
            head = jax.nn.silu(head)
            results[f"_ll_features::{target_name}"] = head
            per_block = {}
            for block_key, size in shapes.items():
                per_block[block_key] = nn.Dense(
                    size, dtype=self.dtype, name=f"last_{safe}_{block_key}"
                )(head)
            results[target_name] = per_block
        return results


class MACE(AtomisticNNModel):
    ARCHITECTURE_NAME = "experimental.mace"
    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]
    __default_metadata__ = {
        "references": {"architecture": ["https://arxiv.org/abs/2206.07697"]}
    }

    def __init__(self, hypers, dataset_info: DatasetInfo, compute_dtype=jnp.float32):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        super().__init__(full, dataset_info, compute_dtype)
        for name, info in self.target_infos.items():
            if not info.is_scalar:
                raise NotImplementedError(
                    f"MACE tensorial target '{name}': equivariant readout "
                    "for non-scalar targets pending"
                )
        self.cutoff = float(full["cutoff"])
        self.module = MACEModule(
            hypers=dict(full),
            num_species=len(self.atomic_types),
            output_shapes=self.output_shapes,
            dtype=compute_dtype,
        )

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        vectors, distances = batch.edge_vectors()
        species_index = self.species_index(batch)
        return {
            "species_index": species_index,
            "edge_vectors": vectors,
            "edge_distances": distances,
            "nbr_indices": batch.nbr_indices,
            "nbr_mask": batch.nbr_mask,
        }

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff


class MACETrainer(NNTrainer):
    DEFAULT_HYPERS = copy.deepcopy(DEFAULT_TRAINER_HYPERS)
    DEFAULT_HYPERS.update({"learning_rate": 5e-3, "o3_augmentation": False})


__model__ = MACE
__trainer__ = MACETrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": copy.deepcopy(MACETrainer.DEFAULT_HYPERS),
}
