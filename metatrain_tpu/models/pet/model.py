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
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...containers import (
    Labels,
    NeighborData,
    System,
    SystemBatch,
    TensorBlock,
    TensorMap,
    batch_from_systems,
)
from ...data.target_info import DatasetInfo, TargetInfo
from ...ops.segment import sum_over_atoms
from ...utils.abc import ModelInterface
from ..composition import CompositionModel
from ..scaler import Scaler
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
    "long_range": {"enable": False},
    "system_conditioning": False,
    "max_charge": 10,
    "max_spin_multiplicity": 10,
}


def _block_key_str(key_tuple) -> str:
    return "_".join(str(int(v)) for v in key_tuple)


class PET(ModelInterface):
    """Point Edge Transformer."""

    __checkpoint_version__ = 1
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
        super().__init__(full_hypers, dataset_info)
        hp = self.hypers

        if hp["long_range"].get("enable"):
            raise NotImplementedError("PET long-range features: pending")

        self.atomic_types = list(dataset_info.atomic_types)
        self.compute_dtype = compute_dtype
        self.cutoff = float(hp["cutoff"])
        self.cutoff_width = float(hp["cutoff_width"])
        self.cutoff_function = hp["cutoff_function"].lower()
        self.num_neighbors_adaptive = hp["num_neighbors_adaptive"]
        self.cutoff_width_adaptive = float(hp["cutoff_width_adaptive"])

        self.target_infos: Dict[str, TargetInfo] = dict(dataset_info.targets)
        self.output_shapes: Dict[str, Dict[str, int]] = {}
        for name, info in self.target_infos.items():
            shapes: Dict[str, int] = {}
            for key_tuple, block in info.layout.items():
                size = int(
                    np.prod([len(c) for c in block.components], initial=1)
                ) * len(block.properties)
                shapes[_block_key_str(key_tuple)] = size
            self.output_shapes[name] = shapes

        self._species_lookup = self._build_species_lookup()
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
                )
            },
            num_species=len(self.atomic_types),
            output_shapes=self.output_shapes,
            dtype=compute_dtype,
        )

        # additive baselines applied at evaluation only
        self.composition = CompositionModel({}, dataset_info)
        self.scaler = Scaler({}, dataset_info)

    # -- species mapping -------------------------------------------------------

    def _build_species_lookup(self) -> np.ndarray:
        size = max(self.atomic_types) + 1 if self.atomic_types else 1
        lookup = np.zeros((size,), dtype=np.int32)
        for i, z in enumerate(self.atomic_types):
            lookup[z] = i
        return lookup

    # -- preprocessing (jit-traceable) --------------------------------------------

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        """Edge vectors, distances, cutoff factors and NEF indices.

        Counterpart of reference ``pet/modules/structures.py:115-378``,
        with two structural differences: NEF layout and the reversed-edge
        index come precomputed from the host neighbor builder, and the
        adaptive cutoff acts via smooth factors instead of edge filtering.
        """
        vectors, distances = batch.edge_vectors()
        lookup = jnp.asarray(self._species_lookup)
        species_index = lookup[jnp.clip(batch.types, 0, lookup.shape[0] - 1)]
        neighbor_species_index = species_index[batch.nbr_indices]

        if self.num_neighbors_adaptive is not None:
            atomic_cutoffs = get_adaptive_cutoffs(
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
            "nbr_reverse": batch.nbr_reverse,
            "cutoff_factors": cutoff_factors,
            "atomic_cutoffs": atomic_cutoffs,
        }

    # -- parameter init ------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Any:
        dummy = self._dummy_batch()
        batch_data = self.preprocess(dummy)
        params = self.module.init(
            rng, batch_data, tuple(self.output_shapes.keys())
        )
        self.params = params
        return params

    def _dummy_batch(self) -> SystemBatch:
        system = System(
            positions=np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
            types=np.array(
                [self.atomic_types[0], self.atomic_types[-1]], dtype=np.int32
            ),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        nbr = NeighborData(
            indices=np.array([[1], [0]], dtype=np.int32),
            shifts=np.zeros((2, 1, 3), dtype=np.int32),
            mask=np.ones((2, 1), dtype=bool),
            reverse=np.array([[1], [0]], dtype=np.int32),
        )
        return batch_from_systems([system], [nbr], dtype=jnp.float32)

    # -- forward -----------------------------------------------------------------

    def forward(
        self,
        params: Any,
        batch: SystemBatch,
        outputs: Sequence[str],
    ) -> Dict[str, TensorMap]:
        """Training-space predictions (no scaler/additive contributions)."""
        requested = tuple(n for n in outputs if n in self.output_shapes)
        batch_data = self.preprocess(batch)
        raw = self.module.apply(params, batch_data, requested)

        results: Dict[str, TensorMap] = {}
        for name in requested:
            results[name] = self._assemble_target(
                name, raw[name], batch
            )
        return results

    def forward_eval(
        self,
        params: Any,
        batch: SystemBatch,
        outputs: Sequence[str],
    ) -> Dict[str, TensorMap]:
        """Evaluation predictions: scaler + additive baselines applied
        (reference ``pet/model.py:591-660``)."""
        results = self.forward(params, batch, outputs)
        results = self.scaler.apply_scales(results)
        comp_params = self.composition._device_params(dtype=jnp.float32)
        additive = self.composition.forward(comp_params, batch, list(results))
        for name, contribution in additive.items():
            if name not in results:
                continue
            results[name] = _add_tensormaps(results[name], contribution)
        return results

    def _assemble_target(
        self,
        name: str,
        per_block: Dict[str, jnp.ndarray],
        batch: SystemBatch,
    ) -> TensorMap:
        info = self.target_infos[name]
        per_atom = info.per_atom
        A = batch.n_atoms_padded
        S = batch.n_systems_padded

        blocks = []
        for key_tuple, layout_block in info.layout.items():
            flat = per_block[_block_key_str(key_tuple)]
            flat = flat.astype(jnp.promote_types(jnp.float32, flat.dtype))
            comp_sizes = tuple(len(c) for c in layout_block.components)
            n_props = len(layout_block.properties)

            if name == "non_conservative_stress":
                flat = _process_stress_like(
                    flat, batch, n_props
                ).reshape(A, -1)

            if per_atom:
                values = flat.reshape((A,) + comp_sizes + (n_props,))
                values = jnp.where(
                    batch.atom_mask.reshape((A,) + (1,) * (values.ndim - 1)),
                    values,
                    0.0,
                )
                samples = Labels(
                    ["system", "atom"],
                    jnp.stack(
                        [
                            batch.system_index,
                            jnp.arange(A, dtype=jnp.int32),
                        ],
                        axis=1,
                    ),
                )
                mask = batch.atom_mask
            else:
                summed = sum_over_atoms(
                    flat, batch.system_index, S, batch.atom_mask
                )
                values = summed.reshape((S,) + comp_sizes + (n_props,))
                samples = Labels.range("system", S)
                mask = batch.system_mask

            blocks.append(
                TensorBlock(
                    values=values,
                    samples=samples,
                    components=layout_block.components,
                    properties=layout_block.properties,
                    mask=mask,
                )
            )
        return TensorMap(info.layout.keys, blocks)

    # -- metadata ----------------------------------------------------------------

    def supported_outputs(self) -> Dict[str, TargetInfo]:
        return dict(self.target_infos)

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff

    def requested_extra_system_keys(self) -> Sequence[str]:
        if self.hypers["system_conditioning"]:
            return ("charge", "spin_multiplicity")
        return ()

    # -- lifecycle ------------------------------------------------------------------

    def restart(self, dataset_info: DatasetInfo) -> "PET":
        if dataset_info == self.dataset_info:
            return self
        merged = self.dataset_info.union(dataset_info)
        if merged.atomic_types != self.dataset_info.atomic_types:
            raise ValueError(
                "PET cannot be restarted with new atomic types; "
                f"missing {set(merged.atomic_types) - set(self.atomic_types)}"
            )
        new = PET(self.hypers, merged, self.compute_dtype)
        new.params = self.params  # heads for new targets created lazily on init
        new.composition = self.composition.restart(merged)
        new.scaler = self.scaler.restart(merged)
        return new

    # -- checkpointing ----------------------------------------------------------------

    def get_checkpoint(self) -> Dict[str, Any]:
        return {
            "architecture_name": "pet",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": copy.deepcopy(dict(self.hypers)),
            "dataset_info": self.dataset_info.to_dict(),
            "params": self.params,
            "composition": self.composition.get_checkpoint(),
            "scaler": self.scaler.get_checkpoint(),
        }

    @classmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], context: str = "restart"
    ) -> "PET":
        model = cls(
            checkpoint["hypers"],
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
        )
        model.params = jax.tree_util.tree_map(
            jnp.asarray, checkpoint["params"]
        )
        model.composition = CompositionModel.load_checkpoint(
            checkpoint["composition"]
        )
        model.scaler = Scaler.load_checkpoint(checkpoint["scaler"])
        return model


def _process_stress_like(
    flat: jnp.ndarray, batch: SystemBatch, n_props: int
) -> jnp.ndarray:
    """Symmetrize rank-2 outputs and divide by cell volume
    (reference ``backend.py:780-813``)."""
    A = flat.shape[0]
    t = flat.reshape(A, 3, 3, n_props)
    volumes = jnp.abs(jnp.linalg.det(batch.cells))
    volumes = jnp.where(volumes == 0.0, jnp.inf, volumes)
    v_atom = volumes[batch.system_index][:, None, None, None]
    t = t / v_atom
    return 0.5 * (t + jnp.swapaxes(t, 1, 2))


def _add_tensormaps(a: TensorMap, b: TensorMap) -> TensorMap:
    """Blockwise sum for additive contributions (same keys assumed)."""
    blocks = []
    for block_a, block_b in zip(a.blocks(), b.blocks()):
        new_block = TensorBlock(
            values=block_a.values + block_b.values.astype(block_a.values.dtype),
            samples=block_a.samples,
            components=block_a.components,
            properties=block_a.properties,
            mask=block_a.mask,
        )
        for gname, grad in block_a.gradients():
            new_block.add_gradient(gname, grad)
        blocks.append(new_block)
    return TensorMap(a.keys, blocks)
