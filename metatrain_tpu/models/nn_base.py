"""Shared base for neural-network architectures.

Everything an atomistic NN model needs besides its network: species
lookup, per-target output-shape bookkeeping, TensorMap assembly (per-atom
vs per-structure, stress-like post-processing), embedded
composition/scaler baselines with eval-time application, and versioned
checkpointing. PET, SOAP-BPNN (and future architectures) subclass this
and provide ``preprocess`` + a flax module.

Reference counterpart: the duplicated model-side bookkeeping in
``pet/model.py`` / ``soap_bpnn/model.py``.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import (
    Labels,
    NeighborData,
    System,
    SystemBatch,
    TensorBlock,
    TensorMap,
    batch_from_systems,
)
from ..data.target_info import DatasetInfo, TargetInfo
from ..ops.segment import sum_over_atoms
from ..utils.abc import ModelInterface
from .composition import CompositionModel
from .scaler import Scaler


def block_key_str(key_tuple) -> str:
    return "_".join(str(int(v)) for v in key_tuple)


DIAGNOSTIC_PREFIX = "mtt::feature::"
"""Output-name prefix for intermediate-tensor capture (reference
``pet/modules/diagnostic.py:24``): ``mtt::feature::<module.path>``
resolves dots to the flax module tree, e.g.
``mtt::feature::backbone.gnn_layer_0.layer_0``. Tuple-valued module
outputs take a trailing element index (``....layer_0.1``)."""


def _lookup_intermediate(tree, path: str):
    """Navigate flax ``capture_intermediates`` output by a dotted path."""

    def unwrap(node):
        if isinstance(node, dict) and "__call__" in node:
            node = node["__call__"]
        # flax stores each capture as a length-1 tuple of the call output
        while isinstance(node, (tuple, list)) and len(node) == 1:
            node = node[0]
        return node

    node = tree
    for part in path.split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
            continue
        node = unwrap(node)
        if isinstance(node, (tuple, list)) and part.isdigit():
            node = node[int(part)]
            continue
        available = (
            sorted(k for k in node if not k.startswith("__"))
            if isinstance(node, dict)
            else f"tuple of {len(node)}"
            if isinstance(node, (tuple, list))
            else type(node).__name__
        )
        raise KeyError(
            f"diagnostic path '{path}' not found at '{part}' "
            f"(available: {available})"
        )
    node = unwrap(node)
    if isinstance(node, (tuple, list)):
        raise KeyError(
            f"diagnostic path '{path}' resolves to a tuple of "
            f"{len(node)} tensors; append an element index (e.g. "
            f"'{path}.0')"
        )
    return node


def selection_mask(batch: SystemBatch, pairs) -> jnp.ndarray:
    """(A,) boolean mask from (system, atom) sample pairs.

    Host-facing equivalent of the reference's ``selected_atoms`` Labels
    (``utils/testing/output.py:470-501``): ``pairs`` is a (K, 2) integer
    array in the same convention as per-atom sample labels (system index,
    padded atom slot). The mask selects exactly those slots.
    """
    pairs = np.asarray(pairs, dtype=np.int64)
    mask = np.zeros(int(batch.n_atoms_padded), dtype=bool)
    system_index = np.asarray(jax.device_get(batch.system_index))
    for sys_i, atom_slot in pairs:
        if 0 <= atom_slot < mask.shape[0] and system_index[atom_slot] == sys_i:
            mask[atom_slot] = True
    return jnp.asarray(mask)


class AtomisticNNModel(ModelInterface):
    """Base class: flax network + baselines + TensorMap assembly."""

    ARCHITECTURE_NAME = "base"

    def __init__(
        self,
        hypers: Dict[str, Any],
        dataset_info: DatasetInfo,
        compute_dtype=jnp.float32,
    ):
        super().__init__(hypers, dataset_info)
        self.compute_dtype = compute_dtype
        self.atomic_types = list(dataset_info.atomic_types)
        self.target_infos: Dict[str, TargetInfo] = dict(dataset_info.targets)

        self.output_shapes: Dict[str, Dict[str, int]] = {}
        for name, info in self.target_infos.items():
            shapes: Dict[str, int] = {}
            for key_tuple, block in info.layout.items():
                size = int(
                    np.prod([len(c) for c in block.components], initial=1)
                ) * len(block.properties)
                shapes[block_key_str(key_tuple)] = size
            self.output_shapes[name] = shapes

        self._species_lookup = self._build_species_lookup()
        self.module = None  # set by subclass
        self.composition = CompositionModel({}, dataset_info)
        self.scaler = Scaler({}, dataset_info)
        self.zbl = None  # set by subclass when hypers["zbl"]
        # fixed baselines carried by the model itself (foundation-model
        # imports): consumed by the trainer unless the user overrides
        # (reference ``get_fixed_composition_weights``,
        # ``experimental/mace/model.py:785-826``)
        self._fixed_composition_weights: Dict[str, Any] = {}
        self._fixed_scaling_weights: Dict[str, Any] = {}

    def get_fixed_composition_weights(self) -> Dict[str, Any]:
        """``{target: {Z: baseline}}`` the trainer must treat as fixed
        (not refit). Populated by foundation-model imports."""
        return self._fixed_composition_weights

    def get_fixed_scaling_weights(self) -> Dict[str, Any]:
        """``{target: scale | {Z: scale}}`` fixed scaling weights."""
        return self._fixed_scaling_weights

    # -- to implement in subclasses ---------------------------------------

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        raise NotImplementedError

    def extra_removal_transforms(self):
        """Architecture-specific target-baseline removals applied in the
        collate pipeline before scaling (e.g. FlashMD's current-position
        subtraction)."""
        return []

    # -- species ------------------------------------------------------------

    def _build_species_lookup(self) -> np.ndarray:
        size = max(self.atomic_types) + 1 if self.atomic_types else 1
        lookup = np.zeros((size,), dtype=np.int32)
        for i, z in enumerate(self.atomic_types):
            lookup[z] = i
        return lookup

    def species_index(self, batch: SystemBatch) -> jnp.ndarray:
        lookup = jnp.asarray(self._species_lookup)
        return lookup[jnp.clip(batch.types, 0, lookup.shape[0] - 1)]

    # -- parameter init -------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Any:
        dummy = self._dummy_batch()
        batch_data = self.preprocess(dummy)
        # eager init: flax would otherwise jit-compile the whole forward
        # graph just to create parameters (tens of seconds for the larger
        # architectures)
        with jax.disable_jit():
            self.params = self.module.init(
                rng, batch_data, tuple(self.output_shapes.keys())
            )
        return self.params

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

    # -- forward ---------------------------------------------------------------

    def forward(
        self,
        params: Any,
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms: Optional[jnp.ndarray] = None,
    ) -> Dict[str, TensorMap]:
        """Training-space predictions (no scaler/additive baselines).

        Besides targets, two auxiliary output families are supported
        (reference pet/model.py additional outputs): ``"features"`` (the
        internal per-atom representation) and
        ``"mtt::aux::{target}_last_layer_features"``.

        :param selected_atoms: optional (A,) boolean mask over padded atom
            slots; per-atom outputs are restricted to (masked outside) the
            selection and per-structure outputs sum ONLY the selected
            atoms' contributions (reference ``forward(..,
            selected_atoms)``, pet/model.py:278 — there a (system, atom)
            Labels list; here a fixed-shape device mask, the TPU-friendly
            equivalent. Build it from index pairs with
            :func:`selection_mask`).
        """
        requested = tuple(n for n in outputs if n in self.output_shapes)
        aux_requested = [n for n in outputs if n not in self.output_shapes]
        ll_requests = {
            n: n.removeprefix("mtt::aux::").removesuffix("_last_layer_features")
            for n in aux_requested
            if n.startswith("mtt::aux::") and n.endswith("_last_layer_features")
        }
        module_targets = tuple(
            dict.fromkeys(list(requested) + list(ll_requests.values()))
        )
        from ..utils.profiling import stage

        amask = batch.atom_mask
        if selected_atoms is not None:
            amask = amask & selected_atoms

        diag_requests = {
            n: n.removeprefix(DIAGNOSTIC_PREFIX)
            for n in aux_requested
            if n.startswith(DIAGNOSTIC_PREFIX)
        }

        with stage("preprocess"):
            batch_data = self.preprocess(batch)
        with stage("module"):
            if diag_requests:
                # capture intermediate module outputs (TPU-native analogue
                # of the reference's temporary forward hooks,
                # pet/modules/diagnostic.py)
                raw, state = self.module.apply(
                    params,
                    batch_data,
                    module_targets,
                    capture_intermediates=True,
                    mutable=["intermediates"],
                )
                intermediates = state["intermediates"]
            else:
                raw = self.module.apply(params, batch_data, module_targets)
        with stage("assemble"):
            results = {
                name: self._assemble_target(name, raw[name], batch, amask)
                for name in requested
            }
        if "features" in aux_requested:
            results["features"] = self._per_atom_feature_map(
                _flatten_features(raw, batch_data), batch, amask
            )
        for output_name, target_name in ll_requests.items():
            features = raw[f"_ll_features::{target_name}"]
            if isinstance(features, tuple):  # PET: (node_list, edge_list)
                features = _concat_node_edge_features(
                    *features, batch_data["cutoff_factors"]
                )
            results[output_name] = self._per_atom_feature_map(
                features, batch, amask
            )
        for output_name, path in diag_requests.items():
            results[output_name] = self._diagnostic_map(
                _lookup_intermediate(intermediates, path), batch, amask
            )
        return results

    def _diagnostic_map(self, tensor, batch: SystemBatch, amask) -> TensorMap:
        """Wrap a captured intermediate as a diagnostic TensorMap
        (reference ``pet/modules/diagnostic.py``): (A, d) tensors get
        per-atom samples, (A, M, d) NEF tensors get per-edge samples
        ``(system, first_atom, second_atom, cell_shift_a/b/c)``."""
        tensor = tensor.astype(jnp.promote_types(jnp.float32, tensor.dtype))
        if tensor.ndim == 2:
            return self._per_atom_feature_map(tensor, batch, amask)
        if tensor.ndim != 3:
            raise ValueError(
                f"diagnostic tensor of rank {tensor.ndim} not supported"
            )
        A, M, d = tensor.shape
        first = jnp.repeat(
            jnp.arange(A, dtype=jnp.int32), M
        )
        second = batch.nbr_indices.reshape(-1).astype(jnp.int32)
        shifts = batch.nbr_shifts.reshape(A * M, 3).astype(jnp.int32)
        samples = Labels(
            [
                "system",
                "first_atom",
                "second_atom",
                "cell_shift_a",
                "cell_shift_b",
                "cell_shift_c",
            ],
            jnp.concatenate(
                [
                    batch.system_index[first][:, None],
                    first[:, None],
                    second[:, None],
                    shifts,
                ],
                axis=1,
            ),
        )
        edge_mask = (batch.nbr_mask & amask[:, None]).reshape(-1)
        values = jnp.where(
            edge_mask[:, None], tensor.reshape(A * M, d), 0.0
        )
        block = TensorBlock(
            values=values,
            samples=samples,
            components=(),
            properties=Labels.range("_", d),
            mask=edge_mask,
        )
        return TensorMap(Labels.single(), [block])

    def _per_atom_feature_map(
        self, features, batch: SystemBatch, amask=None
    ) -> TensorMap:
        if amask is None:
            amask = batch.atom_mask
        features = features.astype(
            jnp.promote_types(jnp.float32, features.dtype)
        )
        features = jnp.where(amask[:, None], features, 0.0)
        block = TensorBlock(
            values=features,
            samples=Labels(
                ["system", "atom"],
                jnp.stack(
                    [
                        batch.system_index,
                        jnp.arange(batch.n_atoms_padded, dtype=jnp.int32),
                    ],
                    axis=1,
                ),
            ),
            components=(),
            properties=Labels.range("property", int(features.shape[-1])),
            mask=amask,
        )
        return TensorMap(Labels.single(), [block])

    def forward_eval(
        self,
        params: Any,
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms: Optional[jnp.ndarray] = None,
    ) -> Dict[str, TensorMap]:
        """Evaluation predictions: scaler + additive baselines applied
        (reference ``pet/model.py:591-660``)."""
        results = self.forward(params, batch, outputs, selected_atoms)
        results = self.scaler.apply_scales(results, batch)
        comp_params = self.composition._device_params(dtype=jnp.float32)
        additive = self.composition.forward(
            comp_params, batch, list(results), selected_atoms
        )
        for name, contribution in additive.items():
            if name in results:
                results[name] = add_tensormaps(results[name], contribution)
        if self.zbl is not None:
            zbl_contrib = self.zbl.forward(batch, list(results), selected_atoms)
            for name, contribution in zbl_contrib.items():
                if name in results:
                    results[name] = add_tensormaps(results[name], contribution)
        return results

    def _assemble_target(
        self,
        name: str,
        per_block: Dict[str, jnp.ndarray],
        batch: SystemBatch,
        amask: Optional[jnp.ndarray] = None,
    ) -> TensorMap:
        info = self.target_infos[name]
        per_atom = info.per_atom
        A = batch.n_atoms_padded
        S = batch.n_systems_padded
        if amask is None:
            amask = batch.atom_mask

        key_names = list(info.layout.keys.names)
        type_col = (
            key_names.index("atom_type") if "atom_type" in key_names else None
        )
        blocks = []
        for key_tuple, layout_block in info.layout.items():
            flat = per_block[block_key_str(key_tuple)]
            flat = flat.astype(jnp.promote_types(jnp.float32, flat.dtype))
            comp_sizes = tuple(len(c) for c in layout_block.components)
            n_props = len(layout_block.properties)

            if name == "non_conservative_stress":
                flat = process_stress_like(flat, batch, n_props).reshape(A, -1)

            block_amask = amask
            if type_col is not None:
                # atomic-basis block: restricted to atoms of its type
                # (reference target_info.py:628-641 keys the blocks by
                # ``atom_type``; padded/other-type rows are masked zero)
                z = int(key_tuple[type_col])
                block_amask = block_amask & (batch.types == z)

            if per_atom:
                values = flat.reshape((A,) + comp_sizes + (n_props,))
                values = jnp.where(
                    block_amask.reshape((A,) + (1,) * (values.ndim - 1)),
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
                mask = block_amask
            else:
                summed = sum_over_atoms(
                    flat, batch.system_index, S, block_amask
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

    # -- last-layer features (for LLPR / transfer learning) ---------------------

    def last_layer_features(
        self, params: Any, batch: SystemBatch, target_name: str
    ) -> jnp.ndarray:
        """Per-atom last-layer features (A, F) for one target
        (reference ``mtt::aux::{target}_last_layer_features``)."""
        batch_data = self.preprocess(batch)
        raw = self.module.apply(params, batch_data, (target_name,))
        features = raw[f"_ll_features::{target_name}"]
        if isinstance(features, tuple):  # PET: (node_list, edge_list)
            return _concat_node_edge_features(
                *features, batch_data["cutoff_factors"]
            )
        return features

    @property
    def last_layer_feature_size(self) -> int:
        """Width of the concatenated last-layer feature vector."""
        dummy = self._dummy_batch()
        name = next(iter(self.output_shapes))
        return int(
            self.last_layer_features(self.params, dummy, name).shape[-1]
        )

    # -- metadata ------------------------------------------------------------------

    def supported_outputs(self) -> Dict[str, TargetInfo]:
        return dict(self.target_infos)

    # -- checkpointing ----------------------------------------------------------------

    def get_checkpoint(self) -> Dict[str, Any]:
        checkpoint = {
            "architecture_name": self.ARCHITECTURE_NAME,
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": copy.deepcopy(dict(self.hypers)),
            "dataset_info": self.dataset_info.to_dict(),
            "params": self.params,
            "composition": self.composition.get_checkpoint(),
            "scaler": self.scaler.get_checkpoint(),
        }
        # conditional keys: only foundation-model imports carry fixed
        # baselines (keeps the frozen corpus structure stable)
        if self._fixed_composition_weights:
            checkpoint["fixed_composition_weights"] = copy.deepcopy(
                self._fixed_composition_weights
            )
        if self._fixed_scaling_weights:
            checkpoint["fixed_scaling_weights"] = copy.deepcopy(
                self._fixed_scaling_weights
            )
        return checkpoint

    @classmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], context: str = "restart"
    ):
        model = cls(
            checkpoint["hypers"],
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
        )
        model.params = jax.tree_util.tree_map(jnp.asarray, checkpoint["params"])
        model.composition = CompositionModel.load_checkpoint(
            checkpoint["composition"]
        )
        model.scaler = Scaler.load_checkpoint(checkpoint["scaler"])
        model._fixed_composition_weights = copy.deepcopy(
            checkpoint.get("fixed_composition_weights", {})
        )
        model._fixed_scaling_weights = copy.deepcopy(
            checkpoint.get("fixed_scaling_weights", {})
        )
        return model

    def restart(self, dataset_info: DatasetInfo):
        if dataset_info == self.dataset_info:
            return self
        merged = self.dataset_info.union(dataset_info)
        if set(merged.atomic_types) != set(self.atomic_types):
            raise ValueError(
                f"{type(self).__name__} cannot be restarted with new atomic "
                f"types; missing "
                f"{set(merged.atomic_types) - set(self.atomic_types)}"
            )
        new = type(self)(self.hypers, merged, self.compute_dtype)
        if set(merged.targets) - set(self.dataset_info.targets):
            # new targets bring new head parameters: initialize the merged
            # model fresh and overlay the trained leaves (reference
            # finetune context: new-target heads freshly initialized,
            # pet/model.py:207-265). The init key follows the run's
            # global seeding (train CLI seeds numpy), so different seeds
            # decorrelate the fresh heads while a fixed seed stays
            # deterministic.
            seed = int(np.random.randint(0, 2**31 - 1))
            fresh = new.init_params(jax.random.PRNGKey(seed))
            new.params = _overlay_params(fresh, self.params)
        else:
            new.params = self.params
        new.composition = self.composition.restart(merged)
        new.scaler = self.scaler.restart(merged)
        return new


def _overlay_params(fresh, trained):
    """Overlay trained parameter leaves onto a freshly initialized tree:
    matching paths (same shape) take the trained value; paths only in
    ``fresh`` (new-target heads) keep their fresh initialization; paths
    only in ``trained`` (stale targets) are dropped. Structural
    mismatches (dict vs leaf, different shapes) keep the fresh value."""
    if not isinstance(fresh, dict) or not isinstance(trained, dict):
        if isinstance(fresh, dict) != isinstance(trained, dict):
            return fresh
        fresh_shape = getattr(fresh, "shape", None)
        return (
            trained
            if fresh_shape is not None
            and fresh_shape == getattr(trained, "shape", None)
            else fresh
        )
    out = {}
    for key, fresh_value in fresh.items():
        if key in trained:
            out[key] = _overlay_params(fresh_value, trained[key])
        else:
            out[key] = fresh_value
    return out


def _concat_node_edge_features(node_list, edge_list, cutoff_factors):
    """PET-style feature concatenation: per-layer node features plus the
    cutoff-weighted sum of edge features (reference pet/model.py
    'feature' output). Single source of truth for the 'features' output,
    last-layer features (LLPR covariances) and the aux outputs."""
    parts = []
    for node_f, edge_f in zip(node_list, edge_list):
        parts.append(node_f)
        parts.append(jnp.sum(edge_f * cutoff_factors[:, :, None], axis=1))
    return jnp.concatenate(parts, axis=-1)


def _flatten_features(raw: Dict[str, Any], batch_data: Dict[str, Any]):
    """Per-atom internal features from module results: SOAP-BPNN exposes
    ``_features`` (A, F); PET exposes node/edge feature lists that are
    concatenated with cutoff-weighted edge sums (reference
    ``pet/model.py`` 'feature' output)."""
    if "_features" in raw:
        return raw["_features"]
    return _concat_node_edge_features(
        raw["_node_features"], raw["_edge_features"],
        batch_data["cutoff_factors"],
    )


def process_stress_like(
    flat: jnp.ndarray, batch: SystemBatch, n_props: int
) -> jnp.ndarray:
    """Symmetrize rank-2 outputs and divide by cell volume
    (reference ``pet/modules/backend.py:780-813``)."""
    A = flat.shape[0]
    t = flat.reshape(A, 3, 3, n_props)
    volumes = jnp.abs(jnp.linalg.det(batch.cells))
    volumes = jnp.where(volumes == 0.0, jnp.inf, volumes)
    v_atom = volumes[batch.system_index][:, None, None, None]
    t = t / v_atom
    return 0.5 * (t + jnp.swapaxes(t, 1, 2))


def add_tensormaps(a: TensorMap, b: TensorMap) -> TensorMap:
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
