"""Composition model: per-species least-squares baselines.

Re-design of the reference ``src/metatrain/composition/`` (+
``utils/additive/remove.py``): fits ``target = sum_i w[species_i]`` by
accumulating the normal equations ``X^T X`` / ``X^T Y`` over the dataset
and solving on the host in float64 (TPU f64 is emulated and slow; the fit
is tiny). Used standalone as an architecture and embedded as the additive
baseline in every NN architecture; during training its contribution is
*removed* from the targets on the host (collate transform), and re-added
on device at evaluation time.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.dataset import Dataset, Sample
from ..data.target_info import DatasetInfo, TargetInfo
from ..ops.segment import sum_over_atoms
from ..utils.abc import ModelInterface


logger = logging.getLogger(__name__)

FixedWeights = Dict[str, Union[float, Dict[int, float]]]


def _is_valid_target(info: TargetInfo) -> bool:
    """Composition applies to invariant scalars (reference
    ``composition/_base_composition.py:18-33``): scalar targets, or
    spherical targets whose only block is the (0, 1) irrep."""
    if info.is_atomic_basis:
        return False
    if info.is_scalar:
        return True
    if info.is_spherical:
        keys = np.asarray(info.layout.keys.values)
        return len(keys) == 1 and keys[0][0] == 0 and keys[0][1] == 1
    return False


class CompositionModel(ModelInterface):
    """Per-species linear baseline ``E = sum_i w[z_i]``."""

    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(self, hypers: Dict[str, Any], dataset_info: DatasetInfo):
        super().__init__(hypers, dataset_info)
        self.atomic_types = list(dataset_info.atomic_types)
        self.target_infos = {
            name: info
            for name, info in dataset_info.targets.items()
            if _is_valid_target(info)
        }
        self.weights: Dict[str, np.ndarray] = {}
        for name, info in self.target_infos.items():
            n_props = len(info.layout.block(0).properties)
            self.weights[name] = np.zeros(
                (len(self.atomic_types), n_props), dtype=np.float64
            )
        self._type_to_index = {z: i for i, z in enumerate(self.atomic_types)}

    # -- fitting -----------------------------------------------------------

    def fit(
        self,
        datasets: Sequence[Dataset],
        fixed_weights: Optional[FixedWeights] = None,
    ) -> None:
        """Least-squares fit of per-species weights on the host.

        :param fixed_weights: per-target user overrides: a scalar for all
            species or a ``{atomic_number: value}`` dict
            (reference ``pet/documentation.py`` atomic_baseline).
        """
        fixed_weights = fixed_weights or {}
        n_types = len(self.atomic_types)

        for name, info in self.target_infos.items():
            if name in fixed_weights:
                spec = fixed_weights[name]
                n_props = self.weights[name].shape[1]
                if isinstance(spec, dict):
                    w = np.zeros((n_types, n_props))
                    for z, value in spec.items():
                        w[self._type_to_index[int(z)]] = float(value)
                else:
                    w = np.full((n_types, n_props), float(spec))
                self.weights[name] = w
                continue

            xtx = np.zeros((n_types, n_types), dtype=np.float64)
            xty: Optional[np.ndarray] = None
            from ..data.dataset import dataset_target_names, iter_samples

            for dataset in datasets:
                if name not in dataset_target_names(dataset):
                    continue
                for sample in iter_samples(dataset):
                    system, tmap = sample.system, sample.targets[name]
                    block = tmap.block(0)
                    values = np.asarray(block.values, dtype=np.float64)
                    counts = np.zeros(n_types)
                    for z in system.types:
                        idx = self._type_to_index.get(int(z))
                        if idx is not None:
                            counts[idx] += 1.0
                    if xty is None:
                        xty = np.zeros((n_types, values.shape[-1]))
                    if info.per_atom:
                        # each atom is one sample with a one-hot row
                        flat = values.reshape(len(system), -1)
                        for a, z in enumerate(system.types):
                            idx = self._type_to_index[int(z)]
                            xtx[idx, idx] += 1.0
                            xty[idx] += flat[a]
                    else:
                        xtx += np.outer(counts, counts)
                        xty += counts[:, None] * values.reshape(1, -1)

            if xty is None:
                continue
            # tiny Tikhonov term guards rank-deficient systems (e.g. a
            # species never appearing alone); exact when well-conditioned
            reg = 1e-10 * max(np.trace(xtx) / max(n_types, 1), 1.0)
            solution = np.linalg.solve(xtx + reg * np.eye(n_types), xty)
            self.weights[name] = solution

    # -- ModelInterface ------------------------------------------------------

    def init_params(self, rng) -> Dict[str, jnp.ndarray]:
        self.params = self._device_params()
        return self.params

    def _device_params(self, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        return {
            "weights": {
                name: jnp.asarray(w, dtype=dtype) for name, w in self.weights.items()
            },
            "type_to_index": jnp.asarray(self._type_lookup(), dtype=jnp.int32),
        }

    def _type_lookup(self) -> np.ndarray:
        size = max(self.atomic_types) + 1 if self.atomic_types else 1
        lookup = np.zeros((size,), dtype=np.int32)
        for z, i in self._type_to_index.items():
            lookup[z] = i
        return lookup

    def forward(
        self,
        params: Dict[str, Any],
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms=None,
    ) -> Dict[str, TensorMap]:
        """Device-side additive contribution (used at evaluation).
        ``selected_atoms``: optional (A,) mask restricting contributions
        (see ``nn_base.AtomisticNNModel.forward``)."""
        results: Dict[str, TensorMap] = {}
        amask = batch.atom_mask
        if selected_atoms is not None:
            amask = amask & selected_atoms
        type_index = params["type_to_index"][batch.types]
        for name in outputs:
            if name not in self.target_infos:
                continue
            info = self.target_infos[name]
            w = params["weights"][name]  # (n_types, P)
            per_atom_values = w[type_index]  # (A, P)
            per_atom_values = jnp.where(
                amask[:, None], per_atom_values, 0.0
            )
            layout_block = info.layout.block(0)
            if info.per_atom:
                block = TensorBlock(
                    values=per_atom_values,
                    samples=Labels(
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
                    ),
                    components=layout_block.components,
                    properties=layout_block.properties,
                    mask=amask,
                )
            else:
                per_system = sum_over_atoms(
                    per_atom_values,
                    batch.system_index,
                    batch.n_systems_padded,
                    amask,
                )
                block = TensorBlock(
                    values=per_system,
                    samples=Labels.range("system", batch.n_systems_padded),
                    components=layout_block.components,
                    properties=layout_block.properties,
                    mask=batch.system_mask,
                )
            results[name] = TensorMap(info.layout.keys, [block])
        return results

    def supported_outputs(self) -> Dict[str, Any]:
        return {name: info for name, info in self.target_infos.items()}

    # -- host-side removal (collate transform) ---------------------------------

    def predict_host(self, system) -> Dict[str, np.ndarray]:
        """Per-target baseline values for one host system (float64)."""
        out = {}
        for name, info in self.target_infos.items():
            w = self.weights[name]
            idx = np.array(
                [self._type_to_index.get(int(z), -1) for z in system.types]
            )
            valid = idx >= 0
            per_atom = np.zeros((len(system), w.shape[1]))
            per_atom[valid] = w[idx[valid]]
            out[name] = per_atom if info.per_atom else per_atom.sum(0, keepdims=True)
        return out

    def remove_transform(self, samples: List[Sample]) -> List[Sample]:
        """Collate transform subtracting the baseline from host targets
        (reference ``utils/additive/remove.py``). Gradient blocks are
        untouched: the baseline has zero position/strain gradients."""
        new_samples = []
        for sample in samples:
            new_targets = dict(sample.targets)
            baselines = self.predict_host(sample.system)
            for name, baseline in baselines.items():
                if name not in new_targets:
                    continue
                tmap = new_targets[name]
                block = tmap.block(0)
                layout_shape = block.values.shape
                new_block = TensorBlock(
                    values=np.asarray(block.values)
                    - baseline.reshape(layout_shape),
                    samples=block.samples,
                    components=block.components,
                    properties=block.properties,
                    mask=block.mask,
                )
                for gname, grad in block.gradients():
                    new_block.add_gradient(gname, grad)
                new_targets[name] = TensorMap(tmap.keys, [new_block])
            new_samples.append(
                Sample(sample.system, new_targets, sample.extra_data)
            )
        return new_samples

    # -- checkpointing -----------------------------------------------------------

    def get_checkpoint(self) -> Dict[str, Any]:
        return {
            "architecture_name": "composition",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": self.hypers,
            "dataset_info": self.dataset_info.to_dict(),
            "weights": {k: v.copy() for k, v in self.weights.items()},
        }

    @classmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], context: str = "restart"
    ) -> "CompositionModel":
        model = cls(
            checkpoint.get("hypers", {}),
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
        )
        for name, w in checkpoint["weights"].items():
            model.weights[name] = np.asarray(w, dtype=np.float64)
        model.init_params(None)
        return model

    def restart(self, dataset_info: DatasetInfo) -> "CompositionModel":
        merged = self.dataset_info.union(dataset_info)
        new = CompositionModel(self.hypers, merged)
        for name, w in self.weights.items():
            if name in new.weights:
                for z, old_idx in self._type_to_index.items():
                    new.weights[name][new._type_to_index[z]] = w[old_idx]
        return new


def train_or_load_composition_model(
    path_or_none: Optional[str],
    dataset_info: DatasetInfo,
    datasets: Sequence[Dataset],
    fixed_weights: Optional[FixedWeights] = None,
) -> CompositionModel:
    """Fit a composition model, or load a pre-trained checkpoint
    (reference ``composition`` train_or_load)."""
    if path_or_none:
        from ..utils.io import load_checkpoint_file

        return CompositionModel.load_checkpoint(load_checkpoint_file(path_or_none))
    model = CompositionModel({}, dataset_info)
    model.fit(datasets, fixed_weights=fixed_weights)
    model.init_params(None)
    return model
