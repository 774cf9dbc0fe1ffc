"""Scaler: per-target RMS normalization of training targets.

Re-design of the reference ``src/metatrain/scaler/``: computes one scale
per target (uncentered std over all values) plus per-property scales,
fitted host-side after composition removal; targets are divided by the
scale in the collate pipeline and predictions are multiplied back at
evaluation time (``scaler/model.py:188-232``). Gradient blocks are scaled
with the same factor (d(s*E) = s*dE).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..containers import TensorBlock, TensorMap
from ..data.dataset import Dataset, Sample
from ..data.target_info import DatasetInfo
from ..utils.abc import ModelInterface


FixedScales = Dict[str, Union[float, Dict[str, float]]]


class Scaler(ModelInterface):
    """Per-target (and per-property) RMS scales."""

    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(self, hypers: Dict[str, Any], dataset_info: DatasetInfo):
        super().__init__(hypers, dataset_info)
        # target -> (P,) per-property scales (scale 1.0 = no-op)
        self.scales: Dict[str, np.ndarray] = {}
        for name, info in dataset_info.targets.items():
            n_props = len(info.layout.block(0).properties)
            self.scales[name] = np.ones((n_props,), dtype=np.float64)

    def fit(
        self,
        datasets: Sequence[Dataset],
        fixed_scales: Optional[FixedScales] = None,
    ) -> None:
        fixed_scales = fixed_scales or {}
        for name in self.scales:
            if name in fixed_scales:
                spec = fixed_scales[name]
                value = float(spec) if not isinstance(spec, dict) else float(
                    next(iter(spec.values()))
                )
                self.scales[name] = np.full_like(self.scales[name], value)
                continue
            sq_sum = np.zeros_like(self.scales[name])
            count = 0
            for dataset in datasets:
                if name not in dataset.targets:
                    continue
                for tmap in dataset.targets[name]:
                    for block in tmap.blocks():
                        values = np.asarray(block.values, dtype=np.float64)
                        flat = values.reshape(-1, values.shape[-1])
                        finite = np.isfinite(flat)
                        sq_sum += np.where(finite, flat**2, 0.0).sum(0)
                        count += int(finite[:, 0].sum()) * int(
                            np.prod(values.shape[1:-1], initial=1)
                        )
            if count > 0:
                rms = np.sqrt(sq_sum / max(count, 1))
                self.scales[name] = np.where(rms > 0, rms, 1.0)

    # -- application ---------------------------------------------------------

    def scale_value(self, name: str) -> np.ndarray:
        return self.scales.get(name, np.ones(1))

    def remove_transform(self, samples: List[Sample]) -> List[Sample]:
        """Collate transform: divide host targets (and gradients) by scale."""
        new_samples = []
        for sample in samples:
            new_targets = {}
            for name, tmap in sample.targets.items():
                if name not in self.scales:
                    new_targets[name] = tmap
                    continue
                inv = 1.0 / self.scales[name]
                new_targets[name] = _scale_tensormap_host(tmap, inv)
            new_samples.append(
                Sample(sample.system, new_targets, sample.extra_data)
            )
        return new_samples

    def apply_scales(
        self, predictions: Dict[str, TensorMap]
    ) -> Dict[str, TensorMap]:
        """Multiply device predictions back by the scales (evaluation)."""
        out = {}
        for name, tmap in predictions.items():
            if name in self.scales:
                scale = jnp.asarray(self.scales[name])
                out[name] = tmap.map_values(
                    lambda v, s=scale: v * s.astype(v.dtype)
                )
            else:
                out[name] = tmap
        return out

    # -- ModelInterface -------------------------------------------------------

    def init_params(self, rng) -> Dict[str, jnp.ndarray]:
        self.params = {
            name: jnp.asarray(s) for name, s in self.scales.items()
        }
        return self.params

    def forward(self, params, batch, outputs):
        raise NotImplementedError("Scaler is applied via apply_scales")

    def supported_outputs(self) -> Dict[str, Any]:
        return {}

    def get_checkpoint(self) -> Dict[str, Any]:
        return {
            "architecture_name": "scaler",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": self.hypers,
            "dataset_info": self.dataset_info.to_dict(),
            "scales": {k: v.copy() for k, v in self.scales.items()},
        }

    @classmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], context: str = "restart"
    ) -> "Scaler":
        model = cls(
            checkpoint.get("hypers", {}),
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
        )
        for name, s in checkpoint["scales"].items():
            model.scales[name] = np.asarray(s, dtype=np.float64)
        return model

    def restart(self, dataset_info: DatasetInfo) -> "Scaler":
        merged = self.dataset_info.union(dataset_info)
        new = Scaler(self.hypers, merged)
        for name, s in self.scales.items():
            if name in new.scales:
                new.scales[name] = s.copy()
        return new


def _scale_tensormap_host(tmap: TensorMap, factor: np.ndarray) -> TensorMap:
    blocks = []
    for block in tmap.blocks():
        new_block = TensorBlock(
            values=np.asarray(block.values) * factor,
            samples=block.samples,
            components=block.components,
            properties=block.properties,
            mask=block.mask,
        )
        for gname, grad in block.gradients():
            new_block.add_gradient(
                gname,
                TensorBlock(
                    values=np.asarray(grad.values) * factor,
                    samples=grad.samples,
                    components=grad.components,
                    properties=grad.properties,
                    mask=grad.mask,
                ),
            )
        blocks.append(new_block)
    return TensorMap(tmap.keys, blocks)


def train_or_load_scaler(
    path_or_none: Optional[str],
    dataset_info: DatasetInfo,
    datasets: Sequence[Dataset],
    fixed_scales: Optional[FixedScales] = None,
    enabled: bool = True,
) -> Scaler:
    if path_or_none:
        from ..utils.io import load_checkpoint_file

        return Scaler.load_checkpoint(load_checkpoint_file(path_or_none))
    scaler = Scaler({}, dataset_info)
    if enabled:
        scaler.fit(datasets, fixed_scales=fixed_scales)
    scaler.init_params(None)
    return scaler
