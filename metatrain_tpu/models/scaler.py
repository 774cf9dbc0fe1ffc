"""Scaler: RMS normalization of training targets.

Re-design of the reference ``src/metatrain/scaler/``: fits, host-side and
after composition removal,

- a **per-target** scale (uncentered RMS over every value of the target;
  one value per atomic type for per-atom targets,
  ``_base_scaler.py:287-372``), and
- **per-block, per-property** scales whose product with the per-target
  scale is the full RMS of that (block, property) slice
  (``scaler/model.py:188-232`` ``use_per_target_scales`` /
  ``use_per_property_scales`` decomposition). Per-property scales stay at
  1 for atom-pair (edge) targets, mirroring the reference.

Targets are divided by the full scale in the collate pipeline and
predictions are multiplied back at evaluation time. Gradient blocks are
scaled with the same factor (d(s*E) = s*dE).
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
    """Per-target / per-block / per-property / per-type RMS scales."""

    __checkpoint_version__ = 2
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(self, hypers: Dict[str, Any], dataset_info: DatasetInfo):
        super().__init__(hypers, dataset_info)
        self.atomic_types = list(dataset_info.atomic_types)
        self._type_to_index = {
            int(z): i for i, z in enumerate(self.atomic_types)
        }
        # target -> list over layout blocks of (R, P_b) full scales where
        # R = n_types for per-atom targets, else 1 (scale 1.0 = no-op)
        self.scales: Dict[str, List[np.ndarray]] = {}
        # target -> (R,) per-target scale (RMS over all blocks/properties)
        self.per_target: Dict[str, np.ndarray] = {}
        for name, info in dataset_info.targets.items():
            R = len(self.atomic_types) if info.per_atom else 1
            self.scales[name] = [
                np.ones((R, len(block.properties)), dtype=np.float64)
                for block in info.layout.blocks()
            ]
            self.per_target[name] = np.ones((R,), dtype=np.float64)

    # -- fitting ---------------------------------------------------------------

    def _rows(self, name: str) -> int:
        info = self.dataset_info.targets[name]
        return len(self.atomic_types) if info.per_atom else 1

    def _row_index(self, system, n_rows: int) -> np.ndarray:
        """Scale-row index for each sample row of a host target block."""
        if n_rows == 1:
            return np.zeros(0, dtype=np.int64)  # unused for R == 1
        return np.array(
            [self._type_to_index.get(int(z), 0) for z in system.types],
            dtype=np.int64,
        )

    def fit(
        self,
        datasets: Sequence[Dataset],
        fixed_scales: Optional[FixedScales] = None,
    ) -> None:
        fixed_scales = fixed_scales or {}
        for name in self.scales:
            info = self.dataset_info.targets[name]
            R = self._rows(name)
            if name in fixed_scales:
                spec = fixed_scales[name]
                value = float(spec) if not isinstance(spec, dict) else float(
                    next(iter(spec.values()))
                )
                self.scales[name] = [
                    np.full_like(s, value) for s in self.scales[name]
                ]
                self.per_target[name] = np.full((R,), value)
                continue

            sq = [np.zeros_like(s) for s in self.scales[name]]
            cnt = [np.zeros_like(s) for s in self.scales[name]]
            from ..data.dataset import dataset_target_names, iter_samples

            for dataset in datasets:
                if name not in dataset_target_names(dataset):
                    continue
                for sample in iter_samples(dataset):
                    system, tmap = sample.system, sample.targets[name]
                    for b, block in enumerate(tmap.blocks()):
                        values = np.asarray(block.values, dtype=np.float64)
                        if values.shape[0] == 0:
                            # atomic-basis blocks: a system can lack a
                            # block's atom type entirely
                            continue
                        P = values.shape[-1]
                        flat = values.reshape(values.shape[0], -1, P)
                        finite = np.isfinite(flat)
                        v2 = np.where(finite, flat**2, 0.0).sum(axis=1)
                        n = finite.sum(axis=1).astype(np.float64)
                        if R == 1:
                            sq[b][0] += v2.sum(0)
                            cnt[b][0] += n.sum(0)
                        else:
                            rows = self._row_index(system, R)
                            rows = rows[: values.shape[0]]
                            np.add.at(sq[b], rows, v2[: len(rows)])
                            np.add.at(cnt[b], rows, n[: len(rows)])

            full = [
                np.where(c > 0, np.sqrt(s / np.maximum(c, 1)), 1.0)
                for s, c in zip(sq, cnt)
            ]
            full = [np.where(f > 0, f, 1.0) for f in full]
            sq_all = sum(s.sum(axis=1) for s in sq)
            cnt_all = sum(c.sum(axis=1) for c in cnt)
            target_scale = np.where(
                cnt_all > 0, np.sqrt(sq_all / np.maximum(cnt_all, 1)), 1.0
            )
            target_scale = np.where(target_scale > 0, target_scale, 1.0)
            self.scales[name] = full
            self.per_target[name] = target_scale

    # -- decomposition ---------------------------------------------------------

    def _is_multi_property(self, name: str) -> bool:
        info = self.dataset_info.targets[name]
        if info.sample_kind == "atom_pair":
            # reference: no per-property scales for edge targets
            return False
        blocks = list(info.layout.blocks())
        return len(blocks) > 1 or any(
            len(b.properties) > 1 for b in blocks
        )

    def _block_factor(
        self,
        name: str,
        b: int,
        use_per_target: bool,
        use_per_property: bool,
    ) -> np.ndarray:
        """(R, P_b) multiplicative factor for the chosen decomposition
        (full = per_target x per_property)."""
        full = self.scales[name][b]
        target = self.per_target[name][:, None]
        if use_per_target and use_per_property:
            return full
        if use_per_target:
            return np.broadcast_to(target, full.shape)
        if use_per_property:
            if not self._is_multi_property(name):
                return np.ones_like(full)
            return full / np.where(target > 0, target, 1.0)
        return np.ones_like(full)

    def scale_value(self, name: str) -> np.ndarray:
        """Flat full scale of the first block (diagnostics/tests)."""
        return self.scales.get(name, [np.ones((1, 1))])[0][0]

    # -- host removal (collate transform) --------------------------------------

    def remove_transform(self, samples: List[Sample]) -> List[Sample]:
        """Collate transform: divide host targets (and gradients) by the
        full scale."""
        new_samples = []
        for sample in samples:
            new_targets = {}
            for name, tmap in sample.targets.items():
                if name not in self.scales:
                    new_targets[name] = tmap
                    continue
                R = self._rows(name)
                rows = self._row_index(sample.system, R)
                new_targets[name] = _scale_tensormap_host(
                    tmap, self.scales[name], rows, invert=True
                )
            new_samples.append(
                Sample(sample.system, new_targets, sample.extra_data)
            )
        return new_samples

    # -- device application (evaluation) ---------------------------------------

    def apply_scales(
        self,
        predictions: Dict[str, TensorMap],
        batch=None,
        remove: bool = False,
        use_per_target_scales: bool = True,
        use_per_property_scales: bool = True,
    ) -> Dict[str, TensorMap]:
        """Multiply (or with ``remove=True`` divide) device predictions by
        the scales (reference ``scaler/model.py:188-232``).

        :param batch: the SystemBatch the predictions came from; required
            to resolve per-type rows of per-atom targets (ignored
            otherwise).
        """
        out = {}
        for name, tmap in predictions.items():
            if name not in self.scales:
                out[name] = tmap
                continue
            R = self._rows(name)
            blocks = []
            for b, block in enumerate(tmap.blocks()):
                factor = self._block_factor(
                    name,
                    b,
                    use_per_target_scales,
                    use_per_property_scales,
                )
                if remove:
                    factor = 1.0 / factor
                if R == 1:
                    row = jnp.asarray(factor[0])  # (P,)
                    scale = row.reshape(
                        (1,) * (block.values.ndim - 1) + (-1,)
                    )
                else:
                    if batch is None:
                        raise ValueError(
                            "apply_scales needs the batch for per-atom "
                            f"target '{name}' (per-type scales)"
                        )
                    lookup = np.zeros(
                        (max(self.atomic_types) + 1, factor.shape[1])
                    )
                    for z, i in self._type_to_index.items():
                        lookup[z] = factor[i]
                    per_row = jnp.asarray(lookup)[
                        jnp.clip(batch.types, 0, lookup.shape[0] - 1)
                    ]  # (A, P)
                    scale = per_row.reshape(
                        (per_row.shape[0],)
                        + (1,) * (block.values.ndim - 2)
                        + (per_row.shape[-1],)
                    )
                new_block = TensorBlock(
                    values=block.values * scale.astype(block.values.dtype),
                    samples=block.samples,
                    components=block.components,
                    properties=block.properties,
                    mask=block.mask,
                )
                for gname, grad in block.gradients():
                    gscale = scale.reshape(
                        (scale.shape[0],)
                        + (1,) * (grad.values.ndim - scale.ndim)
                        + scale.shape[1:]
                    ) if R != 1 else scale.reshape(
                        (1,) * (grad.values.ndim - 1) + (-1,)
                    )
                    new_block.add_gradient(
                        gname,
                        TensorBlock(
                            values=grad.values
                            * gscale.astype(grad.values.dtype),
                            samples=grad.samples,
                            components=grad.components,
                            properties=grad.properties,
                            mask=grad.mask,
                        ),
                    )
                blocks.append(new_block)
            out[name] = TensorMap(tmap.keys, blocks)
        return out

    # -- ModelInterface -------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        self.params = {
            name: [jnp.asarray(s) for s in scales]
            for name, scales in self.scales.items()
        }
        return self.params

    def forward(self, params, batch, outputs, selected_atoms=None):
        """Return the fitted scales for the requested outputs, broadcast
        over the batch samples (reference ``scaler/model.py:150-170``:
        the standalone Scaler architecture's forward provides the
        scales; in NN architectures the scaler acts via
        :meth:`apply_scales` instead). ``selected_atoms``: optional (A,)
        mask restricting per-atom rows (wrapper calling convention)."""
        from ..containers import Labels

        results: Dict[str, TensorMap] = {}
        for name in outputs:
            if name not in self.scales:
                continue
            info = self.dataset_info.targets[name]
            R = self._rows(name)
            blocks = []
            for b, layout_block in enumerate(info.layout.blocks()):
                factor = self._block_factor(name, b, True, True)  # (R, P)
                comp_shape = tuple(
                    len(c) for c in layout_block.components
                )
                if info.per_atom:
                    A = batch.n_atoms_padded
                    lookup = np.ones(
                        (max(self.atomic_types) + 1, factor.shape[1])
                    )
                    for z, i in self._type_to_index.items():
                        lookup[z] = factor[i]
                    per_row = jnp.asarray(lookup)[
                        jnp.clip(batch.types, 0, lookup.shape[0] - 1)
                    ]  # (A, P)
                    values = jnp.broadcast_to(
                        per_row.reshape(
                            (A,) + (1,) * len(comp_shape) + (-1,)
                        ),
                        (A,) + comp_shape + (factor.shape[1],),
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
                    if selected_atoms is not None:
                        mask = mask & selected_atoms
                else:
                    S = batch.n_systems_padded
                    values = jnp.broadcast_to(
                        jnp.asarray(factor[0]).reshape(
                            (1,) * (1 + len(comp_shape)) + (-1,)
                        ),
                        (S,) + comp_shape + (factor.shape[1],),
                    )
                    samples = Labels.range("system", S)
                    mask = batch.system_mask
                # zero padded rows: container convention (masked rows
                # hold no data; suites assert it)
                values = jnp.where(
                    mask.reshape(mask.shape + (1,) * (values.ndim - 1)),
                    values,
                    0.0,
                )
                blocks.append(
                    TensorBlock(
                        values=values,
                        samples=samples,
                        components=layout_block.components,
                        properties=layout_block.properties,
                        mask=mask,
                    )
                )
            results[name] = TensorMap(info.layout.keys, blocks)
        return results

    def supported_outputs(self) -> Dict[str, Any]:
        return dict(self.dataset_info.targets)

    def get_checkpoint(self) -> Dict[str, Any]:
        return {
            "architecture_name": "scaler",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": self.hypers,
            "dataset_info": self.dataset_info.to_dict(),
            "scales": {
                k: [s.copy() for s in v] for k, v in self.scales.items()
            },
            "per_target": {k: v.copy() for k, v in self.per_target.items()},
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
            if name not in model.scales:
                continue
            if isinstance(s, np.ndarray) and s.ndim == 1:
                # v1 checkpoints: one (P,) full scale shared by all blocks
                model.scales[name] = [
                    np.broadcast_to(s, tpl.shape).copy()
                    for tpl in model.scales[name]
                ]
                model.per_target[name] = np.full(
                    model.per_target[name].shape,
                    float(np.sqrt(np.mean(np.square(s)))) or 1.0,
                )
            else:
                model.scales[name] = [np.asarray(x, np.float64) for x in s]
        for name, v in checkpoint.get("per_target", {}).items():
            if name in model.per_target:
                model.per_target[name] = np.asarray(v, np.float64)
        return model

    def restart(self, dataset_info: DatasetInfo) -> "Scaler":
        merged = self.dataset_info.union(dataset_info)
        new = Scaler(self.hypers, merged)
        for name, s in self.scales.items():
            if name in new.scales and all(
                a.shape == b.shape for a, b in zip(s, new.scales[name])
            ):
                new.scales[name] = [x.copy() for x in s]
                new.per_target[name] = self.per_target[name].copy()
        return new


def _scale_tensormap_host(
    tmap: TensorMap,
    block_scales: List[np.ndarray],
    rows: np.ndarray,
    invert: bool,
) -> TensorMap:
    """Host-side scaling of one target TensorMap by (R, P_b) block scales.

    ``rows`` maps per-atom sample rows to scale rows (empty for R == 1).
    """
    blocks = []
    for b, block in enumerate(tmap.blocks()):
        factor = block_scales[min(b, len(block_scales) - 1)]
        if invert:
            factor = 1.0 / factor
        values = np.asarray(block.values)
        if factor.shape[0] == 1:
            row_factor = factor[0]  # (P,)
            scale = row_factor.reshape((1,) * (values.ndim - 1) + (-1,))
        else:
            n = values.shape[0]
            per_row = factor[rows[:n]]  # (n, P)
            scale = per_row.reshape(
                (n,) + (1,) * (values.ndim - 2) + (per_row.shape[-1],)
            )
        new_block = TensorBlock(
            values=values * scale,
            samples=block.samples,
            components=block.components,
            properties=block.properties,
            mask=block.mask,
        )
        for gname, grad in block.gradients():
            gvalues = np.asarray(grad.values)
            if factor.shape[0] == 1:
                gscale = factor[0].reshape((1,) * (gvalues.ndim - 1) + (-1,))
            else:
                # per-atom target gradients: gradient samples index the
                # target's sample rows in their first column
                gsample_rows = np.asarray(grad.samples.values)[:, 0]
                per_row = (1.0 / block_scales[
                    min(b, len(block_scales) - 1)
                ] if invert else block_scales[
                    min(b, len(block_scales) - 1)
                ])[rows[gsample_rows]]
                gscale = per_row.reshape(
                    (len(gsample_rows),)
                    + (1,) * (gvalues.ndim - 2)
                    + (per_row.shape[-1],)
                )
            new_block.add_gradient(
                gname,
                TensorBlock(
                    values=gvalues * gscale,
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
