"""Loss system: pointwise masked TensorMap losses and the aggregator.

Re-design of the reference ``utils/loss.py`` (1267 LoC). Pointwise losses
are flattened over all blocks of a TensorMap with NaN-target masking
(reference ``loss.py:144-217``), and additionally honor the padding masks
our fixed-shape batches carry. Every loss returns ``(sum, count)`` pairs
internally so that data-parallel reduction (``psum`` of sums and counts)
gives bit-identical results to a single-device run.

Config shape matches the reference (``loss.py:1039-1184``): per target a
``{"type", "weight", "reduction", "gradients": {name: {...}}}`` dict, with
string shorthands expanded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..containers import TensorBlock, TensorMap
from ..data.target_info import TargetInfo


def _pointwise(kind: str, diff, **kw):
    if kind == "mse":
        return diff * diff
    if kind == "mae":
        return jnp.abs(diff)
    if kind == "huber":
        delta = float(kw.get("delta", 1.0))
        abs_diff = jnp.abs(diff)
        return jnp.where(
            abs_diff <= delta,
            0.5 * diff * diff,
            delta * (abs_diff - 0.5 * delta),
        )
    raise ValueError(f"unknown loss type {kind!r}")


# custom loss kinds (reference dev-docs/new-loss.rst extension point):
# name -> fn(prediction_values, target_values, valid_mask, **kwargs)
# returning (loss_sum, count); registered kinds are usable anywhere a
# builtin kind is (per-target and per-gradient specs)
_CUSTOM_LOSSES: Dict[str, Any] = {}


def register_loss(kind: str, fn) -> None:
    """Register a custom loss kind for use in loss configs.

    :param fn: ``(pred_values, target_values, valid_mask, **kwargs) ->
        (sum, count)``; ``valid_mask`` combines padding, NaN and extra
        masks; return raw sums so distributed reduction stays exact.
    """
    _CUSTOM_LOSSES[kind] = fn


def block_loss_terms(
    kind: str,
    prediction: TensorBlock,
    target: TensorBlock,
    extra_mask: Optional[TensorBlock] = None,
    **kw,
):
    """``(sum, count)`` of the pointwise loss over one block.

    Elements are dropped when (a) the block's padding mask is False on
    their sample row, (b) the target value is NaN (reference NaN-masking,
    ``loss.py:144-217``), or (c) an explicit extra mask (from
    ``extra_data["{target}_mask"]``) is False.
    """
    pred = prediction.values
    tgt = target.values
    valid = jnp.logical_not(jnp.isnan(tgt))
    if target.mask is not None:
        sample_mask = target.mask.reshape(
            target.mask.shape + (1,) * (tgt.ndim - 1)
        )
        valid = jnp.logical_and(valid, sample_mask)
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask.values.astype(bool))

    if kind in _CUSTOM_LOSSES:
        return _CUSTOM_LOSSES[kind](pred, tgt, valid, **kw)

    if kind == "shift_agnostic_mse":
        # remove the per-sample mean difference before the MSE: for targets
        # defined up to a constant shift, e.g. DOS (reference loss.py:447)
        diff = jnp.where(valid, pred - jnp.nan_to_num(tgt), 0.0)
        counts = jnp.maximum(
            valid.reshape(valid.shape[0], -1).sum(axis=1), 1
        ).astype(diff.dtype)
        mean_shift = diff.reshape(diff.shape[0], -1).sum(axis=1) / counts
        shifted = diff - mean_shift.reshape((-1,) + (1,) * (diff.ndim - 1))
        shifted = jnp.where(valid, shifted, 0.0)
        return jnp.sum(shifted * shifted), jnp.sum(valid.astype(diff.dtype))

    if kind == "gaussian_nll":
        # ensemble Gaussian negative log-likelihood: predictions carry an
        # ensemble over the property axis (reference loss.py:776-1037)
        mean = jnp.mean(pred, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.var(pred, axis=-1, keepdims=True), 1e-10)
        sample_valid = valid.reshape(valid.shape[0], -1).any(axis=1)
        nll = 0.5 * (
            jnp.log(2.0 * jnp.pi * var)
            + (jnp.nan_to_num(tgt)[..., :1] - mean) ** 2 / var
        )
        nll = jnp.where(valid[..., :1], nll, 0.0)
        return jnp.sum(nll), jnp.sum(sample_valid.astype(nll.dtype))

    if kind == "crps":
        # empirical CRPS of an ensemble against a scalar target:
        # CRPS = E|X - y| - 0.5 E|X - X'|
        y = jnp.nan_to_num(tgt)[..., :1]
        n_members = pred.shape[-1]
        term1 = jnp.mean(jnp.abs(pred - y), axis=-1, keepdims=True)
        pairwise = jnp.abs(pred[..., :, None] - pred[..., None, :])
        term2 = 0.5 * jnp.sum(pairwise, axis=(-2, -1), keepdims=False) / (
            n_members * n_members
        )
        crps = term1[..., 0] - term2
        sample_valid = valid.reshape(valid.shape[0], -1).any(axis=1)
        crps = jnp.where(valid[..., 0], crps, 0.0)
        return jnp.sum(crps), jnp.sum(sample_valid.astype(crps.dtype))

    if kind == "cross_entropy":
        # softmax cross entropy over the property axis; targets are class
        # probabilities (soft or one-hot), reference classifier/model.py
        log_probs = jax.nn.log_softmax(pred, axis=-1)
        per_elem = jnp.where(valid, -jnp.nan_to_num(tgt) * log_probs, 0.0)
        sample_valid = valid.reshape(valid.shape[0], -1).any(axis=1)
        return jnp.sum(per_elem), jnp.sum(
            sample_valid.astype(per_elem.dtype)
        )

    diff = jnp.where(valid, pred - jnp.nan_to_num(tgt), 0.0)
    loss = _pointwise(kind, diff, **kw)
    return jnp.sum(loss), jnp.sum(valid.astype(loss.dtype))


@dataclasses.dataclass
class LossTerm:
    """One scheduled loss term: a target or one of its gradients."""

    target: str
    gradient: Optional[str]
    kind: str
    weight: float
    reduction: str = "mean"
    extra_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def compute(
        self,
        predictions: Dict[str, TensorMap],
        targets: Dict[str, TensorMap],
        extra_data: Optional[Dict[str, TensorMap]] = None,
    ):
        pred_map = predictions[self.target]
        tgt_map = targets[self.target]
        mask_map = (extra_data or {}).get(f"{self.target}_mask")

        total = jnp.zeros(())
        count = jnp.zeros(())
        for idx in range(len(tgt_map)):
            pred_block = pred_map.blocks()[idx]
            tgt_block = tgt_map.blocks()[idx]
            mask_block = (
                mask_map.blocks()[idx] if mask_map is not None else None
            )
            if self.gradient is not None:
                if not tgt_block.has_gradient(self.gradient):
                    continue
                pred_block = pred_block.gradient(self.gradient)
                tgt_block = tgt_block.gradient(self.gradient)
                # the mask for a gradient term is the mask's matching
                # gradient block, not its value block (shape (A, 3, P)
                # vs (S, P); cf. metrics.batch_errors)
                mask_block = (
                    mask_block.gradient(self.gradient)
                    if mask_block is not None
                    and mask_block.has_gradient(self.gradient)
                    else None
                )
            extra_mask = mask_block
            s, c = block_loss_terms(
                self.kind, pred_block, tgt_block, extra_mask, **self.extra_kwargs
            )
            total = total + s
            count = count + c
        if self.reduction == "mean":
            return total / jnp.maximum(count, 1.0)
        return total

    def sum_and_count(self, predictions, targets, extra_data=None):
        """Raw (sum, count) for distributed-mean reduction."""
        pred_map = predictions[self.target]
        tgt_map = targets[self.target]
        mask_map = (extra_data or {}).get(f"{self.target}_mask")
        total = jnp.zeros(())
        count = jnp.zeros(())
        for idx in range(len(tgt_map)):
            pred_block = pred_map.blocks()[idx]
            tgt_block = tgt_map.blocks()[idx]
            mask_block = (
                mask_map.blocks()[idx] if mask_map is not None else None
            )
            if self.gradient is not None:
                if not tgt_block.has_gradient(self.gradient):
                    continue
                pred_block = pred_block.gradient(self.gradient)
                tgt_block = tgt_block.gradient(self.gradient)
                # the mask for a gradient term is the mask's matching
                # gradient block, not its value block (shape (A, 3, P)
                # vs (S, P); cf. metrics.batch_errors)
                mask_block = (
                    mask_block.gradient(self.gradient)
                    if mask_block is not None
                    and mask_block.has_gradient(self.gradient)
                    else None
                )
            extra_mask = mask_block
            s, c = block_loss_terms(
                self.kind, pred_block, tgt_block, extra_mask, **self.extra_kwargs
            )
            total, count = total + s, count + c
        return total, count


_RESERVED = (
    "type", "weight", "reduction", "gradients", "sliding_factor",
    "forces", "stress", "virial",
)

# user-facing gradient names in loss configs (reference
# ``docs/src/concepts/loss-functions.rst``: forces/stress/virial nest
# directly in the target's loss spec) -> internal gradient names
_GRADIENT_ALIASES = {
    "forces": "positions",
    "stress": "strain",
    "virial": "strain",
}


def _expand_spec(spec: Union[str, Dict[str, Any], None]) -> Dict[str, Any]:
    if spec is None:
        spec = {}
    if isinstance(spec, str):
        spec = {"type": spec}
    gradients = dict(spec.get("gradients", {}))
    for alias, internal in _GRADIENT_ALIASES.items():
        if alias in spec:
            gradients[internal] = spec[alias]
    out = {
        "type": spec.get("type", "mse"),
        "weight": float(spec.get("weight", 1.0)),
        "reduction": spec.get("reduction", "mean"),
        "gradients": gradients,
    }
    out["extra"] = {k: v for k, v in spec.items() if k not in _RESERVED}
    return out


class LossAggregator:
    """Weighted sum of per-target and per-gradient loss terms.

    :param targets: target name -> TargetInfo.
    :param config: either one spec (str/dict) applied to every target, or a
        per-target dict ``{name: spec}``; specs may nest a ``gradients``
        section with per-gradient specs (reference ``loss.py:1039-1184``).
    """

    def __init__(
        self,
        targets: Dict[str, TargetInfo],
        config: Union[str, Dict[str, Any], None] = None,
    ):
        per_target_config: Dict[str, Any] = {}
        if isinstance(config, str) or config is None:
            per_target_config = {name: config for name in targets}
        elif any(key in _RESERVED for key in config):
            # a single spec dict ({"type": ..., "weight": ...}) for all
            # targets
            per_target_config = {name: config for name in targets}
        else:
            # per-target mapping: unknown names are a config error (a
            # typo'd target would otherwise silently change semantics)
            unknown = set(config) - set(targets)
            if unknown:
                raise ValueError(
                    f"loss config names unknown target(s) "
                    f"{sorted(unknown)}; dataset targets: {sorted(targets)}"
                )
            per_target_config = {name: config.get(name) for name in targets}

        self.terms: Dict[str, LossTerm] = {}
        self.metadata: Dict[str, Any] = {}
        for name, info in targets.items():
            spec = _expand_spec(per_target_config.get(name))
            self.terms[name] = LossTerm(
                target=name,
                gradient=None,
                kind=spec["type"],
                weight=spec["weight"],
                reduction=spec["reduction"],
                extra_kwargs=spec["extra"],
            )
            self.metadata[name] = {
                "type": spec["type"],
                "weight": spec["weight"],
                "gradients": {},
            }
            for grad_name in info.gradients:
                grad_spec = _expand_spec(spec["gradients"].get(grad_name))
                self.terms[f"{name}_grad_{grad_name}"] = LossTerm(
                    target=name,
                    gradient=grad_name,
                    kind=grad_spec["type"],
                    weight=grad_spec["weight"],
                    reduction=grad_spec["reduction"],
                    extra_kwargs=grad_spec["extra"],
                )
                self.metadata[name]["gradients"][grad_name] = {
                    "type": grad_spec["type"],
                    "weight": grad_spec["weight"],
                }

    def compute(
        self,
        predictions: Dict[str, TensorMap],
        targets: Dict[str, TensorMap],
        extra_data: Optional[Dict[str, TensorMap]] = None,
    ):
        total = jnp.zeros(())
        for term in self.terms.values():
            if term.target not in predictions:
                continue
            total = total + term.weight * term.compute(
                predictions, targets, extra_data
            )
        return total

    def __call__(self, predictions, targets, extra_data=None):
        return self.compute(predictions, targets, extra_data)
