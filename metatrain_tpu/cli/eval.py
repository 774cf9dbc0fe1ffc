"""``mtt-tpu eval``: batched evaluation of a (exported) model.

Counterpart of reference ``cli/eval.py``: per-batch ``evaluate_model``
with RMSE/MAE accumulation, warm-up before timing, per-atom timing
report, and streaming writers.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import CollateFn
from ..data.dataset import Dataset, get_dataset
from ..data.samplers import BatchSampler, DataLoader
from ..data.target_info import DatasetInfo
from ..engine.evaluate import evaluate_model
from ..ops.segment import average_by_num_atoms
from ..engine.metrics import ErrorAccumulator, batch_errors
from ..utils.config import expand_dataset_config
from ..utils.io import load_model
from ..utils.logging import ROOT_LOGGER


logger = logging.getLogger(ROOT_LOGGER + ".eval")


def evaluate_datasets(
    model,
    dataset: Dataset,
    dataset_info: DatasetInfo,
    batch_size: int = 16,
    check_consistency: bool = False,
) -> Dict[str, float]:
    """RMSE/MAE of an eval-mode model over a dataset."""
    target_infos = {
        name: info
        for name, info in dataset_info.targets.items()
        if name in dataset.targets
    }
    collate = CollateFn(
        cutoff=model.requested_neighbor_cutoff() or 5.0,
        target_infos=target_infos,
        extra_system_keys=model.requested_extra_system_keys(),
    )
    loader = DataLoader(
        dataset,
        BatchSampler(len(dataset), batch_size, shuffle=False),
        collate,
    )
    forward = getattr(model, "forward_eval", model.forward)

    @jax.jit
    def eval_step(params, batch):
        predictions = evaluate_model(
            forward, params, batch.systems, target_infos, is_training=False
        )
        # per-atom averaging before the error accumulation, exactly as in
        # training (the finalize() keys say "per atom"; without this the
        # reported numbers would silently be per STRUCTURE)
        averaged_preds = average_by_num_atoms(predictions, batch.systems, [])
        averaged_targets = average_by_num_atoms(
            batch.targets, batch.systems, []
        )
        return predictions, batch_errors(averaged_preds, averaged_targets)

    accumulator = ErrorAccumulator()
    for batch in loader:
        _, errors = eval_step(model.params, batch)
        accumulator.update_from_errors(jax.device_get(errors))
    return accumulator.finalize(not_per_atom=["positions_gradients", "strain_gradients"])


def eval_model(
    model_path: str,
    options: Dict[str, Any],
    output_path: Optional[str] = None,
    batch_size: int = 16,
    check_consistency: bool = False,
    warm_up: int = 1,
) -> Dict[str, float]:
    """Full eval command: load model, read dataset, evaluate, write outputs."""
    from ..utils.autotune import apply_tuned_config

    apply_tuned_config()
    model = load_model(model_path, context="export")

    dataset_config = expand_dataset_config(options)
    dataset, target_infos = get_dataset(dataset_config)
    # membership by name only (``.targets`` on disk-backed datasets would
    # materialize every stored sample)
    dataset_target_names = set(
        getattr(dataset, "target_names", None) or dataset.targets
    )
    target_infos = {
        name: info
        for name, info in model.supported_outputs().items()
        if name in dataset_target_names
    } or target_infos

    collate = CollateFn(
        cutoff=model.requested_neighbor_cutoff() or 5.0,
        target_infos=target_infos,
        extra_system_keys=model.requested_extra_system_keys(),
    )
    loader = DataLoader(
        dataset, BatchSampler(len(dataset), batch_size, shuffle=False), collate
    )
    forward = getattr(model, "forward_eval", model.forward)

    @jax.jit
    def eval_step(params, batch):
        predictions = evaluate_model(
            forward, params, batch.systems, target_infos, is_training=False
        )
        # per-atom averaging before the error accumulation, exactly as in
        # training (the finalize() keys say "per atom"; without this the
        # reported numbers would silently be per STRUCTURE)
        averaged_preds = average_by_num_atoms(predictions, batch.systems, [])
        averaged_targets = average_by_num_atoms(
            batch.targets, batch.systems, []
        )
        return predictions, batch_errors(averaged_preds, averaged_targets)

    # warm-up before timing (reference cli/eval.py:219-234)
    accumulator = ErrorAccumulator()
    all_predictions = []
    batch_list = list(loader)
    if check_consistency:
        from ..utils.consistency import check_batch_consistency

        for batch in batch_list:
            check_batch_consistency(
                batch.systems, model.requested_neighbor_cutoff() or 5.0
            )
    for batch in batch_list[:warm_up]:
        jax.block_until_ready(eval_step(model.params, batch)[1])

    per_atom_times = []
    start_total = time.perf_counter()
    for batch in batch_list:
        t0 = time.perf_counter()
        predictions, errors = eval_step(model.params, batch)
        jax.block_until_ready(errors)
        elapsed = time.perf_counter() - t0
        n_atoms = int(np.asarray(batch.systems.n_atoms))
        per_atom_times.append(elapsed / max(n_atoms, 1) * 1000.0)
        accumulator.update_from_errors(jax.device_get(errors))
        all_predictions.append((batch, predictions))
    total = time.perf_counter() - start_total

    metrics = accumulator.finalize(not_per_atom=["positions_gradients", "strain_gradients"])
    for key, value in metrics.items():
        logger.info("%s: %.6g", key, value)
    if per_atom_times:
        logger.info(
            "Evaluation time: %.2f s [%.4f ± %.4f ms per atom]",
            total,
            float(np.mean(per_atom_times)),
            float(np.std(per_atom_times)),
        )

    if output_path is not None:
        from ..data.writers import write_predictions

        write_predictions(output_path, all_predictions, target_infos)
        logger.info("Wrote predictions to %s", output_path)

    return metrics
