"""``mtt-tpu train``: full training orchestration.

Counterpart of reference ``cli/train.py:229-842``: validate options ->
import architecture -> merge hypers -> seed -> build datasets (fraction
split or explicit files) -> DatasetInfo -> instantiate/restore model ->
train -> save checkpoint -> export -> final eval.
"""

from __future__ import annotations

import logging
import random
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data.dataset import (
    Dataset,
    get_dataset,
    get_dataset_info,
    get_stats,
    train_val_test_split,
)
from ..utils.architectures import import_architecture
from ..utils.config import (
    merge_architecture_hypers,
    save_expanded_options,
    validate_base_options,
)
from ..utils.io import (
    load_checkpoint_file,
    model_from_checkpoint,
    save_checkpoint_file,
    trainer_from_checkpoint,
)
from ..utils.logging import ROOT_LOGGER


logger = logging.getLogger(ROOT_LOGGER + ".train")

_PRECISION_DTYPES = {16: jnp.bfloat16, 32: jnp.float32, 64: jnp.float64}


def train_model(
    options: Dict[str, Any],
    output_dir: str = ".",
    checkpoint_dir: str = ".",
    restart_from: Optional[str] = None,
    output_name: str = "model.mtt",
) -> None:
    # multi-host: bootstrap jax.distributed from the SLURM environment
    # BEFORE any backend use (reference auto-enables DDP when
    # SLURM_NTASKS > 1, utils/distributed/slurm.py:28-41); no-op for
    # single-process runs
    from ..parallel.slurm import initialize_distributed, is_main_process

    initialize_distributed()

    # fill unset kernel knobs from the per-device-kind autotune cache
    # (bench.py records the measured-fastest config; explicit env wins)
    from ..utils.autotune import apply_tuned_config

    apply_tuned_config()

    options = validate_base_options(options)
    arch_name = options["architecture"]["name"]
    architecture = import_architecture(arch_name)

    hypers = merge_architecture_hypers(
        arch_name,
        {
            "model": options["architecture"]["model"],
            "training": options["architecture"]["training"],
        },
    )

    seed = int(options["seed"])
    random.seed(seed)
    np.random.seed(seed)
    hypers["training"].setdefault("seed", seed)

    dtype = _PRECISION_DTYPES[options["base_precision"]]

    # ---- datasets (single section or a list of sections; reference
    # multi-dataset training via CombinedDataLoader) -----------------------
    train_confs = options["training_set"]
    if not isinstance(train_confs, list):
        train_confs = [train_confs]
    train_datasets = []
    target_infos: Dict[str, Any] = {}
    for conf in train_confs:
        dataset, infos = get_dataset(conf)
        train_datasets.append(dataset)
        target_infos.update(infos)
    length_unit = train_confs[0]["systems"].get("length_unit", "")

    val_conf = options["validation_set"]
    test_conf = options["test_set"]
    val_datasets: list = []
    test_datasets: list = []
    if isinstance(val_conf, (int, float)):
        test_fraction = (
            float(test_conf) if isinstance(test_conf, (int, float)) else 0.0
        )
        split_trains = []
        for dataset in train_datasets:
            train_part, val_part, test_part = train_val_test_split(
                dataset,
                val_fraction=float(val_conf),
                test_fraction=test_fraction,
                seed=seed,
            )
            split_trains.append(train_part)
            val_datasets.append(val_part)
            test_datasets.append(test_part)
        train_datasets = split_trains
    else:
        for conf in val_conf if isinstance(val_conf, list) else [val_conf]:
            val_datasets.append(get_dataset(conf)[0])
        if not isinstance(test_conf, (int, float)):
            for conf in (
                test_conf if isinstance(test_conf, list) else [test_conf]
            ):
                test_datasets.append(get_dataset(conf)[0])

    dataset_info = get_dataset_info(
        train_datasets + val_datasets, target_infos, length_unit
    )
    for i, dataset in enumerate(train_datasets):
        tag = f" #{i}" if len(train_datasets) > 1 else ""
        logger.info(
            "Training dataset%s:\n%s", tag, get_stats(dataset, dataset_info)
        )
    for i, dataset in enumerate(val_datasets):
        if len(dataset):
            tag = f" #{i}" if len(val_datasets) > 1 else ""
            logger.info(
                "Validation dataset%s:\n%s",
                tag,
                get_stats(dataset, dataset_info),
            )

    checkpoint_dir = Path(checkpoint_dir)
    if is_main_process():
        checkpoint_dir.mkdir(parents=True, exist_ok=True)
        save_expanded_options(options, checkpoint_dir / "options_restart.yaml")

    # ---- model + trainer (fresh / restart / finetune) --------------------
    finetune_from = hypers["training"].get("finetune", {}) or {}
    finetune_path = (
        finetune_from.get("read_from")
        if isinstance(finetune_from, dict)
        else None
    )
    if restart_from is not None:
        logger.info("Restarting training from %s", restart_from)
        checkpoint = load_checkpoint_file(restart_from)
        model = model_from_checkpoint(checkpoint, context="restart")
        model = model.restart(dataset_info)
        trainer = trainer_from_checkpoint(
            checkpoint, hypers["training"], context="restart"
        )
    elif finetune_path:
        logger.info("Finetuning from %s", finetune_path)
        model = model_from_checkpoint(finetune_path, context="finetune")
        model = model.restart(dataset_info)
        trainer = architecture.__trainer__(hypers["training"])
    else:
        model = architecture.__model__(hypers["model"], dataset_info)
        trainer = architecture.__trainer__(hypers["training"])

    # ---- train ------------------------------------------------------------
    if options.get("wandb"):
        from ..utils.wandb_logging import WandbLogger

        trainer.wandb_logger = WandbLogger(options["wandb"], options)
    real_vals = [ds for ds in val_datasets if len(ds)]
    trainer.train(
        model=model,
        dtype=dtype,
        train_datasets=train_datasets,
        val_datasets=real_vals if real_vals else train_datasets,
        checkpoint_dir=str(checkpoint_dir),
    )

    # ---- save + export (process 0 only; reference rank-0 gating at
    # pet/trainer.py:677-687) ------------------------------------------------
    if not is_main_process():
        return
    final_ckpt = checkpoint_dir / "model.ckpt"
    trainer.save_checkpoint(model, str(final_ckpt))
    logger.info("Saved checkpoint to %s", final_ckpt)

    from .export import export_model_object

    export_path = Path(output_dir) / output_name
    export_model_object(model, trainer, str(export_path))
    logger.info("Exported model to %s", export_path)

    # ---- final eval on train/val/test --------------------------------------
    from .eval import evaluate_datasets

    for split_name, datasets in (
        ("train", train_datasets),
        ("validation", val_datasets),
        ("test", test_datasets),
    ):
        for i, dataset in enumerate(datasets):
            if not len(dataset):
                continue
            tag = f" #{i}" if len(datasets) > 1 else ""
            metrics = evaluate_datasets(model, dataset, dataset_info)
            for key, value in metrics.items():
                logger.info("%s%s %s: %.6g", split_name, tag, key, value)


def find_latest_checkpoint(outputs_root: str = "outputs") -> Optional[str]:
    """``--restart auto``: most recent ckpt by mtime
    (reference ``cli/train.py:214-226``)."""
    root = Path(outputs_root)
    candidates = sorted(
        root.glob("*/*/*.ckpt"), key=lambda p: p.stat().st_mtime
    )
    return str(candidates[-1]) if candidates else None
