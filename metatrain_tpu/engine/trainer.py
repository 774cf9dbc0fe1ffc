"""Shared NN training loop: one implementation for every architecture.

The reference duplicates ~700-line trainers per architecture
(``pet/trainer.py``, ``soap_bpnn/trainer.py``, ...). Here the loop is a
single engine: fit baselines -> removal collate pipeline -> jitted
(optionally shard_mapped) train step with forces-through-loss -> epoch
metrics -> best-model tracking -> versioned checkpoints. Architectures
subclass :class:`NNTrainer` only to change default hypers.

The train step is one pure function ``(params, opt_state, batch) ->
(params, opt_state, loss, errors)``; with a device mesh it runs under
``shard_map`` with ``psum`` on gradients, loss and error sums, giving
exactly the reference's DDP semantics (grad all-reduce + global metric
union, SURVEY.md section 2.4).
"""

from __future__ import annotations

import copy
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..containers import TensorMap
from ..data.collate import Batch, CollateFn
from ..data.dataset import Dataset
from ..data.samplers import (
    BatchSampler,
    CombinedDataLoader,
    DataLoader,
    MaxAtomBatchSampler,
    PrefetchingLoader,
)
from ..data.target_info import TargetInfo
from ..models.composition import CompositionModel, train_or_load_composition_model
from ..models.scaler import Scaler, train_or_load_scaler
from ..ops.segment import average_by_num_atoms
from ..utils.abc import ModelInterface, TrainerInterface
from ..utils.io import save_checkpoint_file
from ..utils.logging import CSVMetricsWriter, MetricLogger, ROOT_LOGGER
from .evaluate import evaluate_model
from .loss import LossAggregator
from .metrics import ErrorAccumulator, batch_errors, get_selected_metric


logger = logging.getLogger(ROOT_LOGGER + ".trainer")


DEFAULT_TRAINER_HYPERS: Dict[str, Any] = {
    # reference defaults: pet/documentation.py:262-393
    "batch_size": 16,
    "num_epochs": 100,
    "warmup_fraction": 0.01,
    "learning_rate": 1e-4,
    "weight_decay": None,
    "log_interval": 1,
    "checkpoint_interval": 100,
    "scale_targets": True,
    "atomic_baseline": {},
    "fixed_scaling_weights": {},
    "per_structure_targets": [],
    "log_mae": True,
    "log_separate_blocks": False,
    "best_model_metric": "mae_prod",
    "grad_clip_norm": 1.0,
    "loss": "mse",
    "max_atoms_per_batch": None,
    "min_atoms_per_batch": 0,
    "seed": 0,
    # random O(3) augmentation of training batches (reference
    # pet/trainer.py:187,299: train loader only, never validation)
    "o3_augmentation": True,
    # data parallelism over all visible devices: "auto" enables it when
    # more than one device is present (reference auto-enables DDP when
    # SLURM_NTASKS > 1, utils/distributed/slurm.py:28-41)
    "data_parallel": "auto",
    # finetuning: {"read_from": ckpt|None, "method": full|heads|lora,
    # "config": {"rank": r, "alpha": a}, "inherit_heads": {new: source}}
    # (reference pet/modules/finetuning.py)
    "finetune": {
        "read_from": None,
        "method": "full",
        "config": {},
        "inherit_heads": {},
    },
}


def _validate_species_weight_map(spec: Any, what: str) -> None:
    """Early validation of per-target weight maps (reference InputTests,
    ``utils/testing/input.py``): ``{target: scalar}`` or
    ``{target: {atomic_number: value}}``; species keys must be integers
    (``"H"`` is rejected like the reference's pydantic schema) and all
    values numeric. A string (checkpoint path to load) passes through."""
    if not spec or isinstance(spec, str):
        return
    if not isinstance(spec, dict):
        raise ValueError(f"'{what}' must be a mapping, got {type(spec).__name__}")
    for target, value in spec.items():
        if isinstance(value, dict):
            for z, weight in value.items():
                if isinstance(z, bool) or not isinstance(z, int):
                    try:
                        int(str(z))
                    except ValueError:
                        raise ValueError(
                            f"'{what}' for target '{target}': species keys "
                            f"must be atomic numbers (integers), got {z!r}"
                        ) from None
                if not isinstance(weight, (int, float)):
                    raise ValueError(
                        f"'{what}' for target '{target}': value for species "
                        f"{z} must be a number, got {type(weight).__name__}"
                    )
        elif not isinstance(value, (int, float)) or isinstance(value, bool):
            raise ValueError(
                f"'{what}' for target '{target}' must be a number or a "
                f"{{atomic_number: value}} mapping, got {type(value).__name__}"
            )


class NNTrainer(TrainerInterface):
    """Gradient-descent trainer shared by all NN architectures."""

    __checkpoint_version__ = 1
    DEFAULT_HYPERS = DEFAULT_TRAINER_HYPERS

    def __init__(self, hypers: Optional[Dict[str, Any]] = None):
        full = copy.deepcopy(self.DEFAULT_HYPERS)
        full.update(hypers or {})
        super().__init__(full)
        _validate_species_weight_map(full["atomic_baseline"], "atomic_baseline")
        _validate_species_weight_map(
            full.get("fixed_scaling_weights", {}), "fixed_scaling_weights"
        )
        self.epoch: int = 0
        self.opt_state: Any = None
        self.best_metric: float = float("inf")
        self.best_params: Any = None
        self.best_epoch: Optional[int] = None

    # -- main entry point ----------------------------------------------------

    def train(
        self,
        model: ModelInterface,
        dtype: Any,
        train_datasets: List[Dataset],
        val_datasets: List[Dataset],
        checkpoint_dir: str = ".",
    ) -> None:
        hp = self.hypers
        checkpoint_dir = Path(checkpoint_dir)
        target_infos = dict(model.dataset_info.targets)

        # ---- baselines: composition fit + target scaling ----------------
        atomic_baseline = hp["atomic_baseline"]
        if not atomic_baseline:
            # foundation-model imports carry fixed baselines on the model
            # (reference ``get_fixed_composition_weights``, consumed by
            # the trainer unless the user overrides via atomic_baseline)
            model_fixed = getattr(
                model, "get_fixed_composition_weights", dict
            )()
            if model_fixed:
                atomic_baseline = model_fixed
        if isinstance(atomic_baseline, str):
            composition = train_or_load_composition_model(
                atomic_baseline, model.dataset_info, train_datasets
            )
        else:
            composition = train_or_load_composition_model(
                None,
                model.dataset_info,
                train_datasets,
                fixed_weights=atomic_baseline or None,
            )

        baseline_transforms = [composition.remove_transform]
        extra_removals = getattr(model, "extra_removal_transforms", None)
        if extra_removals is not None:
            baseline_transforms.extend(extra_removals())
        if getattr(model, "zbl", None) is not None:
            baseline_transforms.append(model.zbl.remove_transform)
        removed_datasets = [
            _apply_removals_to_dataset(ds, baseline_transforms)
            for ds in train_datasets
        ]
        fixed_scaling = hp["fixed_scaling_weights"]
        if not fixed_scaling:
            model_fixed = getattr(
                model, "get_fixed_scaling_weights", dict
            )()
            if model_fixed:
                fixed_scaling = model_fixed
        if isinstance(fixed_scaling, str):
            scaler = train_or_load_scaler(fixed_scaling, model.dataset_info, [])
        else:
            scaler = train_or_load_scaler(
                None,
                model.dataset_info,
                removed_datasets,
                fixed_scales=fixed_scaling or None,
                enabled=hp["scale_targets"],
            )
        model.composition = composition
        model.scaler = scaler

        # ---- data pipeline ----------------------------------------------
        removal_transforms = baseline_transforms + [scaler.remove_transform]
        train_transforms = list(removal_transforms)
        if hp["o3_augmentation"]:
            from .augmentation import O3Augmenter

            # augment before removal: baselines are rotation invariant, but
            # gradient blocks must be rotated before scaling
            train_transforms = [
                O3Augmenter(seed=hp["seed"])
            ] + train_transforms
        train_collate = CollateFn(
            cutoff=model.requested_neighbor_cutoff() or 5.0,
            target_infos=target_infos,
            dtype=dtype,
            extra_system_keys=model.requested_extra_system_keys(),
            transforms=train_transforms,
        )
        val_collate = CollateFn(
            cutoff=model.requested_neighbor_cutoff() or 5.0,
            target_infos=target_infos,
            dtype=dtype,
            extra_system_keys=model.requested_extra_system_keys(),
            transforms=removal_transforms,
        )
        # ---- data parallelism over the (global) device mesh --------------
        # multi-host: jax.distributed was initialized by the CLI; the mesh
        # spans all processes' devices and each process loads only its
        # local shard (reference DDP semantics, SURVEY.md section 2.4)
        n_dp = 1
        if hp["data_parallel"] in ("auto", True):
            n_dp = jax.device_count()
        if n_dp > 1:
            if hp["max_atoms_per_batch"]:
                approx_batches = sum(
                    int(ds.atom_counts.sum()) // hp["max_atoms_per_batch"] + 1
                    for ds in train_datasets
                )
            else:
                approx_batches = sum(
                    (len(ds) + hp["batch_size"] - 1) // hp["batch_size"]
                    for ds in train_datasets
                )
            if approx_batches < n_dp:
                logger.warning(
                    "data parallelism disabled: only ~%d batches for %d "
                    "devices", approx_batches, n_dp,
                )
                n_dp = 1
        mesh = None
        if n_dp > 1:
            from ..parallel.mesh import DataParallelLoader, make_data_mesh

            mesh = make_data_mesh(n_dp)
            # fixed collate shapes so per-device batches stack
            max_struct = max(
                (int(ds.atom_counts.max(initial=1)) for ds in train_datasets),
                default=1,
            )
            if not hp["max_atoms_per_batch"]:
                # fixed-shape guard: with batch-count sampling the padded
                # atom axis is batch_size * LARGEST structure -- on a
                # mixed-size dataset (one 5k-atom outlier, batch 16) that
                # is an 80k-atom pad on EVERY device batch. Switch to
                # atom-count packing with an implied budget when the
                # worst case is far from the mean.
                counts = np.concatenate(
                    [
                        np.asarray(ds.atom_counts)
                        for ds in train_datasets
                        if len(ds)
                    ]
                    or [np.ones(1)]
                )
                mean_atoms = float(counts.mean())
                if max_struct > 2.0 * mean_atoms:
                    implied = max(
                        int(hp["batch_size"] * mean_atoms), max_struct
                    )
                    padded_mb = (
                        hp["batch_size"] * max_struct * 3 * 4 / 1e6
                    )
                    logger.warning(
                        "data-parallel fixed shapes would pad every device "
                        "batch to %d atoms (batch_size %d x largest "
                        "structure %d; ~%.1f MB of positions alone); "
                        "switching to atom-count packing with "
                        "max_atoms_per_batch=%d. Set max_atoms_per_batch "
                        "explicitly to override.",
                        hp["batch_size"] * max_struct,
                        hp["batch_size"],
                        max_struct,
                        padded_mb,
                        implied,
                    )
                    hp = dict(hp)
                    hp["max_atoms_per_batch"] = implied
            if hp["max_atoms_per_batch"]:
                atoms_budget = hp["max_atoms_per_batch"] + max_struct
                # atom-packed batches hold up to budget/min_struct systems
                min_struct = min(
                    (
                        int(ds.atom_counts.min(initial=max_struct))
                        for ds in train_datasets
                        if len(ds)
                    ),
                    default=1,
                )
                max_systems = atoms_budget // max(min_struct, 1) + 1
            else:
                atoms_budget = hp["batch_size"] * max_struct
                max_systems = hp["batch_size"] + 1
            from ..containers import bucket_size

            fixed_A = bucket_size(atoms_budget)
            fixed_S = bucket_size(max_systems, minimum=2)
            fixed_M = _max_neighbors_over_datasets(
                train_datasets + val_datasets, train_collate
            )
            for fn in (train_collate, val_collate):
                fn.n_atoms_padded = fixed_A
                fn.n_systems_padded = fixed_S
                fn.max_neighbors = fixed_M

        train_loader = _build_loader(
            train_datasets, train_collate, hp, shuffle=True
        )
        val_loader = _build_loader(val_datasets, val_collate, hp, shuffle=False)
        if n_dp > 1:
            train_loader = DataParallelLoader(
                train_loader,
                n_dp,
                mesh,
                num_processes=jax.process_count(),
                process_id=jax.process_index(),
            )
        # overlap host-side collation (NL reads, padding, transforms) with
        # device execution — the role DataLoader workers play in the
        # reference (``utils/data/dataset.py:1145-1205``), thread-based
        # here (the C++ neighbor builder releases the GIL)
        train_loader = PrefetchingLoader(train_loader)
        val_loader = PrefetchingLoader(val_loader)

        # ---- parameters & optimizer ----------------------------------------
        if model.params is None:
            model.init_params(jax.random.PRNGKey(hp["seed"]))

        steps_per_epoch = max(len(train_loader), 1)
        total_steps = steps_per_epoch * hp["num_epochs"]
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=hp["learning_rate"],
            warmup_steps=max(int(hp["warmup_fraction"] * total_steps), 1),
            decay_steps=max(total_steps, 2),
        )
        if hp["weight_decay"]:
            opt = optax.adamw(schedule, weight_decay=hp["weight_decay"])
        else:
            opt = optax.adam(schedule)
        optimizer = optax.chain(
            optax.clip_by_global_norm(hp["grad_clip_norm"]), opt
        )

        # ---- finetuning strategy: what trains, and through what forward --
        finetune = hp.get("finetune") or {}
        method = finetune.get("method", "full")
        if finetune.get("inherit_heads") and self.opt_state is None:
            # fresh finetune run: seed new targets' heads from existing
            # ones (reference pet/modules/finetuning.py:57-61)
            from .finetuning import inherit_heads

            model.params = inherit_heads(
                model.params, dict(finetune["inherit_heads"])
            )
        lora_state: Optional[dict] = None
        forward_fn = model.forward
        train_params = model.params
        if method == "heads":
            from .finetuning import masked_optimizer

            optimizer = masked_optimizer(optimizer, model.params, "heads")
        elif method == "lora":
            from .finetuning import apply_lora, init_lora_params, make_lora_forward

            cfg = finetune.get("config") or {}
            rank = int(cfg.get("rank", 4))
            alpha = float(cfg.get("alpha", 2 * rank))
            resume_adapters = getattr(self, "lora_adapters", None)
            if resume_adapters is not None:
                # restart: the snapshot stored MERGED weights plus the
                # adapters; recover the frozen base (merge is additive)
                adapters = jax.tree_util.tree_map(
                    jnp.asarray, resume_adapters
                )
                model.params = apply_lora(
                    model.params, adapters, -alpha, rank
                )
            else:
                adapters = init_lora_params(
                    model.params, rank, jax.random.PRNGKey(hp["seed"] + 1)
                )
            forward_fn = make_lora_forward(model, adapters, alpha, rank)
            train_params = adapters
            lora_state = {"alpha": alpha, "rank": rank}
        elif method != "full":
            raise ValueError(f"unknown finetuning method {method!r}")

        if self.opt_state is None:
            self.opt_state = optimizer.init(train_params)

        loss_agg = LossAggregator(target_infos, hp["loss"])
        per_structure = list(hp["per_structure_targets"])
        # per-BLOCK metric-unscaling rows: multi-block targets can carry
        # different property counts per block (atomic-basis layouts), so
        # one flat scale cannot broadcast across the whole TensorMap
        scales = {
            name: tuple(
                jnp.asarray(rows[0])
                for rows in scaler.scales.get(
                    name, [np.ones((1, 1))] * len(info.layout)
                )
            )
            for name, info in target_infos.items()
        }

        if mesh is not None:
            from ..parallel.mesh import make_dp_train_step

            def _loss_and_errors(p, batch):
                return _compute_loss_and_errors(
                    forward_fn, loss_agg, target_infos, per_structure, scales, p, batch
                )

            train_step = make_dp_train_step(_loss_and_errors, optimizer, mesh)
        else:
            train_step = _make_train_step(
                forward_fn, loss_agg, target_infos, optimizer, per_structure, scales
            )
        val_step = _make_val_step(
            forward_fn, loss_agg, target_infos, per_structure, scales
        )

        metric_logger = MetricLogger(
            logger,
            CSVMetricsWriter(checkpoint_dir / "train.csv")
            if jax.process_index() == 0
            else None,
            wandb_logger=getattr(self, "wandb_logger", None),
        )
        not_per_atom = ["positions_gradients", "strain_gradients"] + per_structure

        start_epoch = self.epoch
        for epoch in range(start_epoch, hp["num_epochs"]):
            self.epoch = epoch
            train_loader.set_epoch(epoch)
            epoch_start = time.time()

            # keep losses/errors on device during the epoch; one host
            # fetch at the end (a per-step float()/device_get would
            # serialize host<->device every batch and cap the step rate)
            train_errors = ErrorAccumulator(hp["log_separate_blocks"])
            device_losses, device_errors = [], []
            for batch in train_loader:
                train_params, self.opt_state, loss, errors = train_step(
                    train_params, self.opt_state, batch
                )
                device_losses.append(loss)
                device_errors.append(errors)
            n_batches = len(device_losses)
            train_loss_sum = float(np.sum(jax.device_get(device_losses))) if device_losses else 0.0
            for errors in jax.device_get(device_errors):
                train_errors.update_from_errors(errors)

            val_errors = ErrorAccumulator(hp["log_separate_blocks"])
            device_losses, device_errors = [], []
            for batch in val_loader:
                loss, errors = val_step(train_params, batch)
                device_losses.append(loss)
                device_errors.append(errors)
            n_val = len(device_losses)
            val_loss_sum = float(np.sum(jax.device_get(device_losses))) if device_losses else 0.0
            for errors in jax.device_get(device_errors):
                val_errors.update_from_errors(errors)

            metrics: Dict[str, float] = {
                "train loss": train_loss_sum / max(n_batches, 1),
            }
            if n_val:
                metrics["val loss"] = val_loss_sum / max(n_val, 1)
            for key, value in train_errors.finalize(
                not_per_atom, ("RMSE", "MAE") if hp["log_mae"] else ("RMSE",)
            ).items():
                metrics[f"train {key}"] = value
            val_finalized = val_errors.finalize(
                not_per_atom, ("RMSE", "MAE") if hp["log_mae"] else ("RMSE",)
            )
            for key, value in val_finalized.items():
                metrics[f"val {key}"] = value
            metrics["epoch time (s)"] = time.time() - epoch_start

            if (
                epoch == start_epoch or epoch % hp["log_interval"] == 0
            ) and jax.process_index() == 0:
                lr = float(schedule(epoch * steps_per_epoch))
                metric_logger.log(epoch, metrics, learning_rate=lr)

            # best-model tracking on the configured validation metric
            selection_pool = dict(val_finalized)
            selection_pool["loss"] = metrics.get(
                "val loss", metrics["train loss"]
            )
            selected = get_selected_metric(
                selection_pool, hp["best_model_metric"]
            )
            if selected < self.best_metric:
                self.best_metric = selected
                if lora_state is not None:
                    from .finetuning import apply_lora

                    merged = apply_lora(
                        model.params,
                        train_params,
                        lora_state["alpha"],
                        lora_state["rank"],
                    )
                    self.best_params = jax.device_get(merged)
                else:
                    self.best_params = jax.device_get(train_params)
                self.best_epoch = epoch

            # keep the model's weights current for checkpointing/eval
            if lora_state is None:
                model.params = train_params

            if (
                hp["checkpoint_interval"]
                and (epoch + 1) % hp["checkpoint_interval"] == 0
                and jax.process_index() == 0  # rank-0 IO, reference
                # pet/trainer.py:677-687
            ):
                # the snapshot records the NEXT epoch to run, so a restart
                # continues instead of repeating this epoch
                self.epoch = epoch + 1
                if lora_state is not None:
                    # snapshot MERGED weights (usable for eval/export)
                    # plus the raw adapters (exact resume)
                    from .finetuning import apply_lora

                    self.lora_adapters = jax.device_get(train_params)
                    base_params = model.params
                    model.params = apply_lora(
                        base_params,
                        train_params,
                        lora_state["alpha"],
                        lora_state["rank"],
                    )
                    self.save_checkpoint(
                        model, checkpoint_dir / f"model_{epoch + 1}.ckpt"
                    )
                    model.params = base_params
                else:
                    self.save_checkpoint(
                        model, checkpoint_dir / f"model_{epoch + 1}.ckpt"
                    )
                self.epoch = epoch

        if lora_state is not None:
            from .finetuning import apply_lora

            self.lora_adapters = jax.device_get(train_params)
            model.params = apply_lora(
                model.params, train_params, lora_state["alpha"], lora_state["rank"]
            )
        else:
            model.params = train_params
        self.epoch = hp["num_epochs"]

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, model: ModelInterface, path: str) -> None:
        checkpoint = model.get_checkpoint()
        checkpoint.update(
            {
                "trainer_ckpt_version": self.__checkpoint_version__,
                "train_hypers": self.hypers,
                "epoch": self.epoch,
                "opt_state": self.opt_state,
                "best_metric": self.best_metric,
                "best_params": self.best_params,
                "best_epoch": self.best_epoch,
                "lora_adapters": getattr(self, "lora_adapters", None),
            }
        )
        save_checkpoint_file(checkpoint, path)

    @classmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], hypers: Dict[str, Any]
    ) -> "NNTrainer":
        trainer = cls(hypers)
        trainer.epoch = checkpoint.get("epoch", 0)
        trainer.opt_state = checkpoint.get("opt_state")
        trainer.best_metric = checkpoint.get("best_metric", float("inf"))
        trainer.best_params = checkpoint.get("best_params")
        trainer.best_epoch = checkpoint.get("best_epoch")
        trainer.lora_adapters = checkpoint.get("lora_adapters")
        return trainer


# -- helpers --------------------------------------------------------------------


def _max_neighbors_over_datasets(datasets, collate: CollateFn) -> int:
    """Largest NEF width over all systems (also warms the NL cache)."""
    from ..containers import bucket_neighbors

    from ..data.dataset import iter_samples

    max_m = 1
    for dataset in datasets:
        for sample in iter_samples(dataset):
            max_m = max(
                max_m, collate.nl_cache(sample.system).max_neighbors
            )
    return bucket_neighbors(max_m)


class _RemovedView:
    """Lazy per-sample baseline removal (for the scaler fit): keeps
    disk-backed datasets out-of-core instead of materializing a removed
    copy of the whole dataset."""

    def __init__(self, dataset, transforms):
        self.base = dataset
        self.transforms = list(transforms)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, index: int):
        samples = [self.base[index]]
        for transform in self.transforms:
            samples = transform(samples)
        return samples[0]

    @property
    def atom_counts(self):
        return self.base.atom_counts

    @property
    def target_names(self):
        from ..data.dataset import dataset_target_names

        return dataset_target_names(self.base)


def _apply_removals_to_dataset(dataset: Dataset, transforms) -> "_RemovedView":
    """Baseline-removed view of a dataset (host-side, lazy)."""
    return _RemovedView(dataset, transforms)


def _build_loader(
    datasets: List[Dataset], collate: CollateFn, hp: Dict[str, Any], shuffle: bool
):
    loaders = []
    for i, dataset in enumerate(datasets):
        if hp["max_atoms_per_batch"]:
            sampler = MaxAtomBatchSampler(
                dataset.atom_counts,
                hp["max_atoms_per_batch"],
                min_atoms=hp["min_atoms_per_batch"],
                shuffle=shuffle,
                seed=hp["seed"] + i,
            )
        else:
            sampler = BatchSampler(
                len(dataset),
                hp["batch_size"],
                shuffle=shuffle,
                seed=hp["seed"] + i,
            )
        loaders.append(DataLoader(dataset, sampler, collate))
    if len(loaders) == 1:
        return loaders[0]
    return CombinedDataLoader(loaders, shuffle=shuffle, seed=hp["seed"])


def _compute_loss_and_errors(
    forward_fn, loss_agg, target_infos, per_structure, scales, params, batch: Batch
):
    batch_target_names = list(batch.targets.keys())
    infos = {n: target_infos[n] for n in batch_target_names}
    predictions = evaluate_model(
        forward_fn, params, batch.systems, infos, is_training=True
    )
    predictions = average_by_num_atoms(predictions, batch.systems, per_structure)
    targets = average_by_num_atoms(batch.targets, batch.systems, per_structure)
    loss = loss_agg(predictions, targets, batch.extra_data)

    # metrics are reported in physical units: undo the target scaling
    # (per block: block property counts can differ within one target)
    def _unscale(tmap, block_scales):
        from ..containers import TensorMap as _TM

        blocks = [
            b.map_values(lambda v, s=s: v * s.astype(v.dtype))
            for b, s in zip(tmap.blocks(), block_scales)
        ]
        return _TM(tmap.keys, blocks)

    scaled_predictions = {
        n: _unscale(t, scales[n]) for n, t in predictions.items()
    }
    scaled_targets = {
        n: _unscale(t, scales[n]) for n, t in targets.items()
    }
    errors = batch_errors(scaled_predictions, scaled_targets, batch.extra_data)
    return loss, errors


def _make_train_step(
    forward_fn, loss_agg, target_infos, optimizer, per_structure, scales
):
    def step(params, opt_state, batch: Batch):
        def loss_fn(p):
            return _compute_loss_and_errors(
                forward_fn, loss_agg, target_infos, per_structure, scales, p, batch
            )

        (loss, errors), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, errors

    return jax.jit(step, donate_argnums=(0, 1))


def _make_val_step(forward_fn, loss_agg, target_infos, per_structure, scales):
    def step(params, batch: Batch):
        return _compute_loss_and_errors(
            forward_fn, loss_agg, target_infos, per_structure, scales, params, batch
        )

    return jax.jit(step)
