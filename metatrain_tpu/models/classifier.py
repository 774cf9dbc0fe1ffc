"""Classifier: frozen backbone + trainable classification head.

Re-design of the reference ``src/metatrain/experimental/classifier/``:
loads a pre-trained backbone checkpoint, freezes it, extracts last-layer
features and trains a small MLP head with softmax cross-entropy on
per-structure class targets (soft or one-hot).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.collate import CollateFn
from ..data.dataset import Dataset
from ..data.samplers import BatchSampler, DataLoader
from ..data.target_info import DatasetInfo
from ..engine.loss import LossAggregator
from ..ops.segment import sum_over_atoms
from ..utils.abc import ModelInterface, TrainerInterface
from ..utils.io import model_from_checkpoint, save_checkpoint_file


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # checkpoint of the trained backbone to freeze (CLI path; the API
    # can pass a live model as ``backbone`` instead)
    "model_checkpoint": None,
    "num_hidden_layers": 2,
    "num_neurons_per_layer": 64,
}


class _HeadModule(nn.Module):
    num_hidden_layers: int
    width: int
    num_classes: int

    @nn.compact
    def __call__(self, features):
        h = features
        for i in range(self.num_hidden_layers):
            h = nn.Dense(self.width, name=f"hidden_{i}")(h)
            h = jax.nn.silu(h)
        return nn.Dense(self.num_classes, name="logits")(h)


class Classifier(ModelInterface):
    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(
        self,
        hypers: Dict[str, Any],
        dataset_info: DatasetInfo,
        backbone: Optional[ModelInterface] = None,
    ):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        if backbone is None:
            path = full.get("model_checkpoint")
            if not path:
                raise ValueError(
                    "classifier needs hypers['model_checkpoint'] or a backbone"
                )
            backbone = model_from_checkpoint(path, context="export")
        super().__init__(full, dataset_info)
        self.backbone = backbone
        targets = [
            (name, info)
            for name, info in dataset_info.targets.items()
            if info.is_scalar
        ]
        if len(targets) != 1:
            raise ValueError("classifier needs exactly one scalar class target")
        self.target_name, self.target_info = targets[0]
        self.num_classes = len(self.target_info.layout.block(0).properties)
        self.backbone_target = next(
            iter(self.backbone.supported_outputs().keys())
        )
        self.head = _HeadModule(
            full["num_hidden_layers"],
            full["num_neurons_per_layer"],
            self.num_classes,
        )

    def _features(self, batch: SystemBatch) -> jnp.ndarray:
        feats = self.backbone.last_layer_features(
            self.backbone.params, batch, self.backbone_target
        )
        feats = jax.lax.stop_gradient(feats)  # frozen backbone
        per_structure = sum_over_atoms(
            feats, batch.system_index, batch.n_systems_padded, batch.atom_mask
        )
        counts = jnp.maximum(batch.n_atoms_per_system, 1)
        return per_structure / counts[:, None].astype(per_structure.dtype)

    def init_params(self, rng):
        dummy_feats = jnp.zeros(
            (2, self.backbone.last_layer_feature_size), dtype=jnp.float32
        )
        self.params = self.head.init(rng, dummy_feats)
        return self.params

    def forward(
        self, params, batch: SystemBatch, outputs: Sequence[str],
        selected_atoms=None,  # per-structure classifier: selection is n/a
    ) -> Dict[str, TensorMap]:
        if self.target_name not in outputs:
            # requested-outputs contract: nothing asked, nothing computed
            # (reference ``utils/testing/output.py:156-177``)
            return {}
        logits = self.head.apply(params, self._features(batch))
        block = TensorBlock(
            values=logits,
            samples=Labels.range("system", batch.n_systems_padded),
            components=[],
            properties=self.target_info.layout.block(0).properties,
            mask=batch.system_mask,
        )
        return {self.target_name: TensorMap(self.target_info.layout.keys, [block])}

    def forward_eval(self, params, batch, outputs, selected_atoms=None):
        results = self.forward(params, batch, outputs, selected_atoms)
        if self.target_name not in results:
            return results
        block = results[self.target_name].block(0)
        probabilities = jax.nn.softmax(block.values, axis=-1)
        new_block = TensorBlock(
            probabilities, block.samples, block.components,
            block.properties, block.mask,
        )
        results[self.target_name] = TensorMap(
            results[self.target_name].keys, [new_block]
        )
        return results

    def supported_outputs(self):
        return {self.target_name: self.target_info}

    def requested_neighbor_cutoff(self):
        return self.backbone.requested_neighbor_cutoff()

    def get_checkpoint(self):
        return {
            "architecture_name": "experimental.classifier",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": {
                k: v
                for k, v in self.hypers.items()
                if k != "model_checkpoint"
            },
            "dataset_info": self.dataset_info.to_dict(),
            "backbone": self.backbone.get_checkpoint(),
            "params": self.params,
        }

    @classmethod
    def load_checkpoint(cls, checkpoint, context="restart"):
        backbone = model_from_checkpoint(checkpoint["backbone"], context=context)
        model = cls(
            checkpoint["hypers"],
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
            backbone=backbone,
        )
        model.params = jax.tree_util.tree_map(jnp.asarray, checkpoint["params"])
        return model


class ClassifierTrainer(TrainerInterface):
    __checkpoint_version__ = 1
    DEFAULT_HYPERS = {
        "num_epochs": 100,
        "batch_size": 16,
        "learning_rate": 1e-3,
        "seed": 0,
    }

    def __init__(self, hypers=None):
        full = dict(self.DEFAULT_HYPERS)
        full.update(hypers or {})
        super().__init__(full)
        self.epoch = 0
        self.opt_state = None

    def train(self, model: Classifier, dtype, train_datasets, val_datasets, checkpoint_dir="."):
        hp = self.hypers
        if model.params is None:
            model.init_params(jax.random.PRNGKey(hp["seed"]))
        dataset = train_datasets[0]
        collate = CollateFn(
            cutoff=model.requested_neighbor_cutoff() or 5.0,
            target_infos={model.target_name: model.target_info},
        )
        loader = DataLoader(
            dataset,
            BatchSampler(len(dataset), hp["batch_size"], seed=hp["seed"]),
            collate,
        )
        loss_agg = LossAggregator(
            {model.target_name: model.target_info},
            {model.target_name: {"type": "cross_entropy"}},
        )
        optimizer = optax.adam(hp["learning_rate"])
        if self.opt_state is None:
            self.opt_state = optimizer.init(model.params)

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                preds = model.forward(p, batch.systems, [model.target_name])
                return loss_agg(preds, batch.targets)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for epoch in range(self.epoch, hp["num_epochs"]):
            loader.set_epoch(epoch)
            for batch in loader:
                model.params, self.opt_state, _ = step(
                    model.params, self.opt_state, batch
                )
        self.epoch = hp["num_epochs"]

    def save_checkpoint(self, model, path):
        checkpoint = model.get_checkpoint()
        checkpoint["trainer_ckpt_version"] = self.__checkpoint_version__
        checkpoint["train_hypers"] = self.hypers
        checkpoint["epoch"] = self.epoch
        save_checkpoint_file(checkpoint, path)

    @classmethod
    def load_checkpoint(cls, checkpoint, hypers):
        trainer = cls(hypers)
        trainer.epoch = checkpoint.get("epoch", 0)
        return trainer


__model__ = Classifier
__trainer__ = ClassifierTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": dict(ClassifierTrainer.DEFAULT_HYPERS),
}
