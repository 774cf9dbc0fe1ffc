"""Composition as a standalone architecture (reference ``src/metatrain/composition/``)."""

from typing import Any, Dict, List

from ..data.dataset import Dataset
from ..utils.abc import ModelInterface, TrainerInterface
from ..utils.io import save_checkpoint_file
from .composition import CompositionModel


class CompositionTrainer(TrainerInterface):
    """Closed-form fit; no SGD (reference ``composition/trainer.py``)."""

    __checkpoint_version__ = 1
    DEFAULT_HYPERS: Dict[str, Any] = {"fixed_weights": {}}

    def __init__(self, hypers=None):
        full = dict(self.DEFAULT_HYPERS)
        full.update(hypers or {})
        super().__init__(full)
        self.epoch = 0

    def train(self, model, dtype, train_datasets, val_datasets, checkpoint_dir="."):
        model.fit(
            train_datasets, fixed_weights=self.hypers.get("fixed_weights") or None
        )
        model.init_params(None)
        self.epoch = 1

    def save_checkpoint(self, model: ModelInterface, path: str) -> None:
        checkpoint = model.get_checkpoint()
        checkpoint["trainer_ckpt_version"] = self.__checkpoint_version__
        checkpoint["train_hypers"] = self.hypers
        save_checkpoint_file(checkpoint, path)

    @classmethod
    def load_checkpoint(cls, checkpoint, hypers):
        return cls(hypers)


__model__ = CompositionModel
__trainer__ = CompositionTrainer

DEFAULT_HYPERS = {"model": {}, "training": dict(CompositionTrainer.DEFAULT_HYPERS)}
