"""SOAP-BPNN architecture registration
(reference ``src/metatrain/soap_bpnn/__init__.py``)."""

import copy

from ...engine.trainer import DEFAULT_TRAINER_HYPERS, NNTrainer
from .model import DEFAULT_MODEL_HYPERS, SoapBpnn


class SoapBpnnTrainer(NNTrainer):
    DEFAULT_HYPERS = copy.deepcopy(DEFAULT_TRAINER_HYPERS)
    DEFAULT_HYPERS.update(
        {
            # reference soap_bpnn defaults: smaller lr, plain batching
            "learning_rate": 1e-3,
        }
    )


__model__ = SoapBpnn
__trainer__ = SoapBpnnTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": copy.deepcopy(SoapBpnnTrainer.DEFAULT_HYPERS),
}
