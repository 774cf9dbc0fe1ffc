"""Abstract interfaces every architecture implements.

Counterpart of the reference ``utils/abc.py`` (``ModelInterface`` at :29,
``TrainerInterface`` at :232), reshaped for a functional JAX world: the
model object is a host-side description (hypers, dataset_info, label
metadata) owning a *parameter pytree*; the hot path is the pure
``forward(params, batch, outputs)`` function, which jit/vjp/shard_map
compose around.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, List, Optional, Sequence

import jax

from ..containers import SystemBatch, TensorMap
from ..data.target_info import DatasetInfo


class ModelInterface(abc.ABC):
    """Base class for all models.

    Class attributes every architecture must define (reference
    ``utils/abc.py:29-118``):

    - ``__checkpoint_version__``: int, bumped on checkpoint layout changes.
    - ``__supported_dtypes__``: list of jnp dtypes the model can run in.
    - ``__default_metadata__``: dict with e.g. ``references``.
    """

    __checkpoint_version__: int = 1
    __supported_dtypes__: List[Any] = []
    __default_metadata__: Dict[str, Any] = {}

    def __init__(self, hypers: Dict[str, Any], dataset_info: DatasetInfo):
        self.hypers = hypers
        self.dataset_info = dataset_info
        self.params: Any = None  # parameter pytree, set by init_params/restore

    # -- core contract ------------------------------------------------------

    @abc.abstractmethod
    def init_params(self, rng: jax.Array) -> Any:
        """Initialize and return the parameter pytree (also stored on self)."""

    @abc.abstractmethod
    def forward(
        self,
        params: Any,
        batch: SystemBatch,
        outputs: Sequence[str],
    ) -> Dict[str, TensorMap]:
        """Pure jittable forward pass producing one TensorMap per output."""

    @abc.abstractmethod
    def supported_outputs(self) -> Dict[str, Any]:
        """All outputs this model can produce."""

    def requested_neighbor_cutoff(self) -> Optional[float]:
        """Neighbor-list cutoff this model needs (None: no neighbor list)."""
        return None

    def requested_extra_system_keys(self) -> Sequence[str]:
        """Per-system extra data keys to ship in SystemBatch.extra."""
        return ()

    # -- lifecycle ------------------------------------------------------------

    def restart(self, dataset_info: DatasetInfo) -> "ModelInterface":
        """Continue with a (possibly extended) dataset. Default: require
        an identical dataset_info."""
        if dataset_info != self.dataset_info:
            raise ValueError(
                f"{type(self).__name__} does not support restarting with a "
                "different dataset"
            )
        return self

    # -- checkpointing ---------------------------------------------------------

    @abc.abstractmethod
    def get_checkpoint(self) -> Dict[str, Any]:
        """Serializable state dict (see utils/io.py for the envelope)."""

    @classmethod
    @abc.abstractmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], context: str = "restart"
    ) -> "ModelInterface":
        """Rebuild a model from a checkpoint.

        :param context: "restart" | "finetune" | "export"
            (reference ``utils/abc.py:170-189``).
        """

    @classmethod
    def upgrade_checkpoint(cls, checkpoint: Dict[str, Any]) -> Dict[str, Any]:
        """Apply stepwise version migrations (see utils/io.py driver)."""
        return checkpoint


class TrainerInterface(abc.ABC):
    """Base class for all trainers (reference ``utils/abc.py:232-339``)."""

    __checkpoint_version__: int = 1

    def __init__(self, hypers: Dict[str, Any]):
        self.hypers = hypers

    @abc.abstractmethod
    def train(
        self,
        model: ModelInterface,
        dtype: Any,
        train_datasets: List[Any],
        val_datasets: List[Any],
        checkpoint_dir: str,
    ) -> None:
        ...

    @abc.abstractmethod
    def save_checkpoint(self, model: ModelInterface, path: str) -> None:
        ...

    @classmethod
    @abc.abstractmethod
    def load_checkpoint(
        cls, checkpoint: Dict[str, Any], hypers: Dict[str, Any]
    ) -> "TrainerInterface":
        ...

    @classmethod
    def upgrade_checkpoint(cls, checkpoint: Dict[str, Any]) -> Dict[str, Any]:
        return checkpoint
