"""``mtt-tpu export``: checkpoint -> standalone exported model.

The reference exports TorchScript ``AtomisticModel`` files
(``cli/export.py``). The TPU-native exported artifact is a ``.mtt`` file:
the model checkpoint plus capability metadata in one envelope, loadable
without the training stack, served through
:class:`metatrain_tpu.calculator.Calculator` (the ASE-calculator
equivalent) whose force-call compiles once per size bucket.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

from ..utils.io import (
    load_checkpoint_file,
    model_from_checkpoint,
    save_checkpoint_file,
)
from ..utils.logging import ROOT_LOGGER


logger = logging.getLogger(ROOT_LOGGER + ".export")


def export_model_object(model, trainer=None, output_path: str = "model.mtt",
                        metadata: Optional[Dict[str, Any]] = None) -> None:
    """Export a live model (best weights if the trainer tracked them)."""
    checkpoint = model.get_checkpoint()
    if trainer is not None and getattr(trainer, "best_params", None) is not None:
        checkpoint["params"] = trainer.best_params
    envelope = {
        "exported": True,
        "format_version": 1,
        "checkpoint": checkpoint,
        "metadata": {
            **(getattr(type(model), "__default_metadata__", {}) or {}),
            **(metadata or {}),
        },
        "capabilities": {
            "outputs": sorted(model.supported_outputs().keys()),
            "atomic_types": list(model.atomic_types)
            if hasattr(model, "atomic_types")
            else [],
            "interaction_range": model.requested_neighbor_cutoff(),
            "length_unit": model.dataset_info.length_unit,
        },
    }
    save_checkpoint_file(envelope, output_path)


def export_model(
    checkpoint_path: str,
    output_path: str = "model.mtt",
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Export from a checkpoint file (applies version migrations)."""
    model = model_from_checkpoint(checkpoint_path, context="export")
    raw = load_checkpoint_file(checkpoint_path)
    if raw.get("best_params") is not None:
        import jax.numpy as jnp
        import jax

        model.params = jax.tree_util.tree_map(jnp.asarray, raw["best_params"])
    export_model_object(model, None, output_path, metadata)
    logger.info("Exported %s -> %s", checkpoint_path, output_path)


def load_exported_model(path: str):
    """Load an exported ``.mtt`` model (or a plain checkpoint)."""
    envelope = load_checkpoint_file(path)
    if envelope.get("exported"):
        return model_from_checkpoint(envelope["checkpoint"], context="export")
    return model_from_checkpoint(envelope, context="export")
