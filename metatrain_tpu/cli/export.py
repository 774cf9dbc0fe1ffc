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


def _raw_force_call(model, energy_name: str):
    """Force call over raw padded arrays: the jax.export-able entry point
    (no custom pytrees in the signature)."""
    import jax.numpy as jnp

    from ..containers import SystemBatch
    from ..engine.evaluate import evaluate_model

    info = model.dataset_info.targets[energy_name]

    def fn(
        positions,
        types,
        atom_mask,
        cell,
        pbc,
        nbr_indices,
        nbr_shifts,
        nbr_mask,
        nbr_reverse,
    ):
        A = positions.shape[0]
        batch = SystemBatch(
            positions=positions,
            types=types,
            atom_mask=atom_mask,
            system_index=jnp.where(atom_mask, 0, 1).astype(jnp.int32),
            cells=jnp.stack([cell, jnp.eye(3, dtype=cell.dtype)]),
            pbc=jnp.stack([pbc, jnp.zeros(3, dtype=bool)]),
            system_mask=jnp.asarray([True, False]),
            nbr_indices=nbr_indices,
            nbr_shifts=nbr_shifts,
            nbr_mask=nbr_mask,
            nbr_reverse=nbr_reverse,
        )
        preds = evaluate_model(
            model.forward,
            model.params,
            batch,
            {energy_name: info},
            is_training=False,
        )
        block = preds[energy_name].block()
        energy = jnp.sum(block.values[:1])
        forces = -block.gradient("positions").values[:, :, 0]
        return energy, forces

    return fn


def serialize_force_call(model, buckets) -> Dict[str, bytes]:
    """StableHLO-serialize the bucketed force call via ``jax.export``
    (the standalone-artifact counterpart of the reference's TorchScript
    export, SURVEY.md section 7.1 item 9). Each (n_atoms_padded,
    max_neighbors) bucket becomes one compiled program callable WITHOUT
    this package (just jax + jax.export.deserialize).

    Serialized for the currently active backend platform.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    energy_name = next(
        name
        for name, info in model.dataset_info.targets.items()
        if info.quantity == "energy" or info.is_scalar
    )
    fn = jax.jit(_raw_force_call(model, energy_name))
    dtype = jnp.float32
    compiled: Dict[str, bytes] = {}
    for A, M in buckets:
        args = (
            jax.ShapeDtypeStruct((A, 3), dtype),  # positions
            jax.ShapeDtypeStruct((A,), jnp.int32),  # types
            jax.ShapeDtypeStruct((A,), jnp.bool_),  # atom_mask
            jax.ShapeDtypeStruct((3, 3), dtype),  # cell
            jax.ShapeDtypeStruct((3,), jnp.bool_),  # pbc
            jax.ShapeDtypeStruct((A, M), jnp.int32),  # nbr_indices
            jax.ShapeDtypeStruct((A, M, 3), jnp.int32),  # nbr_shifts
            jax.ShapeDtypeStruct((A, M), jnp.bool_),  # nbr_mask
            jax.ShapeDtypeStruct((A, M), jnp.int32),  # nbr_reverse
        )
        exported = jax_export.export(fn)(*args)
        compiled[f"{A}x{M}"] = exported.serialize()
    return compiled


def load_compiled_force_call(path: str):
    """Load the compiled force-call programs from an exported ``.mtt``:
    returns ``{bucket: callable}``. Needs only jax (no model code)."""
    from jax import export as jax_export

    envelope = load_checkpoint_file(path)
    compiled = envelope.get("compiled_force_call") or {}
    return {
        bucket: jax_export.deserialize(blob).call
        for bucket, blob in compiled.items()
    }


def export_model_object(model, trainer=None, output_path: str = "model.mtt",
                        metadata: Optional[Dict[str, Any]] = None,
                        compile_buckets=None) -> None:
    """Export a live model (best weights if the trainer tracked them).

    :param compile_buckets: optional list of (n_atoms_padded,
        max_neighbors) bucket shapes; each is jax.export-serialized into
        the envelope as a standalone compiled force call.
    """
    checkpoint = model.get_checkpoint()
    if trainer is not None and getattr(trainer, "best_params", None) is not None:
        checkpoint["params"] = trainer.best_params
    compiled = {}
    if compile_buckets:
        try:
            compiled = serialize_force_call(model, compile_buckets)
        except Exception as err:  # pragma: no cover - platform dependent
            logger.warning("compiled force-call export skipped: %s", err)
    envelope = {
        "exported": True,
        "format_version": 1,
        "checkpoint": checkpoint,
        "compiled_force_call": compiled,
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
    revision: Optional[str] = None,
    hf_token: Optional[str] = None,
) -> None:
    """Export from a checkpoint file, URL, or HF-Hub reference (applies
    version migrations; reference ``cli/export.py:159-224``)."""
    from ..utils.autotune import apply_tuned_config
    from ..utils.io import resolve_model_path

    apply_tuned_config()
    checkpoint_path = resolve_model_path(
        checkpoint_path, revision=revision, token=hf_token
    )
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
