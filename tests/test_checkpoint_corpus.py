"""Frozen checkpoint corpus loads through the migration chain
(reference ``utils/testing/checkpoints.py:62-173``)."""

import gzip
import pickle
from pathlib import Path

import numpy as np
import pytest

from metatrain_tpu.utils.architectures import import_architecture
from metatrain_tpu.utils.io import model_from_checkpoint

CORPUS = Path(__file__).parent / "checkpoints"
CORPUS_FILES = sorted(CORPUS.glob("*.ckpt.gz")) if CORPUS.exists() else []


@pytest.mark.parametrize(
    "path", CORPUS_FILES, ids=[p.name for p in CORPUS_FILES]
)
def test_corpus_checkpoint_loads(path):
    with gzip.open(path, "rb") as f:
        checkpoint = pickle.load(f)
    model = model_from_checkpoint(checkpoint, context="export")
    assert model.params is not None
    # the model still evaluates
    from conftest import make_molecule
    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    system = make_molecule(5, seed=1)
    nbr = compute_neighbor_data(system, model.requested_neighbor_cutoff() or 5.0)
    batch = batch_from_systems([system], [nbr])
    out = model.forward(model.params, batch, ["energy"])
    assert np.isfinite(np.asarray(out["energy"].block(0).values)).all()


@pytest.mark.parametrize(
    "path", CORPUS_FILES, ids=[p.name for p in CORPUS_FILES]
)
def test_corpus_version_not_silently_changed(path):
    """If a checkpoint's structure changes, its version must be bumped and
    a migration added (reference ``checkpoints.py:173``)."""
    with gzip.open(path, "rb") as f:
        checkpoint = pickle.load(f)
    arch = import_architecture(checkpoint["architecture_name"])
    current = arch.__model__.__checkpoint_version__
    stored = checkpoint["model_ckpt_version"]
    assert stored <= current
    if stored == current:
        # same version -> the current code must load it without upgrades
        model = arch.__model__.load_checkpoint(checkpoint, context="export")
        assert model is not None


def test_corpus_exists():
    assert CORPUS_FILES, (
        "checkpoint corpus is empty: run tests/make_checkpoint_corpus.py "
        "after shipping a new checkpoint version"
    )


# -- structure regression (reference ``utils/testing/checkpoints.py:173``) ----


def _structure(obj, path=()):
    """Flatten a checkpoint into sorted ``path -> kind`` entries: nested
    dict keys recursed, arrays reduced to their shapes, leaves to type
    names. Captures exactly what must not change silently."""
    import numpy as np

    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            out.update(_structure(v, path + (str(k),)))
        return out
    if isinstance(obj, (list, tuple)):
        out = {}
        for i, v in enumerate(obj):
            out.update(_structure(v, path + (f"[{i}]",)))
        return out
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):
        return {path: f"array{tuple(np.asarray(obj).shape)}"}
    return {path: type(obj).__name__}


def _current_version_files():
    out = []
    for path in CORPUS_FILES:
        with gzip.open(path, "rb") as f:
            checkpoint = pickle.load(f)
        arch = import_architecture(checkpoint["architecture_name"])
        if checkpoint["model_ckpt_version"] == arch.__model__.__checkpoint_version__:
            out.append((path, checkpoint))
    return out


_CURRENT = _current_version_files()


@pytest.mark.parametrize(
    "path_ckpt", _CURRENT, ids=[p.name for p, _ in _CURRENT]
)
def test_checkpoint_structure_did_not_change(path_ckpt):
    """Reference ``utils/testing/checkpoints.py:173``: a freshly-written
    checkpoint at the CURRENT version must have the same structure (key
    tree + array shapes) as the frozen corpus file of that version. If
    this fails, the checkpoint format changed: bump
    ``__checkpoint_version__``, add a migration, and regenerate the
    corpus (``tests/make_checkpoint_corpus.py``)."""
    path, stored = path_ckpt
    arch = import_architecture(stored["architecture_name"])
    model = arch.__model__.load_checkpoint(stored, context="restart")
    fresh = model.get_checkpoint()

    # the corpus files are TRAINER-written (they add best_params/
    # best_epoch/optimizer sections on top of the model checkpoint);
    # compare the model-owned sections only, but require every fresh
    # section to exist in the stored file
    fresh_struct = _structure(fresh)
    stored_struct = {
        p: k
        for p, k in _structure(stored).items()
        if p and p[0] in {q[0] for q in fresh_struct}
    }
    missing = set(stored_struct) - set(fresh_struct)
    added = set(fresh_struct) - set(stored_struct)
    assert not missing and not added, (
        f"checkpoint structure changed without a version bump:\n"
        f"  removed: {sorted('/'.join(p) for p in missing)[:10]}\n"
        f"  added: {sorted('/'.join(p) for p in added)[:10]}"
    )
    diff_kind = {
        p: (stored_struct[p], fresh_struct[p])
        for p in stored_struct
        if stored_struct[p] != fresh_struct[p]
    }
    assert not diff_kind, f"checkpoint leaf kinds changed: {diff_kind}"


def test_every_architecture_has_current_corpus_entry():
    """The corpus must contain a checkpoint at the CURRENT version for
    every architecture it tracks (grown by make_checkpoint_corpus.py on
    every version bump)."""
    tracked = {}
    for path in CORPUS_FILES:
        with gzip.open(path, "rb") as f:
            checkpoint = pickle.load(f)
        name = checkpoint["architecture_name"]
        tracked[name] = max(
            tracked.get(name, 0), checkpoint["model_ckpt_version"]
        )
    for name, newest in tracked.items():
        arch = import_architecture(name)
        assert newest == arch.__model__.__checkpoint_version__, (
            f"{name}: corpus newest checkpoint is v{newest} but the "
            f"current version is v{arch.__model__.__checkpoint_version__}; "
            "run tests/make_checkpoint_corpus.py"
        )
