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
