"""Prefetch loader, consistency checks, misc utils, writers."""

import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.collate import CollateFn
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.samplers import (
    BatchSampler,
    DataLoader,
    PrefetchingLoader,
)
from metatrain_tpu.ops.neighbors import compute_neighbor_data
from metatrain_tpu.utils.consistency import (
    ConsistencyError,
    check_batch_consistency,
)
from metatrain_tpu.utils.misc import (
    ArchitectureError,
    dtype_for_precision,
    get_gradient_units,
    to_external_name,
    to_internal_name,
)

from conftest import make_molecule


def _dataset(n=6):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(n):
        s = make_molecule(4, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy"}}
    )
    return Dataset(systems, targets), infos


def test_prefetching_loader_yields_same_batches():
    dataset, infos = _dataset()
    collate = CollateFn(cutoff=4.0, target_infos=infos)
    base = DataLoader(dataset, BatchSampler(len(dataset), 2, shuffle=False), collate)
    prefetched = PrefetchingLoader(
        DataLoader(dataset, BatchSampler(len(dataset), 2, shuffle=False), collate)
    )
    direct = [np.asarray(b.targets["energy"].block().values) for b in base]
    threaded = [np.asarray(b.targets["energy"].block().values) for b in prefetched]
    assert len(direct) == len(threaded) == 3
    for a, b in zip(direct, threaded):
        np.testing.assert_allclose(a, b)


def test_consistency_check_passes_and_catches_corruption():
    system = make_molecule(5, seed=1)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr])
    check_batch_consistency(batch, cutoff=4.0)  # no raise

    bad = batch.replace(
        positions=batch.positions.at[0, 0].set(jnp.nan)
    )
    with pytest.raises(ConsistencyError, match="non-finite"):
        check_batch_consistency(bad, cutoff=4.0)

    bad2 = batch.replace(
        nbr_indices=batch.nbr_indices.at[0, 0].set(10**6)
    )
    with pytest.raises(ConsistencyError):
        check_batch_consistency(bad2, cutoff=4.0)


def test_misc_utils():
    assert get_gradient_units("eV", "positions", "angstrom") == "eV/A"
    assert get_gradient_units("eV", "strain", "angstrom") == "eV"
    assert dtype_for_precision(16) == jnp.bfloat16
    with pytest.raises(ValueError):
        dtype_for_precision(8)
    assert to_external_name("energy") == "energy"
    assert to_external_name("dipole") == "mtt::dipole"
    assert to_internal_name("mtt::dipole") == "dipole"
    err = ArchitectureError(ValueError("boom"))
    assert "boom" in str(err)


def test_zip_prediction_writer_roundtrip(tmp_path):
    from metatrain_tpu.data.disk import DiskDataset
    from metatrain_tpu.data.writers import write_predictions
    from metatrain_tpu.models.composition import CompositionModel
    from metatrain_tpu.data.target_info import DatasetInfo

    dataset, infos = _dataset(4)
    ds_info = DatasetInfo("angstrom", [1, 6, 8], infos)
    model = CompositionModel({}, ds_info)
    model.fit([dataset])
    params = model.init_params(None)

    collate = CollateFn(cutoff=4.0, target_infos=infos)
    batch = collate([dataset[i] for i in range(4)])
    predictions = model.forward(params, batch.systems, ["energy"])

    path = str(tmp_path / "preds.zip")
    write_predictions(path, [(batch, predictions)], infos)
    back = DiskDataset(path)
    assert len(back) == 4
    first = back[0]
    predicted = float(np.asarray(first.targets["energy"].block().values)[0, 0])
    expected = model.predict_host(dataset[0].system)["energy"][0, 0]
    np.testing.assert_allclose(predicted, expected, rtol=1e-5)


def test_config_interpolation():
    """${...} interpolation (reference utils/omegaconf.py resolvers)."""
    import pytest

    from metatrain_tpu.utils.config import (
        MetatrainConfigError,
        resolve_interpolations,
    )

    opts = {
        "base_precision": 64,
        "seed": "${default_random_seed:}",
        "device": "${default_device:}",
        "architecture": {
            "model": {"precision": "${base_precision}"},
            "note": "runs at ${base_precision} bits",
        },
    }
    out = resolve_interpolations(opts)
    assert out["architecture"]["model"]["precision"] == 64  # keeps type
    assert out["architecture"]["note"] == "runs at 64 bits"
    assert out["seed"] == 0 and out["device"] == "auto"

    with pytest.raises(MetatrainConfigError, match="not found"):
        resolve_interpolations({"a": "${missing.key}"})
    with pytest.raises(MetatrainConfigError, match="circular"):
        resolve_interpolations({"a": "${b}", "b": "${a}"})
    with pytest.raises(MetatrainConfigError, match="unknown config resolver"):
        resolve_interpolations({"a": "${nope:}"})
