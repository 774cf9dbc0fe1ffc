"""torch metatrain -> JAX PET checkpoint conversion.

Ground truth: the reference's own frozen PET checkpoint corpus
(``/root/reference/src/metatrain/pet/tests/checkpoints``). These are
real torch-metatrain-written files; conversion must map EVERY flax
param, recover composition/scaler baselines from their .mts buffers,
and yield a model whose eval-path energies are dominated by the
converted composition (the NN residual is scaled by the tiny fitted
scale).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_CKPT = (
    "/root/reference/src/metatrain/pet/tests/checkpoints/"
    "model-v16_trainer-v14.ckpt.gz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CKPT), reason="reference checkpoints unavailable"
)


@pytest.fixture(scope="module")
def converted():
    from metatrain_tpu.interop import convert_torch_checkpoint

    return convert_torch_checkpoint(REF_CKPT)


def test_structure(converted):
    assert converted["architecture_name"] == "pet"
    assert converted["hypers"]["cutoff"] == 4.5
    di = converted["dataset_info"]
    assert di["atomic_types"] == [1, 6, 7, 8]
    assert "energy" in di["targets"]


def test_composition_weights(converted):
    w = np.asarray(converted["composition"]["weights"]["energy"]).ravel()
    # H/C/N/O isolated-atom energies from the reference fit (qm9 subset)
    np.testing.assert_allclose(
        w, [-0.60325881, -38.07328602, -54.75260223, -75.22216878], rtol=1e-6
    )


def test_scaler_scales(converted):
    s = converted["scaler"]["scales"]["energy"]
    assert len(s) == 1
    np.testing.assert_allclose(np.asarray(s[0]).ravel(), [0.0028345], rtol=1e-4)


def test_converted_model_runs_and_composition_dominates(converted):
    from metatrain_tpu.containers import (
        System,
        batch_from_systems,
        bucket_neighbors,
    )
    from metatrain_tpu.data.target_info import get_energy_target_info
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.ops.neighbors import compute_neighbor_data
    from metatrain_tpu.utils.io import model_from_checkpoint

    model = model_from_checkpoint(converted, context="export")
    rng = np.random.default_rng(0)
    system = System(
        positions=rng.uniform(0, 4, (6, 3)),
        types=np.array([1, 6, 7, 8, 1, 6], np.int32),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, bool),
    )
    nbr = compute_neighbor_data(system, cutoff=model.cutoff)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=8,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.5),
    )
    info = get_energy_target_info("eV", add_position_gradients=True)
    preds = evaluate_model(
        model.forward_eval,
        model.params,
        batch,
        {"energy": info},
        is_training=False,
    )
    block = preds["energy"].block()
    energy = float(np.asarray(block.values).ravel()[0])
    forces = np.asarray(block.gradient("positions").values)
    assert np.isfinite(forces).all()
    w = dict(
        zip([1, 6, 7, 8], np.asarray(
            converted["composition"]["weights"]["energy"]
        ).ravel())
    )
    comp = sum(w[int(z)] for z in system.types)
    # NN residual is scaled by the fitted RMS scale (~2.8e-3)
    assert abs(energy - comp) < 1.0
    assert energy != comp  # the NN contributes


def test_rejects_old_versions(tmp_path):
    from metatrain_tpu.interop import convert_torch_checkpoint

    with pytest.raises(ValueError, match="version"):
        convert_torch_checkpoint(
            {"architecture_name": "pet", "model_ckpt_version": 8}
        )


def test_rejects_other_architectures():
    from metatrain_tpu.interop import convert_torch_checkpoint

    # soap_bpnn now has its own converter (r4); unknown archs still
    # refuse with a clear error
    with pytest.raises(ValueError, match="PET"):
        convert_torch_checkpoint(
            {"architecture_name": "gap", "model_ckpt_version": 1}
        )
    with pytest.raises(ValueError, match="model_data"):
        convert_torch_checkpoint(
            {"architecture_name": "soap_bpnn", "model_ckpt_version": 1}
        )


def test_cli_import_torch(tmp_path, monkeypatch):
    from metatrain_tpu.__main__ import main
    from metatrain_tpu.utils.io import load_checkpoint_file

    out = str(tmp_path / "converted.ckpt")
    monkeypatch.chdir(tmp_path)
    assert main(["import-torch", REF_CKPT, "-o", out]) == 0
    ckpt = load_checkpoint_file(out)
    assert ckpt["architecture_name"] == "pet"
