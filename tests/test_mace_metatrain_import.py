"""metatrain-format ``experimental.mace`` checkpoint import
(interop/mace_foundation.convert_mace_metatrain_checkpoint).

Validated against the reference's OWN committed checkpoint corpus
(``/root/reference/src/metatrain/experimental/mace/tests/checkpoints``):
the wrapped mace-torch tensors live under the ``mace_model.`` state-dict
prefix (reference ``experimental/mace/model.py:756-781``)."""

import glob
import gzip
import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

REF_DIR = "/root/reference/src/metatrain/experimental/mace/tests/checkpoints"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference corpus unavailable"
)


def _newest_ckpt(tmp_path):
    src = sorted(glob.glob(os.path.join(REF_DIR, "model-v*.ckpt.gz")))[-1]
    dst = tmp_path / "mace.ckpt"
    with gzip.open(src, "rb") as f, open(dst, "wb") as out:
        shutil.copyfileobj(f, out)
    return str(dst)


def test_convert_and_predict(tmp_path):
    from metatrain_tpu.interop.torch_ckpt import (
        convert_torch_checkpoint,
        load_torch_checkpoint,
    )
    from metatrain_tpu.utils.io import model_from_checkpoint

    path = _newest_ckpt(tmp_path)
    raw = load_torch_checkpoint(path)
    assert raw["architecture_name"] == "experimental.mace"

    out = convert_torch_checkpoint(path)
    assert out["architecture_name"] == "experimental.mace"
    assert "foundation_state" in out
    # the complete inner tensor inventory is preserved
    inner = {
        k[len("mace_model."):]
        for k in raw["model_state_dict"]
        if k.startswith("mace_model.")
    }
    assert inner <= (
        set(out["foundation_state"]) | {"r_max", "num_interactions",
                                        "atomic_numbers"}
        | {k for k in inner if ".output_mask" in k or k.endswith((".r_max",
           ".p", ".prefactor", "weights_max_zeroed"))}
    )

    model = model_from_checkpoint(out, context="finetune")

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data
    from conftest import make_molecule

    types = model.dataset_info.atomic_types
    system = make_molecule(5, seed=0, types=tuple(types))
    nbr = compute_neighbor_data(system, cutoff=model.hypers["cutoff"])
    batch = batch_from_systems([system], [nbr], dtype=jnp.float32)
    name = next(iter(model.dataset_info.targets))
    pred = model.forward_eval(model.params, batch, [name])[name].block(0)
    assert np.isfinite(np.asarray(pred.values)).all()


def test_extracted_baseline_matches_inner_tensors(tmp_path):
    """The fixed composition weights equal the inner
    ``atomic_energies_fn.atomic_energies`` (+scale_shift shift when
    present), per the reference extraction semantics
    (``experimental/mace/model.py:141-183``)."""
    from metatrain_tpu.interop.torch_ckpt import load_torch_checkpoint
    from metatrain_tpu.interop.mace_foundation import (
        convert_mace_metatrain_checkpoint,
    )

    path = _newest_ckpt(tmp_path)
    raw = load_torch_checkpoint(path)
    out = convert_mace_metatrain_checkpoint(raw)

    sd = raw["model_state_dict"]
    energies = np.asarray(
        sd["mace_model.atomic_energies_fn.atomic_energies"], np.float64
    ).reshape(-1)
    zs = np.asarray(sd["mace_model.atomic_numbers"]).reshape(-1)
    shift_key = "mace_model.scale_shift.shift"
    shift = (
        float(np.ravel(np.asarray(sd[shift_key]))[0])
        if shift_key in sd
        else 0.0
    )
    fixed = out.get("fixed_composition_weights", {})
    if not fixed:
        pytest.skip("checkpoint carries no atomic baselines")
    (per_z,) = fixed.values()
    for z, e in zip(zs, energies):
        np.testing.assert_allclose(per_z[int(z)], e + shift, rtol=1e-6)
