"""SOAP-BPNN torch-checkpoint importer (interop/soap_bpnn_import.py).

Validated against the reference's OWN committed checkpoint corpus
(``/root/reference/src/metatrain/soap_bpnn/tests/checkpoints``): the
descriptor's radial basis is evaluated from the spline the checkpoint
itself ships (exact spex radial, no spex install), the NN weights map
name-by-name, and the composition baselines parse from the serialized
TensorMap buffer with the native .mts reader.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.ops.neighbors import compute_neighbor_data

REF_CKPTS = Path(
    "/root/reference/src/metatrain/soap_bpnn/tests/checkpoints"
)

pytestmark = pytest.mark.skipif(
    not REF_CKPTS.exists(), reason="reference corpus not mounted"
)


@pytest.fixture(scope="module")
def converted():
    from metatrain_tpu.interop.torch_ckpt import convert_torch_checkpoint

    return convert_torch_checkpoint(
        str(REF_CKPTS / "model-v9_trainer-v11.ckpt.gz")
    )


def test_conversion_structure(converted):
    assert converted["architecture_name"] == "soap_bpnn"
    sc = converted["hypers"]["spex_compat"]
    assert sc["n_per_l"] == [2, 1]
    assert len(sc["spline_values"]) == 66
    # everything but the redundant scaler encodings is consumed
    assert all(
        "scaler" in k for k in converted["unmapped_tensors"]
    ), converted["unmapped_tensors"]
    # composition baselines parsed from the .mts buffer
    w = np.ravel(converted["composition"]["weights"]["energy"])
    assert np.any(w != 0.0)


def _loaded_model(converted, tmp_path):
    from metatrain_tpu.utils.io import (
        model_from_checkpoint,
        save_checkpoint_file,
    )

    path = str(tmp_path / "conv.ckpt")
    save_checkpoint_file(converted, path)
    return model_from_checkpoint(path, context="export")


def test_loaded_model_evaluates_and_is_invariant(converted, tmp_path):
    model = _loaded_model(converted, tmp_path)
    rng = np.random.default_rng(0)
    types = rng.choice(model.atomic_types, 6).astype(np.int32)
    positions = rng.uniform(0, 4.0, (6, 3))

    def energy(pos):
        s = System(
            positions=pos,
            types=types,
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, bool),
        )
        nbr = compute_neighbor_data(
            s, cutoff=model.requested_neighbor_cutoff()
        )
        batch = batch_from_systems([s], [nbr], dtype=jnp.float32)
        name = next(iter(model.supported_outputs()))
        out = model.forward_eval(model.params, batch, [name], None)
        return float(np.asarray(out[name].block(0).values)[0, 0])

    e0 = energy(positions)
    assert np.isfinite(e0) and abs(e0) > 1e-6
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    e_rot = energy(positions @ q.T + 0.37)
    np.testing.assert_allclose(e_rot, e0, rtol=1e-4)


def test_spline_matches_checkpoint_knots(converted):
    """The native Hermite evaluation reproduces the checkpoint's radial
    functions exactly at the knots and smoothly between them."""
    from metatrain_tpu.ops.radial import hermite_spline_basis

    sc = converted["hypers"]["spex_compat"]
    v = np.asarray(sc["spline_values"])
    d = np.asarray(sc["spline_derivatives"])
    h = sc["spline_spacing"]
    r_knots = np.arange(len(v)) * h
    out = np.asarray(
        hermite_spline_basis(jnp.asarray(r_knots), jnp.asarray(v),
                             jnp.asarray(d), h)
    )
    np.testing.assert_allclose(out, v, atol=1e-6)
    # midpoints stay finite and bounded by neighbor values' scale
    mid = np.asarray(
        hermite_spline_basis(
            jnp.asarray(r_knots[:-1] + h / 2), jnp.asarray(v),
            jnp.asarray(d), h,
        )
    )
    assert np.isfinite(mid).all()


def test_older_version_rejected_cleanly():
    """Old checkpoint layouts either convert or raise a clear error --
    never silently produce a half-mapped model."""
    from metatrain_tpu.interop.torch_ckpt import convert_torch_checkpoint

    path = REF_CKPTS / "model-v1_trainer-v1.ckpt.gz"
    try:
        out = convert_torch_checkpoint(str(path))
    except (ValueError, KeyError, NotImplementedError):
        return  # clear refusal is acceptable for ancient layouts
    assert out["architecture_name"] == "soap_bpnn"
