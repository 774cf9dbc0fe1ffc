"""Export contract: StableHLO-compiled force call + URL model loading.

Reference parity: TorchScript export (``cli/export.py``) produces a
standalone artifact usable without the training stack; HF-Hub/URL
download (``cli/export.py:203-211``, ``utils/io.py:135-188``).
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.cli.export import (
    export_model_object,
    load_compiled_force_call,
)
from metatrain_tpu.containers import batch_from_systems
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.models.pet import PET
from metatrain_tpu.ops.neighbors import compute_neighbor_data
from metatrain_tpu.utils.io import load_model, resolve_model_path

from conftest import make_molecule

HYPERS = {
    "cutoff": 4.0, "d_pet": 16, "d_head": 16, "d_node": 24,
    "d_feedforward": 16, "num_heads": 2, "num_attention_layers": 1,
    "num_gnn_layers": 1,
}


def _model():
    ds_info = DatasetInfo(
        "angstrom",
        [1, 6, 8],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    model = PET(HYPERS, ds_info)
    model.init_params(jax.random.PRNGKey(0))
    return model, ds_info


def test_compiled_force_call_roundtrip(tmp_path):
    """The serialized StableHLO program reproduces the live model's
    energy/forces, loaded through jax.export only."""
    model, ds_info = _model()
    A, M = 16, 15
    path = tmp_path / "model.mtt"
    export_model_object(model, None, str(path), compile_buckets=[(A, M)])

    programs = load_compiled_force_call(str(path))
    assert f"{A}x{M}" in programs

    system = make_molecule(7, seed=3)
    nbr = compute_neighbor_data(system, 4.0)
    batch = batch_from_systems(
        [system], [nbr], n_atoms_padded=A, n_systems_padded=2, max_neighbors=M
    )
    energy, forces = programs[f"{A}x{M}"](
        batch.positions.astype(jnp.float32),
        batch.types,
        batch.atom_mask,
        batch.cells[0].astype(jnp.float32),
        batch.pbc[0],
        batch.nbr_indices,
        batch.nbr_shifts,
        batch.nbr_mask,
        batch.nbr_reverse,
    )

    preds = evaluate_model(
        model.forward, model.params, batch, dict(ds_info.targets),
        is_training=False,
    )
    block = preds["energy"].block()
    ref_energy = float(np.asarray(block.values)[0, 0])
    ref_forces = -np.asarray(block.gradient("positions").values)[:, :, 0]
    np.testing.assert_allclose(float(energy), ref_energy, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(forces), ref_forces, rtol=1e-4, atol=1e-6
    )


def test_compiled_force_call_fresh_process(tmp_path):
    """The artifact serves forces in a fresh process WITHOUT importing any
    model code (jax + the envelope file only)."""
    model, _ = _model()
    A, M = 16, 15
    path = tmp_path / "model.mtt"
    export_model_object(model, None, str(path), compile_buckets=[(A, M)])

    code = f"""
import pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

with open({str(path)!r}, "rb") as f:
    envelope = pickle.load(f)
call = jax_export.deserialize(envelope["compiled_force_call"]["{A}x{M}"]).call
A, M = {A}, {M}
rng = np.random.default_rng(0)
positions = jnp.asarray(rng.uniform(-2, 2, (A, 3)), jnp.float32)
types = jnp.asarray(rng.choice([1, 6, 8], A), jnp.int32)
mask = jnp.ones(A, bool)
idx = jnp.tile(jnp.arange(A, dtype=jnp.int32)[:, None], (1, M))
energy, forces = call(
    positions, types, mask,
    jnp.zeros((3, 3), jnp.float32), jnp.zeros(3, bool),
    idx, jnp.zeros((A, M, 3), jnp.int32),
    jnp.zeros((A, M), bool),
    (jnp.arange(A, dtype=jnp.int32)[:, None] * M
     + jnp.arange(M, dtype=jnp.int32)[None, :]),
)
assert np.isfinite(float(energy))
assert np.isfinite(np.asarray(forces)).all()
print("SERVED-OK")
"""
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert "SERVED-OK" in result.stdout, result.stderr[-2000:]


def test_load_model_from_file_url(tmp_path):
    model, _ = _model()
    path = tmp_path / "model.mtt"
    export_model_object(model, None, str(path))
    loaded = load_model(f"file://{path}")
    assert loaded.params is not None


def test_resolve_hf_reference_builds_url(monkeypatch, tmp_path):
    """hf://org/repo/file resolves to the huggingface URL and downloads
    through urllib into the cache."""
    captured = {}

    class FakeResponse:
        def read(self):
            return b"payload"

        def __enter__(self):
            return self

        def __exit__(self, *args):
            return False

    def fake_urlopen(request):
        captured["url"] = request.full_url
        captured["auth"] = request.get_header("Authorization")
        return FakeResponse()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setenv("MTT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("HF_TOKEN", "tok123")
    local = resolve_model_path("hf://some-org/some-repo/model.mtt")
    assert captured["url"] == (
        "https://huggingface.co/some-org/some-repo/resolve/main/model.mtt"
    )
    assert captured["auth"] == "Bearer tok123"
    assert Path(local).read_bytes() == b"payload"

    # explicit revision + token override (CLI -r/--revision, --token)
    resolve_model_path(
        "hf://some-org/some-repo/other.mtt", revision="v2", token="tok456"
    )
    assert captured["url"] == (
        "https://huggingface.co/some-org/some-repo/resolve/v2/other.mtt"
    )
    assert captured["auth"] == "Bearer tok456"
