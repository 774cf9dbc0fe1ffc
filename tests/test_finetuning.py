"""Finetuning strategies: full / heads / LoRA."""

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.engine.finetuning import (
    apply_lora,
    init_lora_params,
    trainable_mask,
)
from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

from conftest import make_molecule


HYPERS = {
    "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
    "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
}


def _dataset(n=8):
    rng = np.random.default_rng(0)
    systems = []
    for i in range(n):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    types = sorted({int(t) for s in systems for t in s.types})
    return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)


def test_heads_mask_selects_head_params():
    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))
    mask = trainable_mask(params, "heads")
    leaves_mask = jax.tree_util.tree_leaves(mask)
    assert any(leaves_mask) and not all(leaves_mask)


def test_heads_finetune_freezes_backbone(tmp_path):
    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    model.init_params(jax.random.PRNGKey(0))
    before = jax.device_get(model.params)

    trainer = SoapBpnnTrainer(
        {
            "num_epochs": 2,
            "batch_size": 4,
            "learning_rate": 1e-2,
            "finetune": {"read_from": None, "method": "heads", "config": {}},
            "o3_augmentation": False,
        }
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    after = model.params
    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(after)[0]
    changed_backbone, changed_head = False, False
    for (path_b, leaf_b), (path_a, leaf_a) in zip(flat_before, flat_after):
        path_str = "/".join(
            str(getattr(p, "key", p)) for p in path_b
        ).lower()
        moved = not np.allclose(np.asarray(leaf_b), np.asarray(leaf_a))
        if any(m in path_str for m in ("head", "last", "logits", "readout")):
            changed_head |= moved
        else:
            changed_backbone |= moved
    assert changed_head
    assert not changed_backbone


def test_lora_adapters_shape_and_merge():
    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))
    adapters = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(1))
    assert adapters  # at least one 2-D kernel found
    for ab in adapters.values():
        assert ab["A"].shape[1] == 2 and ab["B"].shape[0] == 2
        np.testing.assert_allclose(np.asarray(ab["B"]), 0.0)

    # B zero-init -> merge is identity
    merged = apply_lora(params, adapters, alpha=4.0, rank=2)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lora_training_runs(tmp_path):
    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    model.init_params(jax.random.PRNGKey(0))
    base = jax.device_get(model.params)

    trainer = SoapBpnnTrainer(
        {
            "num_epochs": 2,
            "batch_size": 4,
            "learning_rate": 1e-2,
            "finetune": {
                "read_from": None,
                "method": "lora",
                "config": {"rank": 2, "alpha": 4},
            },
            "o3_augmentation": False,
        }
    )
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    # merged weights differ from base only on 2-D kernels (low-rank update)
    changed = 0
    for (path, before), after in zip(
        jax.tree_util.tree_flatten_with_path(base)[0],
        jax.tree_util.tree_leaves(model.params),
    ):
        if not np.allclose(np.asarray(before), np.asarray(after), atol=1e-8):
            changed += 1
            diff = np.asarray(after) - np.asarray(before)
            if diff.ndim == 2:
                rank = np.linalg.matrix_rank(diff, tol=1e-5)
                assert rank <= 2
    assert changed > 0


def test_inherit_heads_copies_source_head_weights():
    """inherit_heads seeds a new target's head/last layers from an
    existing target's (reference pet/modules/finetuning.py:57-61)."""
    from metatrain_tpu.data.target_info import get_energy_target_info
    from metatrain_tpu.engine.finetuning import inherit_heads
    from metatrain_tpu.models.pet import PET

    systems = [make_molecule(5, seed=i) for i in range(2)]
    types = sorted({int(t) for s in systems for t in s.types})
    ds_info = DatasetInfo(
        "angstrom",
        types,
        {
            "energy": get_energy_target_info("eV"),
            "mtt::u0": get_energy_target_info("eV"),
        },
    )
    hypers = {
        "cutoff": 4.0,
        "d_pet": 16,
        "d_head": 16,
        "d_node": 16,
        "d_feedforward": 16,
        "num_heads": 2,
        "num_attention_layers": 1,
        "num_gnn_layers": 1,
    }
    model = PET(hypers, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))

    new_params = inherit_heads(params, {"mtt::u0": "energy"})

    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_params)[0]
    n_copied = n_head_dst = 0
    by_path_new = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in flat_new
    }
    for path, old_leaf in flat_old:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        new_leaf = by_path_new[key]
        if "mtt__u0" in key:
            n_head_dst += 1
            src_key = key.replace("mtt__u0", "energy")
            if src_key in by_path_new:
                np.testing.assert_array_equal(
                    np.asarray(new_leaf), np.asarray(by_path_new[src_key])
                )
                n_copied += 1
        else:
            np.testing.assert_array_equal(
                np.asarray(new_leaf), np.asarray(old_leaf)
            )
    assert n_head_dst > 0 and n_copied == n_head_dst


def test_restart_with_new_target_initializes_fresh_heads():
    """Finetuning onto a dataset with a NEW target: restart() must give
    the merged model fresh head parameters for the new target while
    keeping every trained leaf (the bug surfaced by
    examples/finetune_pretrained.py: params were copied verbatim, so the
    new head had no parameters at all)."""
    from metatrain_tpu.data.target_info import get_energy_target_info

    _, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))

    new_info = DatasetInfo(
        "angstrom",
        ds_info.atomic_types,
        {"mtt::energy2": get_energy_target_info("eV")},
    )
    merged_model = model.restart(new_info)
    assert set(merged_model.output_shapes) == {"energy", "mtt::energy2"}

    # trained leaves preserved
    old_flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    new_flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            merged_model.params
        )[0]
    }
    n_preserved = 0
    for key, leaf in old_flat.items():
        assert key in new_flat, f"trained leaf {key} dropped"
        np.testing.assert_array_equal(
            np.asarray(new_flat[key]), np.asarray(leaf)
        )
        n_preserved += 1
    assert n_preserved > 0
    # and the new target's head exists and evaluates
    new_heads = [k for k in new_flat if "energy2" in k]
    assert new_heads, "no fresh parameters for the new target"

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    s = make_molecule(5, seed=99)
    nbr = compute_neighbor_data(s, cutoff=4.0)
    batch = batch_from_systems([s], [nbr])
    out = merged_model.forward(
        merged_model.params, batch, ["energy", "mtt::energy2"]
    )
    assert np.isfinite(np.asarray(out["mtt::energy2"].block(0).values)).all()


def test_lora_checkpoint_roundtrip_preserves_adapters(tmp_path):
    """Interval checkpoints during LoRA finetuning store MERGED weights
    plus the raw adapters; loading gives the finetuned behavior and a
    resumable trainer (review finding: adapters were lost)."""
    import numpy as np

    from metatrain_tpu.utils.io import (
        model_from_checkpoint,
        trainer_from_checkpoint,
    )

    dataset, ds_info = _dataset()
    model = SoapBpnn(HYPERS, ds_info)
    hypers = {
        "num_epochs": 2,
        "batch_size": 4,
        "checkpoint_interval": 1,
        "o3_augmentation": False,
        "data_parallel": False,
        "learning_rate": 1e-2,
        "finetune": {"read_from": None, "method": "lora",
                     "config": {"rank": 2}},
    }
    trainer = SoapBpnnTrainer(dict(hypers))
    trainer.train(model, jnp.float32, [dataset], [dataset], str(tmp_path))

    ckpt = tmp_path / "model_1.ckpt"
    assert ckpt.exists()
    from metatrain_tpu.utils.io import load_checkpoint_file

    raw = load_checkpoint_file(str(ckpt))
    assert raw.get("lora_adapters"), "adapters missing from the snapshot"

    # the snapshot's merged weights differ from a fresh base (training
    # moved the adapters), and resuming restores the adapters
    resumed_trainer = trainer_from_checkpoint(
        str(ckpt), dict(hypers), context="restart"
    )
    assert resumed_trainer.lora_adapters is not None
    resumed_model = model_from_checkpoint(str(ckpt), context="restart")
    resumed_trainer.train(
        resumed_model, jnp.float32, [dataset], [dataset], str(tmp_path / "b")
    )
    # uninterrupted-vs-resumed parity on the final parameters
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(resumed_model.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
