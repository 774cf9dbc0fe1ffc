"""Regenerate the frozen checkpoint corpus (run manually when a new
checkpoint version ships; reference pattern:
``soap_bpnn/tests/checkpoints/model-v9_trainer-v11.ckpt.gz``)."""

import gzip
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

from conftest import make_molecule
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.utils.architectures import import_architecture


CORPUS = Path(__file__).parent / "checkpoints"

MINIMAL_HYPERS = {
    "pet": {
        "cutoff": 4.0, "d_pet": 16, "d_head": 16, "d_node": 24,
        "d_feedforward": 16, "num_heads": 2, "num_attention_layers": 1,
        "num_gnn_layers": 1,
    },
    "soap_bpnn": {
        "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
        "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
    },
    "experimental.mace": {
        "cutoff": 4.0, "num_radial": 3, "max_ell": 1, "num_channels": 8,
        "num_interactions": 1, "mlp_width": 8,
    },
    "experimental.space": {
        "cutoff": 4.0, "num_radial": 3, "k_max_l": [8, 4, 4],
        "num_message_passing": 1, "mlp_width": 8,
    },
}


def make_dataset():
    rng = np.random.default_rng(0)
    systems = []
    for i in range(6):
        s = make_molecule(5, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        systems.append(s)
    targets, infos = read_targets(
        systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
    )
    types = sorted({int(t) for s in systems for t in s.types})
    return Dataset(systems, targets), DatasetInfo("angstrom", types, infos)


def _write(raw: Path) -> None:
    with open(raw, "rb") as f_in, gzip.open(str(raw) + ".gz", "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    raw.unlink()
    print("wrote", raw.name + ".gz")


def synthesize_space_v1(dataset, ds_info):
    """A checkpoint exactly as SPACE v1 wrote it: parameters from the
    parity-mixed coupling structure (``parity_strict=False``) and hypers
    WITHOUT the parity_strict key (v1 predates it). Exercises
    ``SPACE.upgrade_v1_v2``."""
    import pickle

    module = import_architecture("experimental.space")
    hypers = dict(MINIMAL_HYPERS["experimental.space"])
    hypers["parity_strict"] = False
    model = module.__model__(hypers, ds_info)
    trainer = module.__trainer__({"num_epochs": 1, "batch_size": 3})
    trainer.train(model, jnp.float32, [dataset], [dataset], "/tmp")
    raw = CORPUS / "experimental_space_model-v1_trainer-v1.ckpt"
    trainer.save_checkpoint(model, str(raw))
    with open(raw, "rb") as f:
        checkpoint = pickle.load(f)
    checkpoint["model_ckpt_version"] = 1
    checkpoint["hypers"] = {
        k: v for k, v in checkpoint["hypers"].items() if k != "parity_strict"
    }
    with open(raw, "wb") as f:
        pickle.dump(checkpoint, f, protocol=pickle.HIGHEST_PROTOCOL)
    _write(raw)


def main():
    CORPUS.mkdir(exist_ok=True)
    dataset, ds_info = make_dataset()
    for arch_name, hypers in MINIMAL_HYPERS.items():
        module = import_architecture(arch_name)
        model_v = module.__model__.__checkpoint_version__
        trainer_v = module.__trainer__.__checkpoint_version__
        safe = arch_name.replace(".", "_")
        raw = CORPUS / f"{safe}_model-v{model_v}_trainer-v{trainer_v}.ckpt"
        if Path(str(raw) + ".gz").exists():
            print("frozen, skipping", raw.name + ".gz")
            continue
        model = module.__model__(hypers, ds_info)
        trainer = module.__trainer__({"num_epochs": 1, "batch_size": 3})
        trainer.train(model, jnp.float32, [dataset], [dataset], "/tmp")
        trainer.save_checkpoint(model, str(raw))
        _write(raw)
    if not (CORPUS / "experimental_space_model-v1_trainer-v1.ckpt.gz").exists():
        synthesize_space_v1(dataset, ds_info)


if __name__ == "__main__":
    main()
