"""Finetuning example: pretrain PET on one toy dataset, then LoRA-finetune
it on a shifted target with the heads seeded via ``inherit_heads``.

Run from the repository root:

    python examples/finetune_pretrained.py

(Workflow documented in ``docs/finetuning.md``; reference counterpart:
``pet/modules/finetuning.py`` + the ``finetune`` load context.)
"""

import os
import tempfile

import numpy as np


def make_dataset(n_systems, seed, scale=1.0, shift=0.0):
    from metatrain_tpu.containers import System

    rng = np.random.default_rng(seed)
    systems = []
    for i in range(n_systems):
        n = 5 + i % 3
        s = System(
            positions=rng.uniform(-3, 3, size=(n, 3)),
            types=rng.choice([1, 6, 8], size=n),
            cell=np.zeros((3, 3)),
            pbc=np.zeros(3, dtype=bool),
        )
        # toy target: scaled/shifted pair-count energy
        d = np.linalg.norm(
            s.positions[:, None] - s.positions[None, :], axis=-1
        )
        e = float(np.sum((d < 2.5) & (d > 0)) * 0.1)
        s.extra["energy"] = np.asarray(scale * e + shift * n)
        systems.append(s)
    return systems


def main():
    import yaml

    from metatrain_tpu.__main__ import main as mtt_main
    from metatrain_tpu.data.readers.extxyz import write_xyz

    workdir = tempfile.mkdtemp(prefix="mtt_finetune_")
    os.chdir(workdir)
    print(f"working in {workdir}")

    model_hypers = {
        "cutoff": 4.0,
        "d_pet": 32,
        "d_head": 32,
        "d_node": 48,
        "d_feedforward": 32,
        "num_heads": 4,
        "num_attention_layers": 1,
        "num_gnn_layers": 1,
    }

    # ---- 1. pretrain on the "foundation" dataset -------------------------
    pre = make_dataset(24, seed=0)
    write_xyz(
        "pretrain.xyz", pre, info=[{"energy": float(s.extra["energy"])} for s in pre]
    )
    options = {
        "seed": 0,
        "architecture": {
            "name": "pet",
            "model": model_hypers,
            "training": {"num_epochs": 4, "batch_size": 8},
        },
        "training_set": {
            "systems": {"read_from": "pretrain.xyz", "length_unit": "angstrom"},
            "targets": {"energy": {"key": "energy", "unit": "eV"}},
        },
        "validation_set": 0.2,
        "test_set": 0.0,
    }
    yaml.safe_dump(options, open("pretrain_options.yaml", "w"))
    assert mtt_main(["train", "pretrain_options.yaml"]) == 0
    import glob

    pretrained = sorted(glob.glob("outputs/*/*/model.ckpt"))[-1]
    print(f"pretrained checkpoint: {pretrained}")

    # ---- 2. LoRA-finetune on a shifted surface, new target name ----------
    fine = make_dataset(16, seed=1, scale=1.3, shift=0.05)
    write_xyz(
        "finetune.xyz", fine, info=[{"energy2": float(s.extra["energy"])} for s in fine]
    )
    options = {
        "seed": 0,
        "architecture": {
            "name": "pet",
            "model": model_hypers,
            "training": {
                "num_epochs": 4,
                "batch_size": 8,
                "finetune": {
                    "read_from": pretrained,
                    "method": "lora",
                    "config": {"rank": 4},
                    # seed the new target's head from the pretrained energy head
                    "inherit_heads": {"mtt::energy2": "energy"},
                },
            },
        },
        "training_set": {
            "systems": {"read_from": "finetune.xyz", "length_unit": "angstrom"},
            "targets": {
                "mtt::energy2": {
                    "quantity": "energy", "key": "energy2", "unit": "eV"
                }
            },
        },
        "validation_set": 0.25,
        "test_set": 0.0,
    }
    yaml.safe_dump(options, open("finetune_options.yaml", "w"))
    assert mtt_main(["train", "finetune_options.yaml", "-o", "finetuned.mtt"]) == 0

    # ---- 3. the finetuned export serves the new target -------------------
    from metatrain_tpu.calculator import Calculator

    calc = Calculator("finetuned.mtt", target="mtt::energy2")
    out = calc.compute(fine[0], forces=True)
    print(f"finetuned mtt::energy2 prediction: {float(out['energy']):.4f}")
    print(f"target:                            {float(fine[0].extra['energy']):.4f}")
    print("done")


if __name__ == "__main__":
    main()
