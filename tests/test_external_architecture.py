"""External architecture plugin path: the worked example from
``docs/adding-an-architecture.md`` is extracted verbatim, imported by
dotted module name (no registry edit), and trained end-to-end."""

import re
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.utils.architectures import (
    ARCHITECTURES,
    get_default_hypers,
    import_architecture,
)

from conftest import make_molecule

DOC = Path(__file__).parent.parent / "docs" / "adding-an-architecture.md"


@pytest.fixture()
def external_arch(tmp_path, monkeypatch):
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.DOTALL)
    arch_source = next(b for b in blocks if "class MyModel" in b)
    pkg = tmp_path / "my_pkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "my_arch.py").write_text(arch_source)
    monkeypatch.syspath_prepend(str(tmp_path))
    for mod in ("my_pkg", "my_pkg.my_arch"):
        sys.modules.pop(mod, None)
    yield "my_pkg.my_arch"
    ARCHITECTURES.pop("my_pkg.my_arch", None)
    for mod in ("my_pkg", "my_pkg.my_arch"):
        sys.modules.pop(mod, None)


def test_external_architecture_trains(external_arch, tmp_path):
    module = import_architecture(external_arch)
    defaults = get_default_hypers(external_arch)
    assert defaults["model"]["cutoff"] == 4.0

    rng = np.random.default_rng(0)
    systems = []
    for i in range(8):
        s = make_molecule(5 + i % 2, seed=i)
        s.extra["energy"] = np.asarray(rng.normal())
        s.extra["forces"] = rng.normal(size=(len(s), 3))
        systems.append(s)
    targets, infos = read_targets(
        systems,
        {
            "energy": {
                "quantity": "energy",
                "key": "energy",
                "unit": "eV",
                "forces": {"key": "forces"},
            }
        },
    )
    types = sorted({int(t) for s in systems for t in s.types})
    dataset = Dataset(systems, targets)
    ds_info = DatasetInfo("angstrom", types, infos)

    model = module.__model__({"width": 8}, ds_info)
    trainer = module.__trainer__({"num_epochs": 2, "batch_size": 4})
    trainer.train(
        model, jax.numpy.float32, [dataset], [dataset], str(tmp_path)
    )

    # forces flow through the shared autograd engine
    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.engine.evaluate import evaluate_model
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    s = systems[0]
    nbr = compute_neighbor_data(s, cutoff=4.0)
    batch = batch_from_systems([s], [nbr])
    preds = evaluate_model(
        model.forward, model.params, batch, infos, is_training=False
    )
    forces = np.asarray(
        preds["energy"].block(0).gradient("positions").values
    )
    assert np.isfinite(forces).all()
    assert np.abs(forces).sum() > 0


def test_unknown_architecture_still_suggests(external_arch):
    with pytest.raises(ValueError, match="not known"):
        import_architecture("definitely.not.a.module")
    with pytest.raises(ValueError, match="Did you mean 'pet'"):
        import_architecture("pett")
