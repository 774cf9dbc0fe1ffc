"""Checkpoint save/load with versioned migrations.

Counterpart of the reference ``utils/io.py``: a checkpoint is one file
holding a dict with ``architecture_name``, ``model_ckpt_version``,
``trainer_ckpt_version``, hypers, ``dataset_info``, the parameter pytree
(as numpy) and trainer state. Loading an older checkpoint walks the
architecture's stepwise ``upgrade_checkpoint`` chain; too-new checkpoints
are refused (reference ``utils/io.py:190-258``).

Format: pickle of a pure (dict/list/str/number/numpy) tree -- every jax
array is converted to numpy on save, so checkpoints are device-independent.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree):
    def convert(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return jax.tree_util.tree_map(convert, tree)


def save_checkpoint_file(checkpoint: Dict[str, Any], path: str) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(checkpoint), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def _upgrade_chain(cls, checkpoint: Dict[str, Any], version_key: str) -> Dict[str, Any]:
    current = int(checkpoint.get(version_key, 1))
    target = int(cls.__checkpoint_version__)
    if current > target:
        raise ValueError(
            f"checkpoint {version_key}={current} is newer than this "
            f"version of the code supports ({target}); please update"
        )
    while current < target:
        upgrader = getattr(cls, f"upgrade_v{current}_v{current + 1}", None)
        if upgrader is None:
            checkpoint = cls.upgrade_checkpoint(checkpoint)
            checkpoint[version_key] = target
            break
        checkpoint = upgrader(checkpoint)
        current += 1
        checkpoint[version_key] = current
    return checkpoint


def model_from_checkpoint(
    checkpoint_or_path, context: str = "restart"
):
    """Rebuild a model from a checkpoint file or dict, applying upgrades."""
    if isinstance(checkpoint_or_path, (str, Path)):
        checkpoint = load_checkpoint_file(checkpoint_or_path)
    else:
        checkpoint = checkpoint_or_path
    from .architectures import import_architecture

    architecture = import_architecture(checkpoint["architecture_name"])
    model_cls = architecture.__model__
    checkpoint = _upgrade_chain(model_cls, checkpoint, "model_ckpt_version")
    return model_cls.load_checkpoint(checkpoint, context=context)


def trainer_from_checkpoint(
    checkpoint_or_path, hypers: Dict[str, Any], context: str = "restart"
):
    if isinstance(checkpoint_or_path, (str, Path)):
        checkpoint = load_checkpoint_file(checkpoint_or_path)
    else:
        checkpoint = checkpoint_or_path
    from .architectures import import_architecture

    architecture = import_architecture(checkpoint["architecture_name"])
    trainer_cls = architecture.__trainer__
    checkpoint = _upgrade_chain(trainer_cls, checkpoint, "trainer_ckpt_version")
    return trainer_cls.load_checkpoint(checkpoint, hypers)


def _cache_dir() -> Path:
    import os

    root = os.environ.get("MTT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "metatrain_tpu"
    )
    path = Path(root)
    path.mkdir(parents=True, exist_ok=True)
    return path


def resolve_model_path(
    path: str, revision: str = None, token: str = None
) -> str:
    """Resolve a local path, ``http(s)://`` / ``file://`` URL, or
    HuggingFace Hub reference (``hf://<repo_id>/<filename>`` or a
    huggingface.co URL) to a local file, downloading into the cache
    (reference ``cli/export.py:203-211`` + ``utils/io.py:135-188``).

    :param revision: HF-Hub branch/revision for ``hf://`` references
        (reference ``cli/export.py -r/--revision``); default ``main``.
    :param token: HF access token; falls back to ``$HF_TOKEN``. Sent as a
        Bearer header for huggingface.co downloads.
    """
    import hashlib
    import os
    import urllib.request

    path = str(path)
    if path.startswith("hf://"):
        # hf://<org>/<repo>/<filename...>
        parts = path[len("hf://") :].split("/")
        if len(parts) < 3:
            raise ValueError(
                "hf:// reference must be hf://<org>/<repo>/<filename>"
            )
        repo_id = "/".join(parts[:2])
        filename = "/".join(parts[2:])
        path = (
            f"https://huggingface.co/{repo_id}/resolve/"
            f"{revision or 'main'}/{filename}"
        )
    if path.startswith("file://"):
        return path[len("file://") :]
    if not path.startswith(("http://", "https://")):
        return path

    digest = hashlib.sha256(path.encode()).hexdigest()[:16]
    target = _cache_dir() / f"{digest}_{Path(path).name}"
    if target.exists():
        return str(target)
    request = urllib.request.Request(path)
    token = token or os.environ.get("HF_TOKEN")
    if token and "huggingface.co" in path:
        request.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(request) as response, open(
        target, "wb"
    ) as f:
        f.write(response.read())
    return str(target)


def load_model(path: str, context: str = "export"):
    """Load a model from an exported ``.mtt`` envelope or a checkpoint,
    from a local path, URL, or HF-Hub reference (sniffing, reference
    ``utils/io.py:135-188``)."""
    local = resolve_model_path(path)
    data = load_checkpoint_file(local)
    if isinstance(data, dict) and data.get("exported"):
        return model_from_checkpoint(data["checkpoint"], context=context)
    return model_from_checkpoint(data, context=context)
