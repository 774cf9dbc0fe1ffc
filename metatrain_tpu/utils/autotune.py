"""Persisted kernel-configuration autotune.

The Pallas kernel formulation knobs (q-side vs kq-transposed attention,
wrap-DMA vs extended-copy color bands, int8 vs bf16 score matmuls) are
read from the environment at trace time. Which configuration is fastest
is a HARDWARE property (bench.py A/Bs them on-chip with a force-accuracy
guard and session-to-session drift has been observed: BENCH_r02 selected
``qside+ext`` over the then-default ``qside+wrap``), so the measured
winner is cached per device kind and applied by every production entry
point (train / eval / export / calculator / i-PI drive). Explicit env
vars always win: the cache only fills knobs the user left unset.

Cache file: ``$MTT_AUTOTUNE_CACHE`` or ``~/.cache/metatrain_tpu/
autotune.json`` -- a JSON object ``{device_kind: {"env": {...},
"config": name, "ms_per_call": float, "recorded": iso-date}}``.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)

#: knobs the bench A/Bs; anything else in a cache entry is ignored
TUNED_KNOBS = (
    "MTT_QSIDE",
    "MTT_COLOR_EXT",
    "MTT_COLOR_ROLL",
    "MTT_COLOR_GROUPED",
    "MTT_INT8_SCORES",
    "MTT_INT8_STATIC",
    "MTT_FUSED_GNN",
)


def cache_path() -> Path:
    env = os.environ.get("MTT_AUTOTUNE_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "metatrain_tpu" / "autotune.json"


def device_kind() -> Optional[str]:
    """Device kind of the default backend (e.g. ``"TPU v5 lite"``), or
    None when no accelerator is attached (CPU runs are not tuned)."""
    try:
        import jax

        if jax.default_backend() not in ("tpu", "gpu"):
            return None
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover - backend init failure
        return None


def _load_all() -> Dict[str, dict]:
    path = cache_path()
    try:
        with open(path) as fd:
            data = json.load(fd)
        return data if isinstance(data, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def load_tuned_env(kind: Optional[str] = None) -> Optional[Dict[str, str]]:
    kind = kind or device_kind()
    if kind is None:
        return None
    entry = _load_all().get(kind)
    if not isinstance(entry, dict):
        return None
    env = entry.get("env")
    if not isinstance(env, dict):
        return None
    return {k: str(v) for k, v in env.items() if k in TUNED_KNOBS}


def store_tuned_env(
    env: Dict[str, str],
    config: str = "",
    ms_per_call: Optional[float] = None,
    kind: Optional[str] = None,
) -> bool:
    """Record the measured-fastest knob settings for this device kind.
    Returns True when written."""
    kind = kind or device_kind()
    if kind is None:
        return False
    path = cache_path()
    data = _load_all()
    import datetime

    data[kind] = {
        "env": {k: str(v) for k, v in env.items() if k in TUNED_KNOBS},
        "config": config,
        "ms_per_call": ms_per_call,
        "recorded": datetime.datetime.now().isoformat(timespec="seconds"),
    }
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        with open(tmp, "w") as fd:
            json.dump(data, fd, indent=1)
        os.replace(tmp, path)
        return True
    except OSError as err:  # pragma: no cover - fs specific
        logger.warning("could not persist autotune cache: %s", err)
        return False


def apply_tuned_config() -> Optional[str]:
    """Fill unset kernel knobs from the per-device-kind cache (explicit
    environment variables always win). Returns the applied config name,
    or None when nothing applied. Call before the first model trace."""
    if os.environ.get("MTT_AUTOTUNE", "1") == "0":
        return None
    kind = device_kind()
    env = load_tuned_env(kind)
    if not env:
        return None
    applied = False
    for key, value in env.items():
        if key not in os.environ:
            os.environ[key] = value
            applied = True
    if applied:
        name = _load_all().get(kind, {}).get("config", "")
        logger.info(
            "kernel autotune: applied cached config %r for %s", name, kind
        )
        return name or "cached"
    return None
