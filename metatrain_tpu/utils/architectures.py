"""Architecture registry and dynamic import.

Counterpart of the reference ``utils/architectures.py``: architectures are
discovered by name, imported dynamically, and must expose ``__model__``
and ``__trainer__`` module attributes plus a ``DEFAULT_HYPERS`` dict
(the reference derives defaults from ``documentation.py`` TypedDicts;
here each architecture module declares them directly).

External architectures plug in two ways (the analogue of the reference's
convention-based directory discovery, which only scans in-package dirs):

- :func:`register_architecture` adds a name -> module mapping at runtime;
- an unknown name that contains a dot is treated as a dotted module path
  and imported directly (``architecture: {name: my_pkg.my_arch}``),
  registering itself on success.
"""

from __future__ import annotations

import difflib
import importlib
from typing import Any, Dict, List


# name -> module path (relative to metatrain_tpu)
ARCHITECTURES: Dict[str, str] = {
    "pet": "metatrain_tpu.models.pet",
    "soap_bpnn": "metatrain_tpu.models.soap_bpnn",
    "composition": "metatrain_tpu.models.composition_arch",
    "scaler": "metatrain_tpu.models.scaler_arch",
    "gap": "metatrain_tpu.models.gap",
    "llpr": "metatrain_tpu.models.llpr",
    "experimental.flashmd": "metatrain_tpu.models.flashmd",
    "experimental.flashmd_symplectic": "metatrain_tpu.models.flashmd_symplectic",
    "experimental.classifier": "metatrain_tpu.models.classifier",
    "experimental.mace": "metatrain_tpu.models.mace",
    "experimental.space": "metatrain_tpu.models.space",
    "experimental.dpa3": "metatrain_tpu.models.dpa3",
}


def register_architecture(name: str, module_path: str) -> None:
    """Register an external architecture under ``name``.

    The module must expose ``__model__`` / ``__trainer__`` (and usually
    ``DEFAULT_HYPERS``), exactly like the in-package architectures.
    """
    ARCHITECTURES[name] = module_path


def _try_external(name: str):
    """Import an unregistered dotted name as a module path, or None."""
    if "." not in name:
        return None
    try:
        module = importlib.import_module(name)
    except ModuleNotFoundError as err:
        # only "the plugin module path itself does not exist" means
        # "not an architecture name"; a missing dependency INSIDE an
        # existing plugin module must surface as the real error
        if err.name and (name == err.name or name.startswith(err.name + ".")):
            return None
        raise
    if hasattr(module, "__model__") and hasattr(module, "__trainer__"):
        register_architecture(name, name)
        return module
    return None


def check_architecture_name(name: str) -> None:
    if name in ARCHITECTURES:
        return
    if _try_external(name) is not None:
        return
    close = difflib.get_close_matches(name, ARCHITECTURES.keys(), cutoff=0.4)
    hint = f" Did you mean '{close[0]}'?" if close else ""
    raise ValueError(
        f"architecture {name!r} is not known; available: "
        f"{sorted(ARCHITECTURES)}.{hint}"
    )


def import_architecture(name: str):
    check_architecture_name(name)
    module = importlib.import_module(ARCHITECTURES[name])
    for attr in ("__model__", "__trainer__"):
        if not hasattr(module, attr):
            raise RuntimeError(
                f"architecture module {ARCHITECTURES[name]} lacks {attr}"
            )
    return module


def get_default_hypers(name: str) -> Dict[str, Any]:
    module = import_architecture(name)
    defaults = getattr(module, "DEFAULT_HYPERS", {"model": {}, "training": {}})
    import copy

    return copy.deepcopy(defaults)


def available_architectures() -> List[str]:
    return sorted(ARCHITECTURES)
