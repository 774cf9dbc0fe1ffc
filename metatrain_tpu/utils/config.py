"""Options-file loading, expansion and validation.

Counterpart of the reference's omegaconf + pydantic stack
(``utils/omegaconf.py``, ``share/base_hypers.py``, ``utils/pydantic.py``):
YAML in, canonical expanded dict out. Shorthands are expanded exactly as
in the reference (``utils/omegaconf.py:149-430``): a bare string dataset
section becomes ``{systems: {read_from: ...}}``, a target section gets
quantity/key/unit defaults, ``forces: on`` becomes ``{key: "forces"}``,
and the fully-resolved config is saved as ``options_restart.yaml`` for
reproducibility.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, Optional, Union

import yaml
from pydantic import BaseModel, ConfigDict, Field, field_validator


BASE_OPTIONS: Dict[str, Any] = {
    # reference BASE_OPTIONS: utils/omegaconf.py:137-146
    "device": "auto",
    "base_precision": 32,
    "seed": 0,
    "wandb": None,
}


class MetatrainConfigError(ValueError):
    """User-facing configuration error."""


def load_options(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path) as f:
        options = yaml.safe_load(f)
    if not isinstance(options, dict):
        raise MetatrainConfigError(f"options file {path} is not a mapping")
    return resolve_interpolations(options)


#: function-style ``${name:}`` resolvers (reference
#: ``utils/omegaconf.py:126-129``)
_RESOLVERS = {
    "default_device": lambda: "auto",
    "default_precision": lambda: 32,
    "default_random_seed": lambda: 0,
}

_INTERP_RE = __import__("re").compile(r"^\$\{([A-Za-z0-9_.:]+)\}$")
_INTERP_INLINE_RE = __import__("re").compile(r"\$\{([A-Za-z0-9_.:]+)\}")


def resolve_interpolations(options: Dict[str, Any]) -> Dict[str, Any]:
    """OmegaConf-style ``${...}`` interpolation over the options tree
    (reference ``utils/omegaconf.py``): ``${dotted.path}`` references
    another key of the same file (absolute from the root), and
    ``${resolver:}`` invokes a registered resolver
    (default_device/default_precision/default_random_seed). Whole-string
    interpolations keep the referenced value's type; embedded ones
    stringify. Cycles are reported as errors.
    """

    def lookup(path: str, stack):
        if ":" in path:
            name = path.split(":", 1)[0]
            if name not in _RESOLVERS:
                raise MetatrainConfigError(
                    f"unknown config resolver '${{{path}}}' "
                    f"(available: {sorted(_RESOLVERS)})"
                )
            return _RESOLVERS[name]()
        if path in stack:
            raise MetatrainConfigError(
                f"circular config interpolation through '${{{path}}}'"
            )
        node: Any = options
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                raise MetatrainConfigError(
                    f"config interpolation '${{{path}}}' not found"
                )
            node = node[part]
        return resolve(node, stack + (path,))

    def resolve(node, stack=()):
        if isinstance(node, dict):
            return {k: resolve(v, stack) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, stack) for v in node]
        if isinstance(node, str):
            whole = _INTERP_RE.match(node)
            if whole:
                return lookup(whole.group(1), stack)
            return _INTERP_INLINE_RE.sub(
                lambda m: str(lookup(m.group(1), stack)), node
            )
        return node

    return resolve(options)


def _expand_gradient(value: Any, default_key: str) -> Optional[Dict[str, Any]]:
    if value in (False, None, "off"):
        return None
    if value in (True, "on"):
        return {"key": default_key}
    if isinstance(value, dict):
        out = dict(value)
        out.setdefault("key", default_key)
        return out
    raise MetatrainConfigError(
        f"cannot interpret gradient spec {value!r} (use on/off or a mapping)"
    )


def expand_target_config(name: str, config: Any) -> Dict[str, Any]:
    """Expand one target section to canonical form
    (reference CONF_TARGET/CONF_ENERGY, ``utils/omegaconf.py:149-201``)."""
    if config is None:
        config = {}
    if isinstance(config, str):
        config = {"read_from": config}
    if not isinstance(config, dict):
        raise MetatrainConfigError(f"target '{name}' section must be a mapping")
    out = dict(config)
    is_energy = name == "energy" or out.get("quantity") == "energy"
    out.setdefault("quantity", "energy" if is_energy else "")
    out.setdefault("key", name)
    out.setdefault("unit", "eV" if is_energy else "")
    out.setdefault("read_from", None)
    out.setdefault("per_atom", False)
    out.setdefault("num_subtargets", 1)
    out.setdefault("type", "scalar")
    if is_energy:
        out["forces"] = _expand_gradient(out.get("forces", False), "forces")
        out["stress"] = _expand_gradient(out.get("stress", False), "stress")
        out["virial"] = _expand_gradient(out.get("virial", False), "virial")
        if out["stress"] and out["virial"]:
            raise MetatrainConfigError(
                f"target '{name}': cannot use stress and virial together"
            )
    return out


def expand_dataset_config(config: Any) -> Dict[str, Any]:
    """Expand a train/val/test dataset section to canonical form."""
    if isinstance(config, str):
        config = {
            "systems": {"read_from": config},
            "targets": {"energy": {}},
        }
    if not isinstance(config, dict):
        raise MetatrainConfigError("dataset section must be a string or mapping")
    out = dict(config)
    systems = out.get("systems")
    if isinstance(systems, str):
        systems = {"read_from": systems}
    if not isinstance(systems, dict) or "read_from" not in systems:
        raise MetatrainConfigError("dataset section needs systems.read_from")
    systems.setdefault("length_unit", "")
    out["systems"] = systems
    out["targets"] = {
        name: expand_target_config(name, target_config)
        for name, target_config in (out.get("targets") or {}).items()
    }
    if out.get("extra_data"):
        out["extra_data"] = {
            name: expand_target_config(name, c)
            for name, c in out["extra_data"].items()
        }
    return out


class _ArchitectureSection(BaseModel):
    model_config = ConfigDict(extra="forbid")
    name: str
    model: Dict[str, Any] = Field(default_factory=dict)
    training: Dict[str, Any] = Field(default_factory=dict)


class _BaseOptions(BaseModel):
    model_config = ConfigDict(extra="forbid")
    architecture: _ArchitectureSection
    training_set: Any
    validation_set: Any = 0.1
    test_set: Any = 0.0
    device: str = "auto"
    base_precision: int = 32
    seed: int = 0
    wandb: Any = None

    @field_validator("base_precision")
    @classmethod
    def _check_precision(cls, v):
        if v not in (16, 32, 64):
            raise ValueError("base_precision must be 16, 32 or 64")
        return v


def validate_base_options(options: Dict[str, Any]) -> Dict[str, Any]:
    """Validate and normalize the full options dict."""
    merged = {**BASE_OPTIONS, **options}
    try:
        validated = _BaseOptions(**merged)
    except Exception as err:
        raise MetatrainConfigError(_friendly_pydantic_error(err)) from err

    from .architectures import check_architecture_name

    try:
        check_architecture_name(validated.architecture.name)
    except ValueError as err:
        raise MetatrainConfigError(str(err)) from err

    out = validated.model_dump()
    # list form: several dataset sections train together (reference
    # canonical list expansion, ``utils/omegaconf.py:297``; batches
    # interleave via CombinedDataLoader)
    if isinstance(out["training_set"], list):
        out["training_set"] = [
            expand_dataset_config(section) for section in out["training_set"]
        ]
    else:
        out["training_set"] = expand_dataset_config(out["training_set"])
    for key in ("validation_set", "test_set"):
        value = out[key]
        if isinstance(value, list):
            out[key] = [expand_dataset_config(section) for section in value]
        elif not isinstance(value, (int, float)):
            out[key] = expand_dataset_config(value)
        elif not (0.0 <= float(value) < 1.0):
            raise MetatrainConfigError(
                f"{key} fraction must be in [0, 1), got {value}"
            )
    return out


def _friendly_pydantic_error(err: Exception) -> str:
    """Convert pydantic validation errors to user-facing messages
    (reference ``utils/pydantic.py:20-132``)."""
    from pydantic import ValidationError

    if not isinstance(err, ValidationError):
        return str(err)
    lines = ["invalid options file:"]
    for issue in err.errors():
        location = ".".join(str(p) for p in issue["loc"])
        lines.append(f"  - {location}: {issue['msg']}")
    return "\n".join(lines)


def save_expanded_options(options: Dict[str, Any], path: Union[str, Path]) -> None:
    """Write options_restart.yaml (reference ``cli/train.py:605-614``)."""
    with open(path, "w") as f:
        yaml.safe_dump(copy.deepcopy(options), f, sort_keys=False)


def options_json_schema() -> Dict[str, Any]:
    """JSON schema of the base options file (reference
    ``utils/pydantic.py:478``) -- for editor integration and docs."""
    return _BaseOptions.model_json_schema()


def _suggest(key: str, candidates) -> str:
    import difflib

    close = difflib.get_close_matches(key, list(candidates), n=1)
    return f" (did you mean {close[0]!r}?)" if close else ""


def merge_architecture_hypers(
    name: str, user: Dict[str, Any]
) -> Dict[str, Any]:
    """Defaults <- user overrides, recursively, REJECTING unknown keys.

    A typo'd hyperparameter (``d_pett: 256``) raises instead of silently
    training the default model (reference validates every architecture's
    hypers via TypedDict+pydantic, ``utils/pydantic.py:254-476``). Dicts
    whose default is empty (e.g. per-target weight maps, finetune configs)
    are open: user keys there are accepted verbatim.
    """
    from .architectures import get_default_hypers

    defaults = get_default_hypers(name)

    def deep_update(base, update, path):
        for key, value in update.items():
            if key not in base and base:
                location = ".".join(path + [str(key)])
                raise MetatrainConfigError(
                    f"unknown hyperparameter '{location}' for architecture "
                    f"'{name}'{_suggest(str(key), base)}"
                )
            if isinstance(value, dict) and isinstance(base.get(key), dict):
                deep_update(base[key], value, path + [str(key)])
            else:
                base[key] = value

    deep_update(defaults, user or {}, [])
    return defaults
