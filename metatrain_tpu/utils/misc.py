"""Small shared utilities: units, device/dtype picking, error wrapping,
output naming.

Counterparts of the reference's ``utils/{units,devices,dtype,errors,
external_naming}.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


# -- units (reference utils/units.py) -----------------------------------------

_KNOWN_LENGTH_UNITS = {"angstrom": "A", "nm": "nm", "nanometer": "nm", "": ""}


def get_gradient_units(base_unit: str, gradient_name: str, length_unit: str) -> str:
    """Derive units for gradient quantities (e.g. 'eV' -> 'eV/A')."""
    if not base_unit:
        return ""
    length = _KNOWN_LENGTH_UNITS.get(length_unit.lower(), length_unit or "")
    if gradient_name == "positions" and length:
        return f"{base_unit}/{length}"
    return base_unit  # strain gradients share the base unit


def ev_to_mev(value: float, unit: str) -> tuple:
    """Convert small eV-valued metrics to meV for readability
    (reference MetricLogger behavior)."""
    if unit.startswith("eV") and abs(value) < 1.0:
        return value * 1000.0, "m" + unit
    return value, unit


# -- devices / dtype (reference utils/devices.py, utils/dtype.py) ----------------


def pick_devices(requested: str = "auto") -> List[Any]:
    """Resolve a device request ('auto'/'cpu'/'tpu') to jax devices."""
    if requested in ("auto", ""):
        return jax.devices()
    try:
        return jax.devices(requested)
    except RuntimeError as err:
        raise ValueError(
            f"requested device {requested!r} is not available: {err}"
        ) from err


PRECISION_TO_DTYPE = {16: jnp.bfloat16, 32: jnp.float32, 64: jnp.float64}


def dtype_for_precision(precision: int):
    if precision not in PRECISION_TO_DTYPE:
        raise ValueError(f"base_precision must be one of {sorted(PRECISION_TO_DTYPE)}")
    return PRECISION_TO_DTYPE[precision]


# -- errors (reference utils/errors.py) --------------------------------------------


class ArchitectureError(Exception):
    """Wraps exceptions raised inside architecture code so users can tell
    framework bugs from architecture bugs (reference ``errors.py:22``)."""

    def __init__(self, error: BaseException):
        super().__init__(
            f"{type(error).__name__}: {error}\n\n"
            "The error above most likely originates inside an architecture."
            " If you cannot fix it, please report it to the maintainers."
        )
        self.original = error


# -- external naming (reference utils/external_naming.py) ----------------------------


def to_external_name(internal_name: str, quantity: str = "") -> str:
    """Prefix non-standard outputs with ``mtt::`` for the exported model."""
    standard = {"energy", "energy_ensemble", "features"}
    if internal_name in standard or internal_name.startswith("mtt::"):
        return internal_name
    if quantity == "energy":
        return internal_name
    return f"mtt::{internal_name}"


def to_internal_name(external_name: str) -> str:
    return external_name.removeprefix("mtt::")
