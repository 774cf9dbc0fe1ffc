"""Trace-time inference-mode flag.

When a forward pass is traced for inference (force calls, eval, MD), no
gradient with respect to PARAMETERS will ever be requested -- only
positions/strain. Custom-VJP mega-kernels (ops/pallas/fused_layer.py)
check this flag at trace time to skip building weight-gradient
computations (~30-40% of their backward cost); the flag is a plain
Python/trace-time switch, so each jit sees a consistent value.
"""

from __future__ import annotations

import contextlib
import contextvars


_PARAM_GRADS = contextvars.ContextVar("mtt_param_grads", default=True)


@contextlib.contextmanager
def no_param_grads():
    """Trace the enclosed forward for inference: parameter gradients are
    guaranteed unused, custom kernels may skip computing them."""
    token = _PARAM_GRADS.set(False)
    try:
        yield
    finally:
        _PARAM_GRADS.reset(token)


def param_grads_needed() -> bool:
    return _PARAM_GRADS.get()
