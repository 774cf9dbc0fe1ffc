"""Profiling subsystem (SURVEY 5.1): stage spans + trace capture."""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from metatrain_tpu.utils.profiling import profile_trace, stage, summarize_trace


def test_stage_spans_compose_with_jit():
    @jax.jit
    def f(x):
        with stage("square"):
            return x * x

    out = f(jnp.asarray(3.0))
    assert float(out) == 9.0


def test_profile_trace_capture_and_summary(tmp_path):
    trace_dir = tmp_path / "trace"

    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((128, 128))
    f(x)  # compile outside the trace
    with profile_trace(str(trace_dir)):
        jax.block_until_ready(f(x))
    assert glob.glob(str(trace_dir / "**" / "*.trace.json.gz"), recursive=True)
    summary = summarize_trace(str(trace_dir))
    assert summary  # at least one device op recorded
    for name, (dur, count) in summary.items():
        assert dur >= 0 and count >= 1


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass
