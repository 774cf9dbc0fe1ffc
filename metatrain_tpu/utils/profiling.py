"""Tracing / profiling (SURVEY.md section 5.1).

The reference wraps PET stages in ``torch.profiler.record_function``
spans and reports per-atom eval timing. The TPU-native equivalents:

- :func:`stage`: ``jax.profiler.TraceAnnotation`` + ``named_scope`` spans
  around model stages -- they show up both in captured device traces and
  in compiled HLO op names;
- :func:`profile_trace`: capture a ``jax.profiler`` trace directory
  (viewable in TensorBoard / Perfetto), used by ``mtt-tpu train --profile``
  and ``eval --profile``;
- :func:`summarize_trace`: aggregate the trace's device-lane events into
  a per-op table (the same parser used by benchmarks/profile_force_call.py).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
from collections import defaultdict
from typing import Dict, Optional, Tuple


@contextlib.contextmanager
def stage(name: str):
    """Annotate a compute stage: visible in profiler traces AND in HLO
    metadata (helps map compiled fusions back to model stages)."""
    import jax

    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace when ``trace_dir`` is set; no-op
    otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield


def summarize_trace(trace_dir: str, top: int = 30) -> Dict[str, Tuple[float, int]]:
    """Aggregate device-op durations from the newest trace in
    ``trace_dir``: {op name: (total microseconds, count)}."""
    paths = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "XLA Ops" in name or "Tensor" in name:
                device_pids.add(e["pid"])
    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if device_pids and e.get("pid") not in device_pids:
                continue
            totals[e["name"]] += e["dur"]
            counts[e["name"]] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return {name: (dur, counts[name]) for name, dur in ranked}
