"""Pallas TPU kernels (fused transformer layer, window attention,
colored reversed-edge permutation, row-block stages).

Every kernel has an identical-math pure-XLA fallback used off-TPU; the
``MTT_PALLAS=0`` environment variable forces that fallback ON TPU too
(same parameters, native autodiff). It serves as the ground truth for
on-chip force-agreement guards (``bench.py``, ``tests/tpu/``) and as a
user escape hatch on hardware/libtpu combinations where a kernel fails
to lower.
"""

import os


def pallas_enabled() -> bool:
    """Global Pallas kill switch (read at trace time)."""
    return os.environ.get("MTT_PALLAS", "1") != "0"
