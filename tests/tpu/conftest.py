"""On-chip test lane: runs ONLY on a real TPU backend.

The reference validates kernels on real hardware in CI
(``/root/reference/ci/cscs.yml:12-40``); this lane is the TPU
equivalent. Run it with::

    MTT_TEST_TPU=1 python -m pytest tests/tpu -q

``MTT_TEST_TPU=1`` tells the root conftest to keep the real backend
(and keep f64 off). Without it, or off-chip, every test here skips.
"""

import pathlib

import jax
import pytest

_HERE = pathlib.Path(__file__).parent


def pytest_collection_modifyitems(config, items):
    """Skip the on-chip lane off-TPU. NB: this hook receives ALL
    session items (conftest hooks are session-global), so it must
    filter to this directory's tests only."""
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(
        reason="requires a real TPU backend "
        "(run with MTT_TEST_TPU=1 on-chip)"
    )
    for item in items:
        if _HERE in pathlib.Path(str(item.fspath)).parents:
            item.add_marker(skip)
