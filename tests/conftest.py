"""Test configuration: run on a simulated 8-device CPU mesh.

Mirrors the reference's multi-process CPU distributed test pattern
(``composition/tests/test_distributed.py``) using JAX's host-platform
device-count flag, so data-parallel code paths get real multi-device
coverage without TPU hardware (SURVEY.md section 4.3).
"""

import os

# MTT_TEST_TPU=1 selects the on-chip lane (tests/tpu/): the real backend
# is kept and f64 stays off (TPUs have no native f64). Everything else
# runs on the simulated CPU mesh below.
TPU_LANE = os.environ.get("MTT_TEST_TPU", "0") == "1"

# NOTE: jax is preloaded at interpreter startup in this image (a .pth hook),
# so JAX_PLATFORMS/JAX_ENABLE_X64 env vars are captured before conftest runs;
# jax.config.update still works, and XLA_FLAGS is read lazily at backend init.
if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from metatrain_tpu.containers import System  # noqa: E402

# Modules auto-marked ``slow`` (training loops, interpret-mode Pallas
# kernels, multi-process spawns, CLI end-to-end runs). The fast
# end-of-round gate is ``pytest -m "not slow"`` -- it must stay green
# and finish in minutes on one CPU (VERDICT r3 #2: "suite green at
# snapshot" needs a gate that actually gets run).
_SLOW_MODULES = {
    "test_arch_suites",
    "test_bf16_parity",
    "test_checkpoint_corpus",
    "test_cli",
    "test_color_gather",
    "test_color_grouped",
    "test_data_parallel",
    "test_finetuning",
    "test_flashmd",
    "test_flashmd_symplectic",
    "test_fused_gnn",
    "test_fused_layer",
    "test_llpr",
    "test_mace",
    "test_mace_foundation_transplant",
    "test_multiprocess_dp",
    "test_pallas_attention",
    "test_rowblock_bwd",
    "test_serve",
    "test_soap_bpnn",
    "test_torch_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = getattr(item, "module", None)
        if module is not None and module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    # enforce per-class skip budgets on the shared architecture suites
    # (a capability flag that silently skips too much fails the run)
    from metatrain_tpu.testing.skip_budget import SkipBudgetPlugin

    config.pluginmanager.register(SkipBudgetPlugin(), "mtt-skip-budget")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_molecule(n_atoms=8, seed=0, types=(1, 6, 8)):
    rng = np.random.default_rng(seed)
    return System(
        positions=rng.uniform(-3, 3, size=(n_atoms, 3)),
        types=rng.choice(types, size=n_atoms),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, dtype=bool),
    )


def make_crystal(n_cells=2, a=3.6, seed=0, jitter=0.05):
    """FCC-ish periodic crystal (copper lattice constant by default)."""
    rng = np.random.default_rng(seed)
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    cells = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                cells.append(base + np.array([i, j, k]))
    frac = np.concatenate(cells)
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(0, jitter, size=(len(frac), 3))
    return System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )


@pytest.fixture
def molecule():
    return make_molecule()


@pytest.fixture
def crystal():
    return make_crystal()
