"""Shipped, reusable per-architecture test harness.

Counterpart of the reference ``src/metatrain/utils/testing/`` (SURVEY.md
section 4.1): an architecture opts into the shared suites with a few
lines::

    from metatrain_tpu.testing import ArchitectureTests

    class TestMyArch(ArchitectureTests):
        architecture = "my_arch"
        minimal_model_hypers = {...}
        supports_forces = True

and inherits output-shape tests, finite-difference force parity,
training/restart tests and checkpoint round-trips, parameterized over the
target types the architecture declares support for.
"""

from .suites import ArchitectureTests

__all__ = ["ArchitectureTests"]
