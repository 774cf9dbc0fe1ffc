"""Import the upstream torch metatrain's PET backend with its native
dependencies stubbed out.

The reference PET's inner modules (``pet/modules/backend.py``) are pure
torch -- only the outer wrapper needs metatensor/metatomic. A meta-path
finder fabricates attribute-on-demand stub modules for the native deps so
``from metatrain.pet.modules.backend import PETBackend`` succeeds with
nothing but torch installed. Used by tests/test_torch_parity.py for
direct numerical parity runs (reference torch PET vs our JAX PET with
converted weights).
"""

import importlib.abc
import importlib.machinery
import os
import sys
import types

STUB_ROOTS = (
    "metatensor",
    "metatomic",
    "vesin",
    "sphericart",
    "spex",
    "featomic",
    "wigners",
    "torchpme",
    "ase",
    "hostlist",
    "skmatter",
    "omegaconf",
    "wandb",
)


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__") and name != "__version__":
            raise AttributeError(name)
        val = _StubModule(self.__name__ + "." + name)
        setattr(self, name, val)
        return val

    def __call__(self, *a, **k):
        return _StubModule(self.__name__ + "()")

    def __mro_entries__(self, bases):
        return (object,)


class _Finder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path, target=None):
        if fullname.split(".")[0] in STUB_ROOTS:
            return importlib.machinery.ModuleSpec(fullname, self, is_package=True)
        return None

    def create_module(self, spec):
        mod = _StubModule(spec.name)
        mod.__path__ = []
        return mod

    def exec_module(self, module):
        pass


def reference_available(ref_src="/root/reference/src"):
    return os.path.isdir(os.path.join(ref_src, "metatrain", "pet"))


def import_reference_backend(ref_src="/root/reference/src"):
    """Return the reference ``PETBackend`` class (pure-torch core)."""
    # the reference skips torch.jit.script decoration under coverage
    # (its modules are TorchScript-compiled otherwise, which fails for
    # the stubbed imports)
    os.environ.setdefault("COVERAGE_RUN", "1")
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    if "metatrain._version" not in sys.modules:
        m = types.ModuleType("metatrain._version")
        m.__version__ = "0.0.0"
        sys.modules["metatrain._version"] = m
    finder = _Finder()
    sys.meta_path.insert(0, finder)
    try:
        from metatrain.pet.modules.backend import PETBackend
    finally:
        sys.meta_path.remove(finder)
    return PETBackend
