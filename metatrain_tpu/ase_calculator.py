"""ASE calculator adapter (optional; requires the ``ase`` package).

The reference exposes exported models to MD engines through the
metatomic ASE interface (SURVEY.md section 3.5); the TPU-native
equivalent wraps :class:`metatrain_tpu.calculator.Calculator` (compiled
bucketed force calls, Verlet-skin neighbor reuse, cached device batches)
in a standard ``ase.calculators`` object so ASE dynamics drivers
(``VelocityVerlet``, ``Langevin``, optimizers) can run against it
unchanged.

ASE is an optional dependency: importing this module without ``ase``
installed raises a clear error, and nothing else in the framework
depends on it (file IO uses the native extxyz reader/writer).
"""

from __future__ import annotations

import numpy as np

try:
    from ase.calculators.calculator import Calculator as _ASECalculator
    from ase.calculators.calculator import all_changes

    _HAVE_ASE = True
except ImportError:  # pragma: no cover - exercised via test monkeypatch
    _HAVE_ASE = False

    class _ASECalculator:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError(
                "the ASE adapter requires the 'ase' package "
                "(pip install ase); for ASE-free serving use "
                "metatrain_tpu.calculator.Calculator directly"
            )

    all_changes = ()


class MetatrainTPUCalculator(_ASECalculator):
    """ASE calculator serving a trained/exported model on TPU.

    :param model: a model instance, or a path to a ``.mtt`` / ``.ckpt``.
    :param skin: Verlet skin distance for neighbor-list reuse.
    :param kwargs: forwarded to :class:`metatrain_tpu.calculator.Calculator`.
    """

    implemented_properties = ["energy", "forces", "stress"]

    def __init__(self, model, skin: float = 0.5, **kwargs):
        if not _HAVE_ASE:  # pragma: no cover
            _ASECalculator.__init__(self)
        super().__init__()
        from .calculator import Calculator

        self._calc = Calculator(model, skin=skin, **kwargs)

    def calculate(self, atoms=None, properties=("energy",), system_changes=all_changes):
        super().calculate(atoms, properties, system_changes)
        from .containers import System

        system = System(
            positions=np.asarray(atoms.get_positions(), dtype=np.float64),
            types=np.asarray(atoms.get_atomic_numbers(), dtype=np.int32),
            cell=np.asarray(atoms.get_cell()[:], dtype=np.float64),
            pbc=np.asarray(atoms.get_pbc(), dtype=bool),
        )
        want_stress = "stress" in properties and bool(system.pbc.any())
        out = self._calc.compute(
            system, forces=True, stress=want_stress
        )
        self.results = {
            "energy": float(out["energy"]),
            "forces": np.asarray(out["forces"], dtype=np.float64),
        }
        if want_stress and "stress" in out:
            stress = np.asarray(out["stress"], dtype=np.float64)
            # ASE Voigt order: xx, yy, zz, yz, xz, xy
            self.results["stress"] = np.array(
                [
                    stress[0, 0],
                    stress[1, 1],
                    stress[2, 2],
                    stress[1, 2],
                    stress[0, 2],
                    stress[0, 1],
                ]
            )


def system_to_ase(system):
    """Convert a :class:`metatrain_tpu.containers.System` to ``ase.Atoms``
    (reference ``utils/data/system_to_ase.py``). Neighbor data and extra
    fields are discarded."""
    import ase

    return ase.Atoms(
        numbers=np.asarray(system.types),
        positions=np.asarray(system.positions),
        cell=np.asarray(system.cell),
        pbc=list(np.asarray(system.pbc)),
    )


def ase_to_system(atoms):
    """Convert an ``ase.Atoms`` to a :class:`metatrain_tpu.containers.System`."""
    from .containers import System

    return System(
        positions=np.asarray(atoms.get_positions(), dtype=np.float64),
        types=np.asarray(atoms.get_atomic_numbers(), dtype=np.int32),
        cell=np.asarray(atoms.get_cell()[:], dtype=np.float64),
        pbc=np.asarray(atoms.get_pbc(), dtype=bool),
    )
