"""Calculator (MD serving) tests."""

import jax
import numpy as np

from metatrain_tpu.calculator import Calculator
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.models.pet import PET

from conftest import make_crystal, make_molecule


def _model():
    info = DatasetInfo(
        "angstrom",
        [1, 6, 8, 29],
        {
            "energy": get_energy_target_info(
                "eV", add_position_gradients=True, add_strain_gradients=True
            )
        },
    )
    model = PET(
        {
            "cutoff": 4.0,
            "d_pet": 16,
            "d_head": 16,
            "d_node": 24,
            "d_feedforward": 16,
            "num_heads": 2,
            "num_attention_layers": 1,
            "num_gnn_layers": 1,
        },
        info,
    )
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_calculator_energy_forces_stress():
    calc = Calculator(_model())
    crystal = make_crystal(n_cells=1)
    out = calc.compute(crystal, forces=True, stress=True)
    assert np.isfinite(out["energy"])
    assert out["forces"].shape == (len(crystal), 3)
    assert out["stress"].shape == (3, 3)
    np.testing.assert_allclose(out["virial"], -out["stress"] * abs(np.linalg.det(crystal.cell)), rtol=1e-5)


def test_calculator_bucket_reuse_and_nl_reuse():
    calc = Calculator(_model(), skin=0.8)
    system = make_molecule(9, seed=1)
    out1 = calc.compute(system)
    n_compiled = len(calc._jitted)
    # small non-uniform perturbation (a uniform shift is a translation,
    # under which the energy is exactly invariant): same bucket, same
    # NL -> no recompilation
    moved = make_molecule(9, seed=1)
    rng = np.random.default_rng(7)
    moved.positions = system.positions + rng.uniform(
        -0.01, 0.01, size=system.positions.shape
    )
    out2 = calc.compute(moved)
    assert len(calc._jitted) == n_compiled
    assert abs(out1["energy"] - out2["energy"]) < 1.0

    # energies shift continuously
    assert out1["energy"] != out2["energy"]


def test_calculator_exported_roundtrip(tmp_path):
    from metatrain_tpu.cli.export import export_model_object

    model = _model()
    path = str(tmp_path / "model.mtt")
    export_model_object(model, None, path)
    calc = Calculator(path)
    system = make_molecule(6, seed=2)
    out = calc.compute(system)
    direct = Calculator(model).compute(system)
    np.testing.assert_allclose(out["energy"], direct["energy"], rtol=1e-6)
    np.testing.assert_allclose(out["forces"], direct["forces"], rtol=1e-5, atol=1e-7)


def test_md_smoke():
    calc = Calculator(_model())
    system = make_molecule(5, seed=3)
    masses = np.full(len(system), 12.0)
    final = calc.run_md_nve(system, masses, timestep=0.1, n_steps=3)
    assert np.isfinite(final.positions).all()
    assert not np.allclose(final.positions, system.positions)


def test_calculator_cached_batch_matches_fresh():
    """The MD fast path (cached device batch + positions-only upload)
    must agree exactly with a fresh Calculator on the same positions,
    including across a skin-violation rebuild."""
    model = _model()
    calc = Calculator(model, skin=0.6)
    system = make_molecule(10, seed=5)
    rng = np.random.default_rng(11)

    fresh = Calculator(model, skin=0.6)
    moved = make_molecule(10, seed=5)
    for step in range(6):
        # one large kick in the middle forces a neighbor-list rebuild
        scale = 0.5 if step == 3 else 0.02
        moved.positions = moved.positions + rng.uniform(
            -scale, scale, size=moved.positions.shape
        )
        out_cached = calc.compute(moved, forces=True)
        # fresh calculator: no cache, new NL every call
        fresh._vnl._data = None
        fresh._last_batch = None
        out_fresh = fresh.compute(moved, forces=True)
        np.testing.assert_allclose(
            out_cached["energy"], out_fresh["energy"], rtol=1e-5
        )
        np.testing.assert_allclose(
            out_cached["forces"], out_fresh["forces"], rtol=1e-4, atol=1e-6
        )


def test_ase_adapter_clear_error_without_ase():
    """The ASE adapter module imports without ase and raises a clear
    ImportError on construction (ase absent in this environment)."""
    import importlib

    mod = importlib.import_module("metatrain_tpu.ase_calculator")
    if mod._HAVE_ASE:
        import pytest

        pytest.skip("ase installed; error path not reachable")
    try:
        mod.MetatrainTPUCalculator("nonexistent.mtt")
        raise AssertionError("expected ImportError")
    except ImportError as err:
        assert "ase" in str(err)
