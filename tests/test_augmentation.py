"""O3 augmentation: Wigner-D correctness and target consistency."""

import numpy as np

from metatrain_tpu.containers import Labels, System, TensorBlock, TensorMap
from metatrain_tpu.data.dataset import Sample
from metatrain_tpu.engine.augmentation import (
    O3Augmenter,
    random_rotation,
    real_wigner_d,
)
from metatrain_tpu.ops.spherical import reference_real_sph

from conftest import make_molecule


def test_wigner_d_matches_spherical_harmonics():
    rng = np.random.default_rng(3)
    rotation = random_rotation(rng)
    v = rng.normal(size=(16, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for l in range(5):
        d = real_wigner_d(rotation, l)
        y = reference_real_sph(v, l)[l]
        y_rot = reference_real_sph(v @ rotation.T, l)[l]
        np.testing.assert_allclose(y_rot, y @ d.T, atol=1e-10)
        # D is orthogonal
        np.testing.assert_allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-10)


def test_wigner_d_parity():
    inversion = -np.eye(3)
    for l in range(4):
        d = real_wigner_d(inversion, l)
        np.testing.assert_allclose(
            d, (-1.0) ** l * np.eye(2 * l + 1), atol=1e-10
        )


def _energy_sample(system, rng):
    energy_block = TensorBlock(
        values=np.array([[1.5]]),
        samples=Labels(["system"], np.array([[0]], dtype=np.int32)),
        components=[],
        properties=Labels(["energy"], np.zeros((1, 1), dtype=np.int32)),
    )
    grad = TensorBlock(
        values=rng.normal(size=(len(system), 3, 1)),
        samples=Labels.range("atom", len(system)),
        components=[Labels(["xyz"], np.arange(3).reshape(-1, 1))],
        properties=Labels(["energy"], np.zeros((1, 1), dtype=np.int32)),
    )
    energy_block.add_gradient("positions", grad)
    return Sample(system, {"energy": TensorMap(Labels.single(), [energy_block])})


def test_augmenter_rotates_system_and_gradients():
    rng = np.random.default_rng(0)
    system = make_molecule(6, seed=1)
    sample = _energy_sample(system, rng)

    augmenter = O3Augmenter(seed=7)
    [out] = augmenter([sample])

    # recover the applied rotation from the positions
    rotation, *_ = np.linalg.lstsq(system.positions, out.system.positions, rcond=None)
    rotation = rotation.T
    np.testing.assert_allclose(
        out.system.positions, system.positions @ rotation.T, atol=1e-8
    )
    np.testing.assert_allclose(rotation @ rotation.T, np.eye(3), atol=1e-8)

    # scalar target unchanged
    np.testing.assert_allclose(
        np.asarray(out.targets["energy"].block().values), [[1.5]]
    )
    # gradient rotated consistently with the positions
    g_in = np.asarray(sample.targets["energy"].block().gradient("positions").values)
    g_out = np.asarray(out.targets["energy"].block().gradient("positions").values)
    np.testing.assert_allclose(
        g_out[:, :, 0], g_in[:, :, 0] @ rotation.T, atol=1e-8
    )


def test_augmenter_spherical_target():
    rng = np.random.default_rng(2)
    system = make_molecule(4, seed=2)
    keys = Labels(
        ["o3_lambda", "o3_sigma"], np.array([[2, 1]], dtype=np.int32)
    )
    block = TensorBlock(
        values=rng.normal(size=(1, 5, 1)),
        samples=Labels(["system"], np.array([[0]], dtype=np.int32)),
        components=[Labels(["o3_mu"], np.arange(-2, 3).reshape(-1, 1))],
        properties=Labels(["p"], np.zeros((1, 1), dtype=np.int32)),
    )
    sample = Sample(system, {"target": TensorMap(keys, [block])})

    augmenter = O3Augmenter(seed=11)
    [out] = augmenter([sample])
    rotation, *_ = np.linalg.lstsq(
        system.positions, out.system.positions, rcond=None
    )
    rotation = rotation.T
    d = real_wigner_d(rotation, 2)
    expected = np.einsum("mn,snp->smp", d, np.asarray(block.values))
    np.testing.assert_allclose(
        np.asarray(out.targets["target"].block().values), expected, atol=1e-8
    )


def test_inversion_only_mode():
    augmenter = O3Augmenter(seed=0, inversion_only=True)
    system = make_molecule(5, seed=5)
    rng = np.random.default_rng(1)
    for _ in range(5):
        [out] = augmenter([_energy_sample(system, rng)])
        ratio = out.system.positions / system.positions
        assert np.allclose(ratio, 1.0) or np.allclose(ratio, -1.0)


def test_o3_rotates_per_atom_vector_extras():
    """Per-atom (n, 3) float extras (FlashMD momenta) co-rotate with the
    geometry (review finding: they passed through unrotated)."""
    from metatrain_tpu.containers import System
    from metatrain_tpu.data.dataset import Sample
    from metatrain_tpu.engine.augmentation import O3Augmenter

    rng = np.random.default_rng(0)
    n = 5
    system = System(
        positions=rng.normal(size=(n, 3)),
        types=np.full(n, 6),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, dtype=bool),
    )
    momenta = rng.normal(size=(n, 3))
    system.extra["momenta"] = momenta
    system.extra["masses"] = np.ones(n)  # scalar column: untouched
    system.extra["charge"] = np.asarray(1.0)

    augmenter = O3Augmenter(seed=3)
    (out,) = augmenter([Sample(system, {})])

    # recover the applied rotation from the positions
    rotation, *_ = np.linalg.lstsq(
        system.positions, out.system.positions, rcond=None
    )
    np.testing.assert_allclose(
        rotation.T @ rotation, np.eye(3), atol=1e-10
    )
    np.testing.assert_allclose(
        out.system.extra["momenta"], momenta @ rotation, atol=1e-10
    )
    np.testing.assert_allclose(out.system.extra["masses"], np.ones(n))
    np.testing.assert_allclose(out.system.extra["charge"], 1.0)
