"""On-chip kernel validation at production shapes.

Round-1 post-mortem: all 349 CPU tests were green while the then-default
kernel configuration failed Mosaic lowering on the real chip -- CPU
interpret mode exercises the kernel MATH but not the Mosaic lowering,
real DMA layouts, or bf16 MXU numerics. This suite runs the Pallas
kernels on the actual TPU backend at production shapes (d_pet=128,
T=48, bf16) and checks them against the pure-XLA formulations of the
same math.

Every A/B kernel formulation is exercised; all four lower on current
hardware (since round 2), so any formulation regressing under a libtpu
upgrade fails the suite outright.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# production attention geometry: d_pet=128, 8 heads, T=48 NEF slots
A, M, D, F, H = 512, 48, 128, 256, 8
SCALE = (D // H) ** -0.5


def _rel_rms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = float(np.sqrt(np.mean(b * b))) or 1.0
    return float(np.sqrt(np.mean((a - b) ** 2))) / scale


def _layer_inputs(dtype):
    from metatrain_tpu.ops.pallas.fused_layer import LayerWeights

    rng = np.random.default_rng(0)

    def arr(*shape, s=0.1):
        return jnp.asarray(rng.normal(size=shape) * s, dtype=dtype)

    edges = arr(A, M, D, s=1.0)
    center = arr(A, D, s=1.0)
    cf = jnp.asarray(rng.uniform(0.05, 1.0, size=(A, M)), dtype=dtype)
    cf = cf.at[:, -1].set(1.0)
    weights = LayerWeights(
        norm_attn=jnp.ones((D,), dtype),
        w_qkv=arr(D, 3 * D),
        b_qkv=arr(3 * D),
        w_out=arr(D, D),
        b_out=arr(D),
        norm_mlp=jnp.ones((D,), dtype),
        w_in=arr(D, 2 * F),
        b_in=arr(2 * F),
        w_ffn_out=arr(F, D),
        b_ffn_out=arr(D),
    )
    return edges, center, cf, weights


# (name, env, lowers-on-current-hardware) -- since round 2 every
# formulation lowers (the q-side gather and wrap-DMA alignment bugs are
# fixed); a config that stops lowering after a libtpu upgrade fails the
# suite outright.
KERNEL_CONFIGS = [
    ("qside+wrap", {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "0"}, True),  # DEFAULT
    ("qside+ext", {"MTT_QSIDE": "1", "MTT_COLOR_EXT": "1"}, True),
    ("kq+wrap", {"MTT_QSIDE": "0", "MTT_COLOR_EXT": "0"}, True),
    ("kq+ext", {"MTT_QSIDE": "0", "MTT_COLOR_EXT": "1"}, True),
]


def test_default_env_is_hardware_validated():
    """With NO env vars set, the library must select the validated
    formulations (the round-1 default crashed every production entry
    point on chip). Since round 2 the default is q-side + wrap-DMA,
    the fastest measured config -- validated by the tests below."""
    from metatrain_tpu.ops.pallas.fused_layer import _use_qside

    assert "MTT_QSIDE" not in os.environ
    assert "MTT_COLOR_EXT" not in os.environ
    assert _use_qside(M, D, H)


@pytest.mark.parametrize("qside", ["0", "1"])
def test_fused_layer_forward_onchip(qside, monkeypatch):
    """Fused-layer Pallas kernel vs the same math lowered by XLA, both
    on the real chip, bf16 at production shapes."""
    from metatrain_tpu.ops.pallas import fused_layer as fl

    monkeypatch.setenv("MTT_QSIDE", qside)
    edges, center, cf, w = _layer_inputs(jnp.bfloat16)
    e_k, c_k = jax.jit(
        lambda *a: fl._forward_impl(*a, H, SCALE)
    )(edges, center, cf, w)
    e_m, c_m = jax.jit(
        lambda *a: fl._layer_math(*a, H, SCALE)
    )(edges, center, cf, w)
    assert np.isfinite(np.asarray(e_k, np.float32)).all()
    assert _rel_rms(e_k, e_m) < 2e-2
    assert _rel_rms(c_k, c_m) < 2e-2
    np.testing.assert_array_equal(np.asarray(e_k[:, -1, :], np.float32), 0.0)


def test_fused_layer_backward_onchip():
    """Fused custom-vjp backward vs XLA autodiff of the layer math on
    the real chip (input and weight grads)."""
    from metatrain_tpu.ops.pallas import fused_layer as fl

    edges, center, cf, w = _layer_inputs(jnp.bfloat16)

    def loss_fused(edges, center, cf, w):
        e, c = fl.fused_transformer_layer(edges, center, cf, w, H, SCALE)
        return (
            jnp.sum(e.astype(jnp.float32) ** 2)
            + jnp.sum(c.astype(jnp.float32) ** 2)
        )

    def loss_math(edges, center, cf, w):
        e, c = fl._layer_math(edges, center, cf, w, H, SCALE)
        return (
            jnp.sum(e.astype(jnp.float32) ** 2)
            + jnp.sum(c.astype(jnp.float32) ** 2)
        )

    g_k = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 3)))(
        edges, center, cf, w
    )
    g_m = jax.jit(jax.grad(loss_math, argnums=(0, 1, 3)))(
        edges, center, cf, w
    )
    assert _rel_rms(g_k[0], g_m[0]) < 3e-2
    assert _rel_rms(g_k[1], g_m[1]) < 3e-2
    for name, a, b in zip(g_k[2]._fields, g_k[2], g_m[2]):
        assert _rel_rms(a, b) < 5e-2, f"weight grad {name}"


@pytest.fixture(scope="module")
def colored_batch():
    """A periodic crystal batch through the real colored-NEF pipeline,
    large enough (A*M >= 65536 rows) that the banded kernel is active.
    The BANDED layout is pinned: at 2048 atoms the grouped sigma-paired
    layout would otherwise win the host cost model (it has its own
    coverage in tests/test_color_grouped.py and the bench A/B)."""
    import os

    prior = os.environ.get("MTT_COLOR_GROUPED")
    os.environ["MTT_COLOR_GROUPED"] = "0"
    try:
        yield _build_colored_batch()
    finally:
        if prior is None:
            os.environ.pop("MTT_COLOR_GROUPED", None)
        else:
            os.environ["MTT_COLOR_GROUPED"] = prior


def _build_colored_batch():
    from metatrain_tpu.containers import (
        System,
        batch_from_systems,
        bucket_neighbors,
    )
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    n_cells = 8  # 8^3 * 4 = 2048 atoms
    a = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    rng = np.random.default_rng(0)
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(n_cells)
            for j in range(n_cells)
            for k in range(n_cells)
        ]
    )
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(0, 0.05, size=(len(frac), 3))
    system = System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )
    nbr = compute_neighbor_data(system, cutoff=4.5, colored=True)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=-(-len(system) // 256) * 256,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    return system, batch


@pytest.mark.parametrize("ext", ["1", "0"])
def test_color_gather_onchip(colored_batch, ext, monkeypatch):
    """Banded colored-permute kernel vs the plain XLA row gather on the
    real chip: must be bit-identical (the one-hot matmul is exact)."""
    from metatrain_tpu.ops.pallas.color_gather import (
        colored_permute,
        use_kernel,
    )

    monkeypatch.setenv("MTT_COLOR_EXT", ext)
    _, batch = colored_batch
    band = batch.color_band
    A_, M_ = batch.nbr_indices.shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(size=(A_, M_, 128)), dtype=jnp.bfloat16
    )
    assert use_kernel(x.shape, x.dtype, band), (
        "banded kernel must be active at this shape"
    )
    rev = batch.nbr_reverse.reshape(-1)
    out = jax.jit(
        lambda x: colored_permute(
            x,
            rev,
            batch.nbr_indices,
            batch.nbr_fixup_src,
            batch.nbr_fixup_dst,
            band=band,
        )
    )(x)
    ref = jnp.take(x.reshape(A_ * M_, 128), rev, axis=0).reshape(x.shape)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


@pytest.fixture(scope="module")
def pet_setup(colored_batch):
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.models.pet import PET

    system, batch = colored_batch
    dataset_info = DatasetInfo(
        length_unit="angstrom",
        atomic_types=[29],
        targets={
            "energy": get_energy_target_info(
                "eV", add_position_gradients=True
            )
        },
    )
    model = PET({}, dataset_info, compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    # ground truth once per module: identical-math pure-XLA path with
    # the SAME params (MTT_PALLAS=0 disables every kernel at trace time)
    os.environ["MTT_PALLAS"] = "0"
    try:
        e_ref, f_ref = _forces(model, params, batch, dataset_info, tag="xla")
    finally:
        del os.environ["MTT_PALLAS"]
    return batch, dataset_info, model, params, np.asarray(
        e_ref, np.float64
    ), np.asarray(f_ref, np.float64)


def _forces(model, params, batch, dataset_info, tag=""):
    from metatrain_tpu.engine.evaluate import evaluate_model

    def f(params, positions, _tag=tag):
        preds = evaluate_model(
            model.forward,
            params,
            batch.replace(positions=positions),
            {"energy": dataset_info.targets["energy"]},
            is_training=False,
        )
        block = preds["energy"].block()
        return block.values, block.gradient("positions").values

    return jax.jit(f)(params, batch.positions)




@pytest.mark.parametrize(
    "name,env,lowers", KERNEL_CONFIGS, ids=[c[0] for c in KERNEL_CONFIGS]
)
def test_full_pet_force_call_onchip(
    pet_setup, name, env, lowers, monkeypatch
):
    """The full PET force call (the production entry-point path: train,
    eval, ASE calculator, i-PI) must lower, run, and agree with the
    pure-XLA path on the real chip -- per kernel formulation. This is
    the test that was missing in round 1: the then-default config
    crashed here while every CPU test passed."""
    batch, dataset_info, model, params, e_ref, f_ref = pet_setup
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    assert lowers, f"{name} marked non-lowering; update KERNEL_CONFIGS"
    energy, forces = _forces(model, params, batch, dataset_info, tag=name)
    f_np = np.asarray(forces, np.float64)
    assert np.isfinite(f_np).all()
    assert _rel_rms(forces, f_ref) < 5e-2
    assert _rel_rms(energy, e_ref) < 5e-2


def test_full_pet_force_call_default_env(pet_setup, monkeypatch):
    """No env vars at all -- exactly what `mtt-tpu train/eval` and the
    ASE calculator see in production."""
    assert "MTT_QSIDE" not in os.environ
    assert "MTT_COLOR_EXT" not in os.environ
    batch, dataset_info, model, params, e_ref, f_ref = pet_setup
    energy, forces = _forces(model, params, batch, dataset_info)
    assert np.isfinite(np.asarray(forces, np.float64)).all()
    assert _rel_rms(forces, f_ref) < 5e-2
