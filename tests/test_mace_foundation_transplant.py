"""End-to-end foundation interior transplant: synthetic mace-torch
foundation file -> `convert_mace_foundation` -> foundation-compat MACE
model predicting with the FOUNDATION's interior (VERDICT r3 #3).

The file carries the complete default-architecture tensor inventory
(including the U-matrix buffers, as real mace files do); the test
asserts the imported model's predictions equal the direct
``MACECompat`` evaluation of the same tensors, stay O(3)-invariant
through the full evaluate path (forces covariant), and that the
finetune-context load keeps the transplanted interior.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from metatrain_tpu.containers import System, batch_from_systems
from metatrain_tpu.data.target_info import DatasetInfo, get_energy_target_info
from metatrain_tpu.engine.evaluate import evaluate_model
from metatrain_tpu.interop.mace_foundation import convert_mace_foundation
from metatrain_tpu.ops.neighbors import compute_neighbor_data

from tests.test_mace_compat import (  # noqa: E402  (fixture source)
    C,
    CORRELATION,
    MAX_ELL,
    N_BESSEL,
    N_EL,
    N_INTER,
    R_MAX,
    _config,
    synthetic_state,
)

ATOMIC_NUMBERS = [1, 8]
AVG_NBRS = 8.0


def _module_from_state(state):
    """Nested torch module tree carrying every tensor of ``state`` under
    its dotted mace name (U matrices and bessel frequencies as buffers,
    the rest as Parameters), plus the header tensors a real mace file
    has."""

    class FakeMACE(torch.nn.Module):
        pass

    root = FakeMACE()
    root.register_buffer("atomic_numbers", torch.tensor(ATOMIC_NUMBERS))
    root.register_buffer("r_max", torch.tensor(R_MAX))

    def ensure(path):
        obj = root
        for part in path:
            if not hasattr(obj, part):
                setattr(obj, part, torch.nn.Module())
            obj = getattr(obj, part)
        return obj

    for key, value in state.items():
        *parents, leaf = key.split(".")
        mod = ensure(parents)
        t = torch.tensor(np.asarray(value, np.float64))
        if "U_matrix" in leaf or leaf == "bessel_weights":
            mod.register_buffer(leaf, t)
        else:
            mod.register_parameter(leaf, torch.nn.Parameter(t))

    # plain float attr, like mace's InteractionBlock
    ensure(["interactions", "0"]).avg_num_neighbors = AVG_NBRS
    ensure(["interactions", "1"]).avg_num_neighbors = AVG_NBRS

    cfg = _config()
    ensure(["radial_embedding", "cutoff_fn"]).register_buffer(
        "p", torch.tensor(float(cfg["num_cutoff_basis"]))
    )
    ss = ensure(["scale_shift"])
    ss.register_buffer("scale", torch.tensor(0.9))
    ss.register_buffer("shift", torch.tensor(-0.1))
    ae = ensure(["atomic_energies_fn"])
    ae.register_buffer(
        "atomic_energies", torch.tensor([-13.6, -2040.0])
    )
    return root


@pytest.fixture(scope="module")
def foundation_checkpoint(tmp_path_factory):
    state = synthetic_state(seed=5, scale=0.3)
    module = _module_from_state(state)
    cls = type(module)
    fake_pkg = types.ModuleType("mace")
    fake_modules = types.ModuleType("mace.modules")
    fake_models = types.ModuleType("mace.modules.models")
    cls.__module__ = "mace.modules.models"
    cls.__qualname__ = "MACE"
    fake_models.MACE = cls
    setattr(fake_models, cls.__name__, cls)
    sys.modules["mace"] = fake_pkg
    sys.modules["mace.modules"] = fake_modules
    sys.modules["mace.modules.models"] = fake_models
    path = tmp_path_factory.mktemp("foundation") / "foundation.pt"
    try:
        torch.save(module, str(path))
    finally:
        for name in ("mace.modules.models", "mace.modules", "mace"):
            sys.modules.pop(name, None)
    ckpt = convert_mace_foundation(str(path))
    return state, ckpt


def _system(seed=11, n=6):
    rng = np.random.default_rng(seed)
    return System(
        positions=rng.uniform(0, 3.0, size=(n, 3)),
        types=rng.choice(ATOMIC_NUMBERS, size=n).astype(np.int32),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, bool),
    )


def _model_from(ckpt):
    from metatrain_tpu.models.mace import MACE

    model = MACE(
        ckpt["hypers"],
        DatasetInfo.from_dict(ckpt["dataset_info"]),
        compute_dtype=jnp.float32,
    )
    model.params = ckpt["params"]
    return model


def test_checkpoint_is_compat_mode(foundation_checkpoint):
    state, ckpt = foundation_checkpoint
    assert ckpt["hypers"]["foundation_compat"] is True
    found = ckpt["params"]["params"]["foundation"]
    static = ckpt["params"]["params"]["foundation_static"]
    assert "node_embedding.linear.weight" in found
    assert any("U_matrix" in k for k in static)
    # config recovered from shapes alone
    cfg = ckpt["hypers"]["foundation_config"]
    assert cfg["max_ell"] == MAX_ELL
    assert cfg["num_interactions"] == N_INTER
    assert cfg["correlation"] == CORRELATION
    assert cfg["avg_num_neighbors"] == AVG_NBRS


def test_predicts_with_foundation_interior(foundation_checkpoint):
    """Full-model predictions == direct MACECompat evaluation of the
    imported tensors: the interior is transplanted, not re-initialized."""
    from metatrain_tpu.interop.mace_compat import MACECompat

    state, ckpt = foundation_checkpoint
    model = _model_from(ckpt)
    system = _system()
    nbr = compute_neighbor_data(system, cutoff=model.cutoff)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float32)

    preds = model.forward(model.params, batch, ["energy"])
    e_model = float(np.asarray(preds["energy"].block().values)[0, 0])

    cfg = dict(ckpt["hypers"]["foundation_config"])
    compat = MACECompat(cfg)
    bd = model.preprocess(batch)
    order = np.asarray(cfg["element_perm"])[np.asarray(bd["species_index"])]
    bd = dict(bd)
    bd["species_onehot"] = np.eye(N_EL)[order]
    full_state = {
        **{k: np.asarray(v) for k, v in
           ckpt["params"]["params"]["foundation"].items()},
        **{k: np.asarray(v) for k, v in
           ckpt["params"]["params"]["foundation_static"].items()},
    }
    e_direct = compat.forward(
        full_state, {k: np.asarray(v) for k, v in bd.items()}, np
    )
    amask = np.asarray(batch.atom_mask)
    np.testing.assert_allclose(
        e_model, e_direct[amask].sum(), rtol=1e-5
    )
    assert abs(e_model) > 1e-8


def test_equivariance_through_evaluate(foundation_checkpoint):
    _, ckpt = foundation_checkpoint
    model = _model_from(ckpt)
    infos = {
        "energy": get_energy_target_info("eV", add_position_gradients=True)
    }
    system = _system()
    rng = np.random.default_rng(23)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]

    results = []
    for pos in (system.positions, system.positions @ q.T):
        s = System(
            positions=pos,
            types=system.types,
            cell=system.cell,
            pbc=system.pbc,
        )
        nbr = compute_neighbor_data(s, cutoff=model.cutoff)
        batch = batch_from_systems([s], [nbr], dtype=jnp.float32)
        preds = evaluate_model(
            model.forward, model.params, batch, infos, is_training=False
        )
        block = preds["energy"].block()
        results.append(
            (
                np.asarray(block.values),
                np.asarray(block.gradient("positions").values),
            )
        )
    (e0, f0), (e1, f1) = results
    np.testing.assert_allclose(e1, e0, rtol=2e-4)
    n = len(system)
    np.testing.assert_allclose(
        f1[:n, :, 0], f0[:n, :, 0] @ q.T, rtol=1e-3, atol=1e-5
    )


def test_convention_mismatch_refused():
    """A foundation file whose U buffers live in a DIFFERENT real-SH
    basis must be refused loudly (the w3j-sign/convention gate), not
    imported into a silently-wrong interior."""
    from metatrain_tpu.interop.mace_compat import validate_u_equivariance

    state = synthetic_state(seed=9, scale=0.3)
    # corrupt one U: flip the sign of a single l-block column range,
    # which breaks intertwining with the true basis
    key = next(k for k in state if "U_matrix_2" in k)
    U = np.array(state[key])
    U[..., 1, :] = -U[..., 1, :] if U.ndim == 3 else U[..., 1, :]
    sl = [slice(None)] * U.ndim
    sl[-2] = slice(1, 4)
    U[tuple(sl)] = -U[tuple(sl)]
    state[key] = U
    with pytest.raises(ValueError, match="intertwine|convention"):
        validate_u_equivariance(state, MAX_ELL, CORRELATION)


def test_finetune_step_keeps_static_tensors(foundation_checkpoint):
    """One gradient step moves the trainable interior but never the
    U-matrix / bessel buffers (stop_gradient + static split)."""
    import optax

    _, ckpt = foundation_checkpoint
    model = _model_from(ckpt)
    system = _system()
    nbr = compute_neighbor_data(system, cutoff=model.cutoff)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float32)

    params = jax.tree_util.tree_map(jnp.asarray, model.params)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss(p):
        preds = model.forward(p, batch, ["energy"])
        return jnp.sum(preds["energy"].block().values ** 2)

    grads = jax.grad(loss)(params)
    updates, _ = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        params["params"]["foundation"],
        new_params["params"]["foundation"],
    )
    assert max(moved.values()) > 0.0
    static_moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        params["params"]["foundation_static"],
        new_params["params"]["foundation_static"],
    )
    assert max(static_moved.values()) == 0.0
