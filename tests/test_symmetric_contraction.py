"""Exact MACE symmetric contractions (ops/symmetric_contraction.py).

Checks: U-matrix structure (orthonormality, path counts, symmetry),
a hand-computed nu=2 case, O(3) equivariance of the evaluated B-basis,
and polynomial completeness -- every iterated-CG product of A with
itself lies in the span of the B-basis paths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from metatrain_tpu.ops.cg import real_clebsch_gordan
from metatrain_tpu.ops.symmetric_contraction import (
    contract_symmetric,
    feature_dim,
    num_paths,
    u_matrix,
)


def test_u_matrix_nu1_is_block_identity():
    lmax = 2
    for L in range(lmax + 1):
        U = u_matrix(lmax, L, 1)  # (D, P, 2L+1)
        assert U.shape == (feature_dim(lmax), 1, 2 * L + 1)
        # picks out exactly the l=L block, scaled to unit Frobenius norm
        # (the SVD orthonormalizes flattened path tensors): +-I/sqrt(2L+1)
        off, w = L * L, 2 * L + 1
        blk = U[off : off + w, 0]
        scale = blk[0, 0]
        assert abs(abs(scale) - 1 / np.sqrt(w)) < 1e-12
        np.testing.assert_allclose(blk, scale * np.eye(w), atol=1e-12)
        mask = np.ones(feature_dim(lmax), bool)
        mask[off : off + w] = False
        assert not np.any(U[mask])


def test_u_matrix_orthonormal_and_symmetric():
    lmax, nu = 2, 3
    for L in range(lmax + 1):
        U = u_matrix(lmax, L, nu)  # (D, D, D, P, 2L+1)
        P = U.shape[nu]
        if P == 0:
            continue
        flat = U.reshape(-1, P, 2 * L + 1)
        flat = np.moveaxis(flat, 1, 0).reshape(P, -1)
        gram = flat @ flat.T
        np.testing.assert_allclose(gram, np.eye(P), atol=1e-10)
        # permutation symmetry of the input axes
        np.testing.assert_allclose(
            U, np.transpose(U, (1, 0, 2, 3, 4)), atol=1e-12
        )
        np.testing.assert_allclose(
            U, np.transpose(U, (0, 2, 1, 3, 4)), atol=1e-12
        )


def test_path_counts_nu2_lmax1():
    # symmetric couplings of two copies of (l=0) + (l=1):
    # L=0: (0,0)->0 and (1,1)->0                  -> 2 paths
    # L=1: (0,1)/(1,0)->1 symmetrize to one;
    #      (1,1)->1 is parity-odd under exchange (antisymmetric CG)
    #      and parity (-1)^2 != (-1)^1 anyway     -> 1 path
    assert num_paths(1, 0, 2) == 2
    assert num_paths(1, 1, 2) == 1


def test_hand_computed_nu2_scalar():
    """nu=2, lmax=1, L=0: the two paths span {a0^2, |a_vec|^2}; check the
    coupling tensors of those invariants lie in the span of the U rows
    (direct orthogonal projection), and that the evaluated contraction
    matches a direct einsum over U."""
    lmax, L, nu = 1, 0, 2
    U = u_matrix(lmax, L, nu)  # (4, 4, 2, 1)
    a = np.array([0.7, -0.3, 1.1, 0.4])  # (a0, a_{m=-1,0,1})

    # direct: B_eta = sum_{d1 d2} U[d1, d2, eta, 0] a_d1 a_d2
    B_direct = np.einsum("pqe,p,q->e", U[:, :, :, 0], a, a)

    # span membership: the coupling matrices of a0^2 (E_00) and |a_vec|^2
    # (identity on the l=1 block) must project losslessly onto the
    # orthonormal U rows.
    rows = np.einsum("pqe->epq", U[:, :, :, 0]).reshape(2, -1)  # (P, 16)
    T_scalar = np.zeros((4, 4))
    T_scalar[0, 0] = 1.0
    T_vec = np.diag([0.0, 1.0, 1.0, 1.0])
    for T in (T_scalar, T_vec):
        t = T.reshape(-1)
        proj = rows.T @ (rows @ t)
        assert np.abs(proj - t).max() < 1e-12

    # evaluated through contract_symmetric with unit weights
    A = jnp.asarray(a, jnp.float64).reshape(1, 1, 4)
    w = {(2, 0): jnp.ones((1, 2, 1), jnp.float64)}
    out = contract_symmetric(A, w, lmax, lmax, 2, jnp=jnp)
    np.testing.assert_allclose(
        np.asarray(out[0])[0, 0, 0], B_direct.sum(), atol=1e-10
    )


def _wigner_blocks(lmax, rotation):
    from metatrain_tpu.engine.augmentation import real_wigner_d

    return [np.asarray(real_wigner_d(rotation, l)) for l in range(lmax + 1)]


def test_equivariance():
    lmax, corr = 2, 3
    rng = np.random.default_rng(0)
    N, K, D = 3, 2, feature_dim(lmax)
    A = rng.normal(size=(N, K, D))
    from metatrain_tpu.engine.augmentation import random_rotation

    Ds = _wigner_blocks(lmax, random_rotation(rng))

    A_rot = np.zeros_like(A)
    off = 0
    for l in range(lmax + 1):
        w = 2 * l + 1
        A_rot[:, :, off : off + w] = A[:, :, off : off + w] @ Ds[l].T
        off += w

    weights = {}
    for nu in range(1, corr + 1):
        for L in range(lmax + 1):
            P = num_paths(lmax, L, nu)
            if P:
                weights[(nu, L)] = jnp.asarray(
                    rng.normal(size=(N, P, K)), jnp.float64
                )

    out = contract_symmetric(
        jnp.asarray(A, jnp.float64), weights, lmax, lmax, corr, jnp=jnp
    )
    out_rot = contract_symmetric(
        jnp.asarray(A_rot, jnp.float64), weights, lmax, lmax, corr, jnp=jnp
    )
    for L in out:
        np.testing.assert_allclose(
            np.asarray(out[L]) @ Ds[L].T,
            np.asarray(out_rot[L]),
            atol=1e-10,
            err_msg=f"L={L}",
        )


@pytest.mark.parametrize("L", [0, 1, 2])
def test_completeness_vs_iterated_cg_nu2(L):
    """Every order-2 iterated-CG product of A with itself lies in the
    span of the B-basis paths at (nu=2, L)."""
    lmax = 2
    D = feature_dim(lmax)
    U = u_matrix(lmax, L, 2)  # (D, D, P, 2L+1)
    P = U.shape[2]
    rng = np.random.default_rng(1)
    n_samples = 40
    As = rng.normal(size=(n_samples, D))

    # B outputs per sample: (S, P, M)
    B = np.einsum("pqem,sp,sq->sem", U, As, As)

    def block(a, l):
        return a[l * l : l * l + 2 * l + 1]

    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            if (-1) ** (l1 + l2) != (-1) ** L:
                continue
            if not (abs(l1 - l2) <= L <= l1 + l2):
                continue
            cg = real_clebsch_gordan(l1, l2, L)
            target = np.stack(
                [np.einsum("p,q,pqm->m", block(a, l1), block(a, l2), cg)
                 for a in As]
            )  # (S, M)
            # B is (S, P, M); the linear system is over (sample, m) rows,
            # so transpose to (S, M, P) before flattening.
            B_mat = B.transpose(0, 2, 1).reshape(n_samples * (2 * L + 1), P)
            coef, *_ = np.linalg.lstsq(
                B_mat, target.reshape(-1), rcond=None
            )
            recon = B_mat @ coef
            resid = np.abs(recon - target.reshape(-1)).max()
            assert resid < 1e-8, (l1, l2, L, resid)


def test_mace_symmetric_product_basis_wired():
    """MACE default product basis is the exact B-basis; forward runs and
    the parameter tree contains the per-species path-weight embeddings."""
    from metatrain_tpu.models.mace import DEFAULT_MODEL_HYPERS

    assert DEFAULT_MODEL_HYPERS["product_basis"] == "symmetric"

    import jax

    from metatrain_tpu.containers import System, batch_from_systems
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.models.mace import MACE
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    rng = np.random.default_rng(2)
    system = System(
        positions=rng.uniform(0, 4, size=(6, 3)),
        types=np.array([1, 1, 6, 6, 8, 8], np.int32),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, bool),
    )
    info = DatasetInfo(
        length_unit="angstrom",
        atomic_types=[1, 6, 8],
        targets={"energy": get_energy_target_info("eV")},
    )
    model = MACE({"num_channels": 4, "max_ell": 1, "correlation": 2},
                 info, compute_dtype=jnp.float64)
    params = model.init_params(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("sym2_0" in n for n in names), sorted(names)[:20]

    nbr = compute_neighbor_data(system, cutoff=model.cutoff)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float64)
    preds = model.forward(params, batch, ["energy"])
    vals = np.asarray(preds["energy"].block().values)
    assert np.isfinite(vals).all()


def test_mace_v2_checkpoint_keeps_iterated_cg():
    from metatrain_tpu.models.mace import MACE

    ckpt = {"hypers": {"num_channels": 4}, "model_version": 2}
    upgraded = MACE.upgrade_v2_v3(ckpt)
    assert upgraded["hypers"]["product_basis"] == "iterated_cg"
    # explicit setting survives
    ckpt2 = {"hypers": {"product_basis": "legacy"}, "model_version": 2}
    assert MACE.upgrade_v2_v3(ckpt2)["hypers"]["product_basis"] == "legacy"
