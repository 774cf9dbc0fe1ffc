"""mace-torch compat forward (interop/mace_compat.py): the foundation
interior transplant.

Oracle-free validation strategy (mace-torch/e3nn are not installed in
this environment -- documented in the module):

- the e3nn convention layer self-validates: Wigner-3j tensors are
  asserted (at construction) to intertwine the rotations derived from
  the module's own spherical harmonics, so the SH formulas, the
  complex->real basis change, and the 3j construction must be mutually
  consistent or the import fails loudly;
- full-model O(3) equivariance on a synthetic foundation state: the
  predicted per-atom energies must be invariant under a rigid rotation
  of the system -- this exercises every convention end-to-end (SH,
  w3j, TP layouts, U-tensor contraction);
- tensor-by-tensor consumption: the forward must READ every interior
  tensor of the foundation state (nothing silently ignored);
- known-function spot check: with the interior configured to a
  hand-computable function (single scalar path), the energy matches
  the closed form including every normalization constant on the path.

Residual documented risk: the GLOBAL sign convention of e3nn's real
Wigner 3j per (l1,l2,l3) is taken from e3nn's published construction
(Condon-Shortley complex 3j + (-i)^l real basis change) and cannot be
cross-checked here.
"""

import math

import numpy as np
import pytest

from metatrain_tpu.interop.e3nn_compat import sh_e3nn, w3j
from metatrain_tpu.interop.mace_compat import (
    MACECompat,
    _SILU_NORM,
    bessel_basis,
    polynomial_cutoff,
)
from metatrain_tpu.ops.symmetric_contraction import (
    feature_dim,
    num_paths,
)


def u_matrix_e3nn(lmax: int, L: int, nu: int) -> np.ndarray:
    """Symmetric-contraction U tensor in the E3NN real basis (the basis
    a real mace foundation file ships its U buffers in), built from the
    compat layer's own w3j so the test state is basis-consistent with
    the compat A-basis. Supports nu in {1, 2} (enough for the test
    architecture); layout matches :func:`u_matrix`:
    ``(D,)*nu + (P, 2L+1)``.
    """
    D = feature_dim(lmax)

    def off(l):
        return l * l

    if nu == 1:
        P = 1 if L <= lmax else 0
        U = np.zeros((D, P, 2 * L + 1))
        if P:
            for m in range(2 * L + 1):
                U[off(L) + m, 0, m] = 1.0 / math.sqrt(2 * L + 1)
        return U
    assert nu == 2
    raw = []
    for l1 in range(lmax + 1):
        for l2 in range(l1, lmax + 1):
            if not (abs(l1 - l2) <= L <= l1 + l2):
                continue
            if (-1) ** (l1 + l2) != (-1) ** L:
                continue
            W = w3j(l1, l2, L)  # e3nn basis
            T = np.zeros((D, D, 2 * L + 1))
            T[off(l1) : off(l1) + 2 * l1 + 1,
              off(l2) : off(l2) + 2 * l2 + 1] = W
            T = 0.5 * (T + T.transpose(1, 0, 2))
            if np.linalg.norm(T) > 1e-12:
                raw.append(T / np.linalg.norm(T))
    # orthonormalize the path set (flattened Gram-Schmidt)
    basis = []
    for T in raw:
        v = T.reshape(-1)
        for b in basis:
            v = v - (v @ b) * b
        n = np.linalg.norm(v)
        if n > 1e-10:
            basis.append(v / n)
    P = len(basis)
    assert P == num_paths(lmax, L, nu)
    return np.stack(basis, axis=-1).reshape(D, D, 2 * L + 1, P).transpose(
        0, 1, 3, 2
    )


def test_w3j_known_values():
    W = w3j(1, 1, 0)
    np.testing.assert_allclose(
        W[:, :, 0], np.eye(3) / math.sqrt(3), atol=1e-12
    )
    W = w3j(1, 1, 1)
    # Levi-Civita / sqrt(6) pattern (signs fixed by the construction)
    assert abs(abs(W[0, 1, 2]) - 1 / math.sqrt(6)) < 1e-12
    assert abs(W[0, 1, 2] + W[1, 0, 2]) < 1e-12  # antisymmetric


def test_sh_matches_own_l1_convention():
    v = np.array([[0.3, -1.2, 0.7]])
    Y = sh_e3nn(v, 1)
    u = v[0] / np.linalg.norm(v[0])
    np.testing.assert_allclose(
        Y[1][0], math.sqrt(3) * np.array([u[1], u[2], u[0]]), atol=1e-12
    )


# -- synthetic foundation state --------------------------------------------

N_EL = 2
C = 4
MAX_ELL = 2
HIDDEN_LMAX = 1
CORRELATION = 2
N_INTER = 2
R_MAX = 4.0
N_BESSEL = 6


def _interaction_irreps():
    return [(C, l, (-1) ** l) for l in range(MAX_ELL + 1)]


def _hidden_irreps(last):
    if last:
        return [(C, 0, 1)]
    return [(C, l, (-1) ** l) for l in range(HIDDEN_LMAX + 1)]


def _n_tp_weights(feats_irreps):
    from metatrain_tpu.interop.e3nn_compat import (
        tp_out_irreps_with_instructions,
    )

    sh_irreps = [(1, l, (-1) ** l) for l in range(MAX_ELL + 1)]
    _, instructions = tp_out_irreps_with_instructions(
        feats_irreps, sh_irreps, _interaction_irreps()
    )
    return C * len(instructions)


def _mid_irreps(feats_irreps):
    from metatrain_tpu.interop.e3nn_compat import (
        tp_out_irreps_with_instructions,
    )

    sh_irreps = [(1, l, (-1) ** l) for l in range(MAX_ELL + 1)]
    out, _ = tp_out_irreps_with_instructions(
        feats_irreps, sh_irreps, _interaction_irreps()
    )
    return out


def _o3_linear_size(irreps_in, irreps_out):
    return sum(
        mi * mo
        for mi, li, pi in irreps_in
        for mo, lo, po in irreps_out
        if (li, pi) == (lo, po)
    )


def synthetic_state(seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    st = {}

    def rnd(*shape):
        return rng.normal(size=shape) * scale

    st["node_embedding.linear.weight"] = rnd(N_EL * C)
    st["radial_embedding.bessel_fn.bessel_weights"] = (
        np.arange(1, N_BESSEL + 1) * math.pi / R_MAX
    )

    feats = [(C, 0, 1)]
    for i in range(N_INTER):
        last = i == N_INTER - 1
        out_irreps = _hidden_irreps(last)
        pre = f"interactions.{i}."
        st[pre + "linear_up.weight"] = rnd(_o3_linear_size(feats, feats))
        n_w = _n_tp_weights(feats)
        dims = [N_BESSEL, 16, 16, n_w]
        for j in range(3):
            st[pre + f"conv_tp_weights.layer{j}.weight"] = rnd(
                dims[j], dims[j + 1]
            )
        mid = _mid_irreps(feats)
        st[pre + "linear.weight"] = rnd(
            _o3_linear_size(mid, _interaction_irreps())
        )
        st[pre + "skip_tp.weight"] = rnd(
            sum(
                mi * N_EL * mo
                for mi, li, pi in feats
                for mo, lo, po in out_irreps
                if (li, pi) == (lo, po)
            )
        )
        # products: one contraction per output irrep, shipped U buffers
        for j, (mul, L, p) in enumerate(out_irreps):
            cpre = f"products.{i}.symmetric_contractions.contractions.{j}."
            for nu in range(1, CORRELATION + 1):
                U = u_matrix_e3nn(MAX_ELL, L, nu)  # (D,)*nu + (P, 2L+1)
                # mace layout: ([2L+1], D...D, P)
                U_mace = np.moveaxis(U, -1, 0)
                if L == 0:
                    U_mace = U_mace[0]
                if nu == CORRELATION:
                    st[cpre + f"U_matrix_{nu}"] = U_mace
                    st[cpre + "weights_max"] = rnd(
                        N_EL, num_paths(MAX_ELL, L, nu), C
                    )
                else:
                    st[cpre + f"U_matrix_{nu}"] = U_mace
                    st[
                        cpre + f"weights.{CORRELATION - 1 - nu}"
                    ] = rnd(N_EL, num_paths(MAX_ELL, L, nu), C)
        st[f"products.{i}.linear.weight"] = rnd(
            _o3_linear_size(out_irreps, out_irreps)
        )
        if last:
            st[f"readouts.{i}.linear_1.weight"] = rnd(C * 8)
            st[f"readouts.{i}.linear_2.weight"] = rnd(8 * 1)
        else:
            st[f"readouts.{i}.linear.weight"] = rnd(C * 1)
        feats = out_irreps
    return st


def _config():
    return {
        "r_max": R_MAX,
        "num_interactions": N_INTER,
        "correlation": CORRELATION,
        "max_ell": MAX_ELL,
        "atomic_numbers": [1, 8],
        "num_channels": C,
        "hidden_lmax": HIDDEN_LMAX,
        "num_cutoff_basis": 5,
        "avg_num_neighbors": 8.0,
    }


def _batch_data(positions, species_idx, rng=None):
    """Minimal NEF batch for the compat forward (dense all-pairs within
    r_max, no pbc)."""
    n = len(positions)
    M = n - 1
    nbr_indices = np.zeros((n, M), np.int64)
    mask = np.zeros((n, M), bool)
    vecs = np.zeros((n, M, 3))
    for a in range(n):
        slot = 0
        for b in range(n):
            if a == b:
                continue
            d = positions[b] - positions[a]
            if np.linalg.norm(d) < R_MAX:
                nbr_indices[a, slot] = b
                vecs[a, slot] = d
                mask[a, slot] = True
            else:
                nbr_indices[a, slot] = a
            slot += 1
    dist = np.linalg.norm(vecs, axis=-1)
    onehot = np.eye(N_EL)[species_idx]
    return {
        "species_onehot": onehot,
        "edge_vectors": vecs,
        "edge_distances": dist,
        "nbr_indices": nbr_indices,
        "nbr_mask": mask,
    }


@pytest.fixture(scope="module")
def compat_setup():
    state = synthetic_state()
    compat = MACECompat(_config())
    rng = np.random.default_rng(3)
    positions = rng.uniform(0, 3.0, size=(6, 3))
    species = np.array([0, 1, 0, 1, 0, 1])
    return state, compat, positions, species


def test_forward_finite_and_deterministic(compat_setup):
    state, compat, positions, species = compat_setup
    e1 = compat.forward(state, _batch_data(positions, species), np)
    e2 = compat.forward(state, _batch_data(positions, species), np)
    assert e1.shape == (6,)
    assert np.isfinite(e1).all()
    np.testing.assert_array_equal(e1, e2)
    assert np.abs(e1).max() > 1e-8  # not trivially zero


def test_rotation_invariance(compat_setup):
    """Energies invariant under rigid rotation: exercises every basis
    convention (SH, w3j, TP layout, U contraction) end-to-end."""
    state, compat, positions, species = compat_setup
    e0 = compat.forward(state, _batch_data(positions, species), np)
    rng = np.random.default_rng(7)
    for _ in range(2):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        e_rot = compat.forward(
            state, _batch_data(positions @ q.T + 1.23, species), np
        )
        np.testing.assert_allclose(e_rot, e0, rtol=1e-9, atol=1e-10)


def test_padded_slots_do_not_contribute(compat_setup):
    state, compat, positions, species = compat_setup
    bd = _batch_data(positions, species)
    e0 = compat.forward(state, bd, np)
    # corrupt masked slots' geometry: results must not change
    bd2 = dict(bd)
    vec = bd["edge_vectors"].copy()
    dist = bd["edge_distances"].copy()
    bad = ~bd["nbr_mask"]
    vec[bad] = 0.77
    dist[bad] = 1.3
    bd2["edge_vectors"] = vec
    bd2["edge_distances"] = dist
    e1 = compat.forward(state, bd2, np)
    np.testing.assert_allclose(e1, e0, rtol=1e-12, atol=1e-12)


def test_every_interior_tensor_consumed(compat_setup):
    """The transplant must use every tensor (VERDICT r3: tensor-by-
    tensor account); a key the forward never reads fails this test."""
    state, compat, positions, species = compat_setup
    read = set()

    class Recording(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

        def get(self, k, default=None):
            read.add(k)
            return super().get(k, default)

    rec = Recording(state)
    compat.forward(rec, _batch_data(positions, species), np)
    unread = set(state) - read
    assert not unread, f"interior tensors never consumed: {sorted(unread)}"


def test_known_function_single_scalar_path():
    """Interior configured so the model computes a closed-form energy:
    every weight zero except the scalar chain (embedding -> 0e x Y0 ->
    0e message -> nu=1 product -> linear readout). Checks the
    normalization constants along the scalar path exactly."""
    state = synthetic_state(scale=0.0)  # all zeros
    cfg = _config()
    compat = MACECompat(cfg)

    emb = 0.7  # same for both elements
    state["node_embedding.linear.weight"] = np.full(N_EL * C, emb)
    # radial MLP: only the FIRST tp instruction (0e x Y0 -> 0e) gets
    # weight; make the MLP output a constant by zeroing all but biasless
    # paths... layers have no bias, so drive via the first bessel input:
    # instead set the last layer to read hidden features produced by
    # identity-ish first layers. Simplest: one hidden unit passes
    # through.
    n_w = _n_tp_weights([(C, 0, 1)])
    w0 = np.zeros((N_BESSEL, 16)); w0[0, 0] = 1.0
    w1 = np.zeros((16, 16)); w1[0, 0] = 1.0
    w2 = np.zeros((16, n_w)); w2[0, :C] = 1.0  # first instruction = scalar path
    state["interactions.0.conv_tp_weights.layer0.weight"] = w0
    state["interactions.0.conv_tp_weights.layer1.weight"] = w1
    state["interactions.0.conv_tp_weights.layer2.weight"] = w2
    # linear_up = identity (scalars): weight = I * sqrt(C) (e3nn divides
    # by sqrt(fan_in)=sqrt(C))
    state["interactions.0.linear_up.weight"] = (
        np.eye(C).reshape(-1) * math.sqrt(C)
    )
    # interaction linear: scalar block identity, rest zero
    mid = _mid_irreps([(C, 0, 1)])
    lin = []
    fan0 = sum(m for m, l, p in mid if (l, p) == (0, 1))
    for mi, li, pi in mid:
        for mo, lo, po in _interaction_irreps():
            if (li, pi) != (lo, po):
                continue
            blk = np.zeros((mi, mo))
            if li == 0 and mid.index((mi, li, pi)) == 0:
                blk = np.eye(C) * math.sqrt(fan0)
            lin.append(blk.reshape(-1))
    state["interactions.0.linear.weight"] = np.concatenate(lin)
    # product: nu=1 path weight 1 on the L=0 contraction; U_1 for L=0 is
    # the unit-normalized l=0 selector: B = U[0,0,p] a_0
    P1 = num_paths(MAX_ELL, 0, 1)
    w_nu1 = np.zeros((N_EL, P1, C)); w_nu1[:, 0, :] = 1.0
    state[
        "products.0.symmetric_contractions.contractions.0.weights."
        + str(CORRELATION - 1 - 1)
    ] = w_nu1
    # products linear identity on scalars
    out_irreps = _hidden_irreps(False)
    plin = []
    for mi, li, pi in out_irreps:
        for mo, lo, po in out_irreps:
            if (li, pi) != (lo, po):
                continue
            blk = np.eye(C) * math.sqrt(C) if li == 0 else np.zeros((mi, mo))
            plin.append(blk.reshape(-1))
    state["products.0.linear.weight"] = np.concatenate(plin)
    # readout 0: sum the C scalar channels with weight 1 (e3nn linear
    # divides by sqrt(C))
    state["readouts.0.linear.weight"] = np.ones(C)

    # two atoms at distance r
    r = 2.0
    positions = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    species = np.array([0, 1])
    e = compat.forward(state, _batch_data(positions, species), np)

    # closed form: node scalar h = emb * sqrt(N_EL) / sqrt(N_EL) = emb
    # (embedding linear: w=emb for all (el, c); x = onehot -> per channel
    #  emb / sqrt(N_EL) * 1 ... fan_in = N_EL so h_c = emb/sqrt(N_EL))
    h = emb / math.sqrt(N_EL)
    # radial: bessel_0(r)*cutoff(r) -> through the MLP chain:
    b0 = math.sqrt(2 / R_MAX) * math.sin(math.pi * r / R_MAX) / r
    b0 *= float(polynomial_cutoff(np.array(r), R_MAX, 5, np))
    t = b0 / math.sqrt(N_BESSEL)
    t = (t / (1 + math.exp(-t))) / _SILU_NORM
    t = (t / math.sqrt(16))
    t = (t / (1 + math.exp(-t))) / _SILU_NORM
    tp_w = t / math.sqrt(16)
    # message per channel: alpha(0e x 0e -> 0e) * w3j(0,0,0)=1 * h * Y0(=1) * tp_w
    n_into0 = 1  # only one instruction lands on the first 0e output
    # NOTE: with scalars-only inputs each (0,l2)->l2 instruction has its
    # own output slot, so n_into = 1 for each
    msg = math.sqrt(1) * 1.0 * h * 1.0 * tp_w
    # aggregated over 1 neighbor / avg_num_neighbors, linear identity
    agg = msg / _config()["avg_num_neighbors"]
    # product nu=1: B_0 = U1[0, 0, 0] * a_0 with U1 the unit selector
    U1 = np.moveaxis(u_matrix_e3nn(MAX_ELL, 0, 1), -1, 0)[0]
    b_scale = float(U1[0, 0])
    prod = b_scale * agg
    # readout: sum over C channels of prod / sqrt(C)
    expected = C * prod / math.sqrt(C)
    # forward runs in f32 (foundation tensors are cast); the
    # closed form is f64
    np.testing.assert_allclose(e, [expected, expected], rtol=1e-5)
