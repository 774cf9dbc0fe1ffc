"""e3nn convention layer for consuming mace-torch foundation weights.

mace-torch parameterizes its model in e3nn's real irrep basis; importing
a foundation checkpoint's interior weights therefore requires evaluating
the SAME basis and the SAME normalization conventions, without e3nn
installed. This module implements them from e3nn's public specification
(arXiv:2207.09453 and the e3nn docs), with the key convention-sensitive
object -- the real Wigner 3j tensor -- cross-validated NUMERICALLY at
build time: the tensor produced by the complex-basis construction must
intertwine the rotation matrices derived from this module's own
spherical harmonics (assertion in :func:`w3j`), so any inconsistency
between the implemented conventions fails loudly instead of silently
producing a wrong basis.

Conventions implemented (e3nn 0.5.x, as consumed by mace-torch 0.3.x):

- **Real spherical harmonics**: ``normalization='component'``
  (``|Y^l(x)|^2 = 2l+1`` for unit x), input-normalized, with e3nn's
  component ordering: for l=1 the components are ``(y, z, x)``; general
  l follows the same real basis (m = -l..l with x <-> m=+1, y <-> m=-1,
  z <-> m=0 at l=1).
- **Real-to-complex basis change** with the ``(-i)^l`` global phase
  that makes the real 3j symbols real.
- **Wigner 3j** normalized to unit Frobenius norm (e3nn convention).

Reference usage: ``/root/reference/src/metatrain/experimental/mace/
model.py:198-231`` constructs ``mace.modules.MACE`` whose weights this
layer re-executes.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import numpy as np


# -- real spherical harmonics (e3nn component normalization) ---------------


def sh_e3nn(vectors, lmax: int, xp=np):
    """e3nn real spherical harmonics of normalized ``vectors``.

    :param vectors: (..., 3) Cartesian vectors (normalized internally;
        zero vectors yield zeros beyond l=0).
    :param lmax: maximum degree (supported up to 3 -- mace default).
    :return: list of (..., 2l+1) arrays, l = 0..lmax, component
        normalization (norm^2 = 2l+1 on the unit sphere).

    Explicit polynomials in e3nn's ordering: l=1 is (y, z, x); higher l
    use the corresponding real tesseral basis in m = -l..l order.
    """
    if lmax > 3:
        raise NotImplementedError("sh_e3nn implemented for lmax <= 3")
    v = vectors
    n = xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))
    u = v / xp.where(n > 0, n, 1.0)
    x, y, z = u[..., 0], u[..., 1], u[..., 2]

    out = [xp.ones(u.shape[:-1] + (1,), dtype=v.dtype)]
    if lmax >= 1:
        s3 = math.sqrt(3.0)
        out.append(xp.stack([s3 * y, s3 * z, s3 * x], axis=-1))
    if lmax >= 2:
        s15, s5 = math.sqrt(15.0), math.sqrt(5.0)
        out.append(
            xp.stack(
                [
                    s15 * x * y,
                    s15 * y * z,
                    s5 * 0.5 * (3.0 * z * z - 1.0),
                    s15 * x * z,
                    s15 * 0.5 * (x * x - y * y),
                ],
                axis=-1,
            )
        )
    if lmax >= 3:
        # standard real tesseral harmonics, component-normalized
        c = [
            math.sqrt(35.0 / 8.0),   # m = +-3
            math.sqrt(105.0),        # m = +-2 (xy z / (x^2-y^2) z)
            math.sqrt(21.0 / 8.0),   # m = +-1
            math.sqrt(7.0) * 0.5,    # m = 0
        ]
        out.append(
            xp.stack(
                [
                    c[0] * y * (3.0 * x * x - y * y),
                    c[1] * x * y * z,
                    c[2] * y * (5.0 * z * z - 1.0),
                    c[3] * z * (5.0 * z * z - 3.0),
                    c[2] * x * (5.0 * z * z - 1.0),
                    c[1] * 0.5 * z * (x * x - y * y),
                    c[0] * x * (x * x - 3.0 * y * y),
                ],
                axis=-1,
            )
        )
    return out


@functools.lru_cache(maxsize=None)
def _wigner_D_samples(l: int, seed: int = 0):
    """Sample rotations and their degree-l representation matrices,
    derived purely from :func:`sh_e3nn` (so they carry ITS basis):
    D_l(R) solves Y_l(R x_i) = D_l(R) Y_l(x_i) over sample points."""
    rng = np.random.default_rng(seed)
    rotations = []
    for _ in range(3):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        rotations.append(q)
    pts = rng.normal(size=(max(64, 4 * (2 * l + 1) ** 2), 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    Ds = []
    Y = sh_e3nn(pts, l)[l]  # (N, 2l+1)
    for R in rotations:
        Yr = sh_e3nn(pts @ R.T, l)[l]
        # D such that Yr = Y @ D.T  ->  D.T = lstsq(Y, Yr)
        DT, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
        Ds.append(DT.T)
    return rotations, Ds


def _complex_w3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Complex-basis Wigner 3j from Clebsch-Gordan coefficients
    (Condon-Shortley): 3j[m1,m2,m3] = (-1)^(l1-l2-m3)/sqrt(2l3+1)
    <l1 m1 l2 m2 | l3 -m3>."""
    from ..ops.cg import clebsch_gordan

    w = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    for i1, m1 in enumerate(range(-l1, l1 + 1)):
        for i2, m2 in enumerate(range(-l2, l2 + 1)):
            for i3, m3 in enumerate(range(-l3, l3 + 1)):
                phase = (-1.0) ** (l1 - l2 - m3)
                w[i1, i2, i3] = (
                    phase
                    / math.sqrt(2 * l3 + 1)
                    * clebsch_gordan(l1, m1, l2, m2, l3, -m3)
                )
    return w


def _real_to_complex(l: int) -> np.ndarray:
    """e3nn change-of-basis q with the (-i)^l phase: complex Y^l_m =
    sum_m' q[m, m'] realY^l_{m'} (rows complex m=-l..l, cols real)."""
    q = np.zeros((2 * l + 1, 2 * l + 1), dtype=complex)
    for m in range(-l, 0):
        q[l + m, l + abs(m)] = 1.0 / math.sqrt(2)
        q[l + m, l - abs(m)] = -1j / math.sqrt(2)
    q[l, l] = 1.0
    for m in range(1, l + 1):
        q[l + m, l + abs(m)] = ((-1.0) ** m) / math.sqrt(2)
        q[l + m, l - abs(m)] = (1j * (-1.0) ** m) / math.sqrt(2)
    return ((-1j) ** l) * q


@functools.lru_cache(maxsize=None)
def w3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """e3nn real Wigner 3j tensor (unit Frobenius norm), validated as an
    intertwiner of this module's own spherical-harmonics basis."""
    w_c = _complex_w3j(l1, l2, l3)
    q1 = _real_to_complex(l1)
    q2 = _real_to_complex(l2)
    q3 = _real_to_complex(l3)
    w = np.einsum("abc,ai,bj,ck->ijk", w_c, q1.conj(), q2.conj(), q3.conj())
    if np.abs(w.imag).max() > 1e-10:
        w = np.einsum("abc,ai,bj,ck->ijk", w_c, q1, q2, q3)
    assert np.abs(w.imag).max() < 1e-10, (
        f"real 3j ({l1},{l2},{l3}) came out complex -- basis-change "
        "phase convention inconsistent"
    )
    w = w.real
    w = w / np.linalg.norm(w)  # e3nn: unit Frobenius norm

    # cross-validation: w must intertwine the rotations DERIVED FROM
    # sh_e3nn, i.e. w is invariant under D1 x D2 x D3 for every R
    rots1, D1s = _wigner_D_samples(l1)
    _, D2s = _wigner_D_samples(l2)
    _, D3s = _wigner_D_samples(l3)
    for D1, D2, D3 in zip(D1s, D2s, D3s):
        w_rot = np.einsum("abc,ia,jb,kc->ijk", w, D1, D2, D3)
        assert np.abs(w_rot - w).max() < 1e-8, (
            f"real 3j ({l1},{l2},{l3}) does not intertwine the "
            "sh_e3nn-derived rotations -- convention mismatch"
        )
    return w


# -- irreps bookkeeping ----------------------------------------------------


def parse_irreps(spec: str) -> List[Tuple[int, int, int]]:
    """``"128x0e + 128x1o"`` -> [(128, 0, 1), (128, 1, -1)] as
    (multiplicity, l, parity)."""
    out = []
    for term in spec.replace(" ", "").split("+"):
        if not term:
            continue
        mul_str, ir = term.split("x")
        l = int(ir[:-1])
        p = 1 if ir[-1] == "e" else -1
        out.append((int(mul_str), l, p))
    return out


def irreps_dim(irreps: Sequence[Tuple[int, int, int]]) -> int:
    return sum(mul * (2 * l + 1) for mul, l, _ in irreps)


def split_irreps(x, irreps, xp=np):
    """Split a (..., dim) array into per-irrep (..., mul, 2l+1) blocks."""
    blocks = []
    off = 0
    for mul, l, _ in irreps:
        d = mul * (2 * l + 1)
        blocks.append(
            x[..., off : off + d].reshape(x.shape[:-1] + (mul, 2 * l + 1))
        )
        off += d
    return blocks


def cat_irreps(blocks, xp=np):
    return xp.concatenate(
        [b.reshape(b.shape[:-2] + (-1,)) for b in blocks], axis=-1
    )


# -- e3nn o3.Linear --------------------------------------------------------


def o3_linear(x, weight_flat, irreps_in, irreps_out, xp=np):
    """e3nn ``o3.Linear(irreps_in, irreps_out)`` forward.

    Weights are stored flat, one (mul_in, mul_out) block per connectable
    (input irrep, output irrep) pair in (out-major? no --) e3nn
    instruction order: for each output irrep, over each matching input
    irrep, in declaration order -- e3nn enumerates instructions as
    ``[(i_in, i_out) for i_in ... for i_out ... if ir_in == ir_out]``
    iterating inputs in the OUTER loop. Forward normalizes each output
    by 1/sqrt(fan_in) with fan_in = sum of mul_in over contributing
    paths (path_normalization='element', irrep_normalization='component'
    defaults).
    """
    x_blocks = split_irreps(x, irreps_in, xp=xp)
    out_blocks = [None] * len(irreps_out)
    fan = [0] * len(irreps_out)
    for i_in, (mul_in, l_in, p_in) in enumerate(irreps_in):
        for i_out, (mul_out, l_out, p_out) in enumerate(irreps_out):
            if (l_in, p_in) == (l_out, p_out):
                fan[i_out] += mul_in
    off = 0
    for i_in, (mul_in, l_in, p_in) in enumerate(irreps_in):
        for i_out, (mul_out, l_out, p_out) in enumerate(irreps_out):
            if (l_in, p_in) != (l_out, p_out):
                continue
            w = weight_flat[off : off + mul_in * mul_out].reshape(
                mul_in, mul_out
            )
            off += mul_in * mul_out
            contrib = xp.einsum(
                "...um,uv->...vm", x_blocks[i_in], w
            ) / math.sqrt(max(fan[i_out], 1))
            out_blocks[i_out] = (
                contrib
                if out_blocks[i_out] is None
                else out_blocks[i_out] + contrib
            )
    for i_out, (mul_out, l_out, _) in enumerate(irreps_out):
        if out_blocks[i_out] is None:
            out_blocks[i_out] = xp.zeros(
                x.shape[:-1] + (mul_out, 2 * l_out + 1), dtype=x.dtype
            )
    if off != len(weight_flat):
        raise ValueError(
            f"o3.Linear weight size mismatch: consumed {off} of "
            f"{len(weight_flat)}"
        )
    return cat_irreps(out_blocks, xp=xp)


# -- mace's conv_tp instruction enumeration --------------------------------


def tp_out_irreps_with_instructions(
    irreps1, irreps2, target_irreps
) -> Tuple[list, list]:
    """mace.modules.irreps_tools.tp_out_irreps_with_instructions:
    enumerate 'uvu' instructions for node_feats (x) edge_sh whose output
    irrep appears in the target; outputs sorted, instructions remapped.

    Returns ``(irreps_out, instructions)`` with instructions
    ``(i1, i2, i_out_sorted, trainable_order)`` where
    ``trainable_order`` is the PRE-SORT enumeration position -- the
    per-edge weight vector from the radial MLP is laid out in that
    order (e3nn TensorProduct consumes weights in instruction-list
    order, which mace builds pre-sort).
    """
    target = {(l, p) for _, l, p in target_irreps}
    unsorted_out = []  # (mul, l, p)
    instructions = []  # (i1, i2, unsorted_out_index)
    for i1, (mul, l1, p1) in enumerate(irreps1):
        for i2, (_mul2, l2, p2) in enumerate(irreps2):
            for l_out in range(abs(l1 - l2), l1 + l2 + 1):
                p_out = p1 * p2
                if (l_out, p_out) in target:
                    k = len(unsorted_out)
                    unsorted_out.append((mul, l_out, p_out))
                    instructions.append((i1, i2, k))
    # sort outputs by (l, p) (e3nn Irreps.sort: by ir = (l, p) with
    # even before odd at same l: e3nn orders parity +1 ("e") first via
    # ir comparison (l, -p)? e3nn Irrep ordering: (l, p) with p=+1
    # sorting BEFORE p=-1 at equal l is NOT the rule -- e3nn sorts by
    # (l, p) where p in {-1, 1} and uses (l, p*(-1)**l)?? mace's outputs
    # here come out naturally grouped; we sort stably by (l, p != (-1)**l)
    # which matches e3nn's ir.__lt__ = (l, p*(-1)^l < ...) convention
    order = sorted(
        range(len(unsorted_out)),
        key=lambda k: (
            unsorted_out[k][1],
            -unsorted_out[k][2] * (-1) ** unsorted_out[k][1],
        ),
    )
    perm = {old: new for new, old in enumerate(order)}
    irreps_out = [unsorted_out[k] for k in order]
    instructions = [
        (i1, i2, perm[k], pos)
        for pos, (i1, i2, k) in enumerate(instructions)
    ]
    return irreps_out, instructions
