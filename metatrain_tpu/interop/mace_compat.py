"""Pure-JAX re-execution of a mace-torch MACE forward from an imported
foundation state dict (the interior-weight transplant, VERDICT r3 #3).

The reference wraps a live ``mace.modules.MACE`` module
(``/root/reference/src/metatrain/experimental/mace/model.py:198-231``);
this module evaluates the same function from the checkpoint's tensors
directly -- no mace-torch, no e3nn -- covering both interaction-block
classes real foundation files use (``RealAgnosticResidualInteractionBlock``,
mace's default, and the non-residual ``RealAgnosticInteractionBlock``
that mace's ``MACE`` model class pins as the FIRST interaction;
detected per block from the skip_tp weight count, see
``_interaction_class``), bessel radial basis, polynomial cutoff, silu
gate, linear + non-linear readouts, symmetric-contraction products. The convention-sensitive
pieces (real spherical harmonics, Wigner 3j, e3nn Linear /
TensorProduct normalizations) come from
:mod:`metatrain_tpu.interop.e3nn_compat`, whose 3j tensors are
numerically validated as intertwiners of its own spherical-harmonics
basis at build time. The symmetric-contraction U tensors are NOT
re-derived: mace registers them as buffers, so they ship inside the
foundation file and are consumed as-is (no basis-change risk).

Convention notes (documented assumptions, see PERF/STATUS docs):

- mace edge vectors point sender -> receiver = neighbor -> center,
  i.e. the NEGATIVE of this framework's NEF edge vectors; the sign is
  flipped before the spherical harmonics.
- the e3nn Wigner-3j GLOBAL SIGN per (l1, l2, l3) follows the
  Condon-Shortley complex 3j pushed through e3nn's documented
  ``(-i)^l`` real basis change; this is e3nn's own construction, but no
  e3nn installation exists in this environment to cross-check the
  result, so it is the one convention taken from spec rather than
  verified (flagged in ``tests/test_mace_compat.py``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .e3nn_compat import (
    irreps_dim,
    o3_linear,
    parse_irreps,
    sh_e3nn,
    split_irreps,
    tp_out_irreps_with_instructions,
    w3j,
)


#: E[silu(t)^2]^(1/2) under t ~ N(0,1): e3nn normalizes hidden
#: activations of FullyConnectedNet by this constant (computed by the
#: same Gauss-Hermite style estimate e3nn uses at import time)
def _act_norm_silu() -> float:
    t = np.linspace(-12.0, 12.0, 200001)
    pdf = np.exp(-0.5 * t * t) / math.sqrt(2 * math.pi)
    silu = t / (1.0 + np.exp(-t))
    integ = getattr(np, "trapezoid", np.trapz)
    return float(np.sqrt(integ(silu**2 * pdf, t)))


_SILU_NORM = _act_norm_silu()


def _silu(x, xp):
    return x / (1.0 + xp.exp(-x))


def fully_connected_net(x, layer_weights: Sequence, xp):
    """e3nn.nn.FullyConnectedNet forward: per layer ``x @ (w/sqrt(h_in))``
    with variance-normalized silu between layers (none after the last)."""
    n = len(layer_weights)
    for i, w in enumerate(layer_weights):
        h_in = w.shape[0]
        x = x @ (w / math.sqrt(h_in))
        if i < n - 1:
            x = _silu(x, xp) / _SILU_NORM
    return x


def bessel_basis(lengths, bessel_weights, r_max: float, xp):
    """mace BesselBasis: sqrt(2/r_max) * sin(w_n r) / r."""
    r = xp.clip(lengths, 1e-10, None)[..., None]
    return (
        math.sqrt(2.0 / r_max)
        * xp.sin(bessel_weights[None, :] * r)
        / r
    )


def polynomial_cutoff(lengths, r_max: float, p: int, xp):
    """mace PolynomialCutoff (Klicpera et al.): smooth to zero at r_max."""
    u = lengths / r_max
    f = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * u**p
        + p * (p + 2.0) * u ** (p + 1)
        - (p * (p + 1.0) / 2.0) * u ** (p + 2)
    )
    return xp.where(u < 1.0, f, 0.0)


def _conv_tp_uvu(
    node_blocks, sh_list, tp_weights, irreps_node, sh_lmax, target_irreps, xp
):
    """e3nn 'uvu' TensorProduct node_feats (x) edge_sh with per-edge
    weights (shared_weights=False), mace instruction enumeration.

    :param node_blocks: per-irrep (E, mul, 2l+1) sender features.
    :param sh_list: per-l (E, 2l+1) edge spherical harmonics.
    :param tp_weights: (E, n_paths * mul) flat per-edge weights in
        instruction order.
    :return: (out_blocks, irreps_out) with out_blocks per sorted output
        irrep (E, mul, 2l+1).
    """
    sh_irreps = [(1, l, (-1) ** l) for l in range(sh_lmax + 1)]
    irreps_out, instructions = tp_out_irreps_with_instructions(
        irreps_node, sh_irreps, target_irreps
    )
    # paths into each output (for e3nn path_normalization='element';
    # each 'uvu' path contributes fan mul_in2 = 1)
    n_into = [0] * len(irreps_out)
    for _, _, i_out, _ in instructions:
        n_into[i_out] += 1

    out_blocks: List[Optional[Any]] = [None] * len(irreps_out)
    # weights laid out in PRE-SORT enumeration order, mul entries each
    for i1, i2, i_out, pos in instructions:
        mul, l1, _ = irreps_node[i1]
        _, l2, _ = sh_irreps[i2]
        _, l3, _ = irreps_out[i_out]
        wslice = tp_weights[:, pos * mul : (pos + 1) * mul]  # (E, mul)
        W = xp.asarray(
            w3j(l1, l2, l3), dtype=node_blocks[0].dtype
        )  # (2l1+1, 2l2+1, 2l3+1), unit Frobenius
        alpha = math.sqrt((2 * l3 + 1) / n_into[i_out])
        contrib = alpha * xp.einsum(
            "eum,en,mnk,eu->euk",
            node_blocks[i1],
            sh_list[l2],
            W,
            wslice,
        )
        out_blocks[i_out] = (
            contrib if out_blocks[i_out] is None else out_blocks[i_out] + contrib
        )
    for i_out, (mul, l, _) in enumerate(irreps_out):
        if out_blocks[i_out] is None:
            out_blocks[i_out] = xp.zeros(
                (node_blocks[0].shape[0], mul, 2 * l + 1),
                dtype=node_blocks[0].dtype,
            )
    return out_blocks, irreps_out


def _skip_tp_scalar_attrs(node_blocks, attrs, weight_flat, irreps_in, irreps_out, xp):
    """e3nn FullyConnectedTensorProduct(node_feats, species_onehot ->
    irreps_out): with scalar attrs every path is (l, 0e) -> l, weight
    (mul_in, n_elements, mul_out) per path in instruction order,
    normalized by sqrt(mul_in * n_elements) (one path per output)."""
    n_el = attrs.shape[-1]
    out_blocks = []
    off = 0
    for mul_out, l_out, p_out in irreps_out:
        blk = None
        for i_in, (mul_in, l_in, p_in) in enumerate(irreps_in):
            if (l_in, p_in) != (l_out, p_out):
                continue
            size = mul_in * n_el * mul_out
            w = weight_flat[off : off + size].reshape(mul_in, n_el, mul_out)
            off += size
            contrib = xp.einsum(
                "aum,ae,uev->avm", node_blocks[i_in], attrs, w
            ) / math.sqrt(mul_in * n_el)
            blk = contrib if blk is None else blk + contrib
        if blk is None:
            blk = xp.zeros(
                (node_blocks[0].shape[0], mul_out, 2 * l_out + 1),
                dtype=node_blocks[0].dtype,
            )
        out_blocks.append(blk)
    if off != len(weight_flat):
        raise ValueError(
            f"skip_tp weight size mismatch: consumed {off} of "
            f"{len(weight_flat)}"
        )
    return out_blocks


def _symmetric_contraction(
    x_cat, attrs, contraction_state: Dict[str, Any], correlation: int, xp
):
    """mace SymmetricContraction.Contraction forward for ONE output
    irrep, consuming the SHIPPED U_matrix buffers.

    mace's recursion (symmetric_contraction.py): start from the highest
    order, repeatedly contract one copy of x:

        out = einsum(U_max, w_max[z], x)       (highest correlation)
        for nu = correlation-1 .. 1:
            c = einsum(U_nu, w_nu[z]) + out
            out = einsum(c, x)

    :param x_cat: (A, C, D) A-basis features, D = (lmax+1)^2.
    :param attrs: (A, n_elements) one-hot species.
    :param contraction_state: this contraction's tensors:
        ``U_matrix_{nu}`` buffers and ``weights_max`` / ``weights.{k}``.
    """
    D = x_cat.shape[-1]

    def U(nu):
        for key in (f"U_matrix_{nu}", f"U_{nu}", f"U_tensors.{nu}"):
            if key in contraction_state:
                return xp.asarray(
                    contraction_state[key], dtype=x_cat.dtype
                )
        raise KeyError(
            f"U matrix for correlation {nu} not found in the foundation "
            f"file (keys: {sorted(contraction_state)})"
        )

    w_max = xp.asarray(
        contraction_state["weights_max"], dtype=x_cat.dtype
    )  # (n_el, P_numax, C)
    Umax = U(correlation)
    # U layout (mace U_matrix_real): (..outM.., D * correlation, P):
    # leading 2L+1 axis only when L > 0
    # out = einsum("...ik,ekc,bci,be->bc...", U, w, x, attrs)
    out = xp.einsum(
        "...ik,ekc,bci,be->bc...", Umax, w_max, x_cat, attrs
    )
    for nu in range(correlation - 1, 0, -1):
        # mace appends ParameterList entries for nu = correlation-1..1
        w_nu = xp.asarray(
            contraction_state[f"weights.{correlation - 1 - nu}"],
            dtype=x_cat.dtype,
        )
        c_tensor = xp.einsum(
            "...k,ekc,be->bc...", U(nu), w_nu, attrs
        )
        c_tensor = c_tensor + out
        out = xp.einsum("bc...i,bci->bc...", c_tensor, x_cat)
    return out  # (A, C) for L=0, (A, C, 2L+1) for L>0


def validate_u_equivariance(
    state: Dict[str, Any], max_ell: int, correlation: int, atol: float = 3e-4
) -> None:
    """Assert the imported U-matrix buffers intertwine THIS module's
    spherical-harmonics basis.

    The transplant is only valid if the foundation file's e3nn basis and
    the compat layer's basis agree (same real-SH convention, same
    Wigner-3j signs). mace builds its U tensors from e3nn w3j products,
    so checking each shipped U against rotations derived from
    :func:`e3nn_compat.sh_e3nn` turns any convention mismatch into a
    LOUD import error instead of silently-wrong predictions.
    """
    from .e3nn_compat import _wigner_D_samples

    D_feat_dim = (max_ell + 1) ** 2
    rot_blocks = []  # per sample rotation: blockdiag over l
    n_rot = None
    per_l = [
        _wigner_D_samples(l)[1] for l in range(max_ell + 1)
    ]
    n_rot = len(per_l[0])
    for r in range(n_rot):
        blk = np.zeros((D_feat_dim, D_feat_dim))
        off = 0
        for l in range(max_ell + 1):
            w = 2 * l + 1
            blk[off : off + w, off : off + w] = per_l[l][r]
            off += w
        rot_blocks.append(blk)

    checked = 0
    for key in sorted(state):
        if ".U_matrix_" not in key:
            continue
        U = np.asarray(state[key], np.float64)
        nu = int(key.rsplit("_", 1)[1])
        # layout ([2L+1 when L>0], D x nu, P); infer the leading M axis
        has_m = U.ndim == nu + 2
        if not has_m and U.ndim != nu + 1:
            continue  # unknown layout: skip rather than misjudge
        if {U.shape[-2 - i] for i in range(nu)} != {D_feat_dim}:
            continue
        L_dim = U.shape[0] if has_m else 1
        # D_L from the output dimension
        L = (L_dim - 1) // 2
        D_L = (
            [np.eye(1)] * n_rot
            if L == 0
            else _wigner_D_samples(L)[1]
        )
        for r in range(n_rot):
            rotated = U if has_m else U[None]
            # rotate the output axis
            DL = D_L[r] if L > 0 else np.eye(1)
            rotated = np.einsum("mn,n...->m...", DL, rotated)
            # rotate each input feature axis
            for ax in range(nu):
                rotated = np.moveaxis(
                    np.einsum(
                        "ij,j...->i...",
                        rot_blocks[r],
                        np.moveaxis(rotated, 1 + ax, 0),
                    ),
                    0,
                    1 + ax,
                )
            base = U if has_m else U[None]
            dev = np.abs(rotated - base).max()
            scale = max(np.abs(base).max(), 1.0)
            if dev > atol * scale:
                raise ValueError(
                    f"foundation U buffer {key!r} does not intertwine "
                    f"this framework's spherical-harmonics basis "
                    f"(deviation {dev:.2e}); the file's e3nn convention "
                    "differs from the compat layer's -- refusing the "
                    "interior transplant (the baselines-only import "
                    "path still works)"
                )
        checked += 1
    if checked == 0:
        raise ValueError(
            "no U-matrix buffers found to validate -- cannot confirm "
            "basis-convention agreement for the interior transplant"
        )


class MACECompat:
    """Callable mace-torch-compatible forward over a foundation state.

    Parameters are the (converted, numpy) foundation tensors themselves;
    the object only stores static architecture facts so the forward is
    a pure function of ``(state, positions-dependent batch data)`` and
    can be jitted / differentiated / finetuned directly.
    """

    def __init__(self, config: Dict[str, Any]):
        self.r_max = float(config["r_max"])
        self.num_interactions = int(config["num_interactions"])
        self.correlation = int(config.get("correlation", 3))
        self.max_ell = int(config.get("max_ell", 3))
        self.num_elements = len(config["atomic_numbers"])
        C = int(config["num_channels"])
        self.num_channels = C
        hidden = config.get("hidden_irreps")
        lmax_h = int(config.get("hidden_lmax", 2))
        if hidden:
            self.hidden_irreps = parse_irreps(hidden)
        else:
            self.hidden_irreps = [
                (C, l, (-1) ** l) for l in range(lmax_h + 1)
            ]
        self.num_cutoff_basis = int(config.get("num_cutoff_basis", 5))
        self.avg_num_neighbors = float(
            config.get("avg_num_neighbors", 1.0) or 1.0
        )
        # interaction targets: C x (all sh parities) -- natural only
        self.interaction_irreps = [
            (C, l, (-1) ** l) for l in range(self.max_ell + 1)
        ]

    # -- helpers ----------------------------------------------------------

    def _scalars(self, irreps):
        return [(mul, l, p) for (mul, l, p) in irreps if l == 0]

    @staticmethod
    def _fctp_numel(irreps_in, irreps_out, n_el: int) -> int:
        """Weight count of FullyConnectedTensorProduct(in, scalar attrs
        -> out): one (mul_in, n_el, mul_out) path per matching irrep."""
        return sum(
            mi * n_el * mo
            for mi, li, pi in irreps_in
            for mo, lo, po in irreps_out
            if (li, pi) == (lo, po)
        )

    def _interaction_class(
        self, skip_numel: int, feats_irreps, out_irreps
    ) -> str:
        """Detect the mace interaction-block class from the skip_tp
        weight count (the two classes wire skip_tp differently):

        - ``RealAgnosticResidualInteractionBlock`` (mace default):
          ``skip_tp = FCTP(node_feats_irreps, attrs, hidden_irreps)``
          applied to the INPUT features; the product adds it (self
          connection).
        - ``RealAgnosticInteractionBlock`` (mace's pinned FIRST
          interaction for non-residual models):
          ``skip_tp = FCTP(target_irreps, attrs, target_irreps)``
          applied to the MESSAGE after ``linear``; no self connection
          in the product (``use_sc=False``).

        Ambiguity (equal counts — only when the irreps coincide) resolves
        to residual, mace's default.  Unknown counts refuse loudly.
        Ref: mace/modules/blocks.py (upstream), wrapped by
        ``/root/reference/src/metatrain/experimental/mace/model.py:125-183``.
        """
        n_el = self.num_elements
        n_res = self._fctp_numel(feats_irreps, out_irreps, n_el)
        n_nonres = self._fctp_numel(
            self.interaction_irreps, self.interaction_irreps, n_el
        )
        if skip_numel == n_res:
            return "residual"
        if skip_numel == n_nonres:
            return "nonresidual"
        raise ValueError(
            f"unrecognized MACE interaction class: skip_tp carries "
            f"{skip_numel} weights; expected {n_res} "
            f"(RealAgnosticResidualInteractionBlock) or {n_nonres} "
            f"(RealAgnosticInteractionBlock) — refusing the interior "
            f"transplant for an unknown block layout (the baselines-only "
            f"import path still works)"
        )

    def forward(self, state: Dict[str, Any], batch_data: Dict[str, Any], xp):
        """Per-atom interaction energies (A,) BEFORE scale/shift and
        atomic baselines (those ride the composition/scaler models).

        ``batch_data``: species_onehot (A, n_el), edge vectors in NEF
        layout (A, M, 3) pointing center -> neighbor, distances (A, M),
        nbr_indices (A, M), nbr_mask (A, M).
        """
        C = self.num_channels
        onehot = batch_data["species_onehot"]
        A = onehot.shape[0]
        nbr_idx = batch_data["nbr_indices"]
        mask = batch_data["nbr_mask"]
        AM = nbr_idx.size

        def g(name):
            return xp.asarray(state[name], dtype=xp.float32)

        # node embedding: Linear(onehot scalars -> C scalars)
        node_feats_scalar = o3_linear(
            onehot,
            g("node_embedding.linear.weight").reshape(-1),
            [(self.num_elements, 0, 1)],
            [(C, 0, 1)],
            xp=xp,
        )  # (A, C)
        feats_irreps: List[Tuple[int, int, int]] = [(C, 0, 1)]
        feats_blocks = [node_feats_scalar[:, :, None]]  # (A, C, 1)

        # edges: mace vectors point sender->receiver = -(our NEF vector)
        vec = -batch_data["edge_vectors"].reshape(AM, 3)
        lengths = batch_data["edge_distances"].reshape(AM)
        sh = sh_e3nn(vec, self.max_ell, xp=xp)
        bessel_w = g("radial_embedding.bessel_fn.bessel_weights")
        edge_feats = bessel_basis(lengths, bessel_w, self.r_max, xp)
        cut = polynomial_cutoff(
            lengths, self.r_max, self.num_cutoff_basis, xp
        )
        edge_feats = edge_feats * cut[:, None]
        edge_mask = mask.reshape(AM).astype(xp.float32)

        sender = nbr_idx.reshape(AM)
        avg_nbrs = self.avg_num_neighbors

        node_energies = xp.zeros((A,), dtype=xp.float32)
        for i in range(self.num_interactions):
            # mace restricts to scalars only for layers built in its
            # ``range(num_interactions - 1)`` loop (models.py): the FIRST
            # interaction always outputs the full hidden irreps, so a
            # single-interaction model is never scalar-restricted
            last = (
                i == self.num_interactions - 1 and self.num_interactions > 1
            )
            pre = f"interactions.{i}."
            out_irreps = (
                self._scalars(self.hidden_irreps) if last else self.hidden_irreps
            )

            skip_w = g(pre + "skip_tp.weight").reshape(-1)
            klass = self._interaction_class(
                skip_w.size, feats_irreps, out_irreps
            )
            if klass == "residual":
                # residual skip from the INPUT features
                sc_blocks = _skip_tp_scalar_attrs(
                    feats_blocks,
                    onehot,
                    skip_w,
                    feats_irreps,
                    out_irreps,
                    xp=xp,
                )
            else:
                sc_blocks = None  # skip_tp acts on the message below

            up = o3_linear(
                xp.concatenate(
                    [b.reshape(A, -1) for b in feats_blocks], axis=-1
                ),
                g(pre + "linear_up.weight").reshape(-1),
                feats_irreps,
                feats_irreps,
                xp=xp,
            )
            up_blocks = split_irreps(up, feats_irreps, xp=xp)

            # radial MLP -> per-edge TP weights
            layer_names = [
                k
                for k in sorted(state)
                if k.startswith(pre + "conv_tp_weights.layer")
                and k.endswith(".weight")
            ]
            tp_w = fully_connected_net(
                edge_feats, [g(k) for k in layer_names], xp
            )
            tp_w = tp_w * edge_mask[:, None]

            sender_blocks = [b[sender] for b in up_blocks]
            msg_blocks, mid_irreps = _conv_tp_uvu(
                sender_blocks,
                sh,
                tp_w,
                feats_irreps,
                self.max_ell,
                self.interaction_irreps,
                xp=xp,
            )
            # scatter back to centers: NEF rows ARE (center, slot)
            M = nbr_idx.shape[1]
            agg_blocks = [
                xp.sum(
                    b.reshape((A, M) + b.shape[1:]), axis=1
                )
                / avg_nbrs
                for b in msg_blocks
            ]
            mlin = o3_linear(
                xp.concatenate(
                    [b.reshape(A, -1) for b in agg_blocks], axis=-1
                ),
                g(pre + "linear.weight").reshape(-1),
                mid_irreps,
                self.interaction_irreps,
                xp=xp,
            )

            # product basis: symmetric contractions on (A, C, D) stack
            # (mace reshape_irreps: per-irrep (A, C, 2l+1) blocks
            # concatenated on the last axis -- NOT a flat reshape, the
            # e3nn packing is l-major)
            mlin_blocks = split_irreps(
                mlin, self.interaction_irreps, xp=xp
            )
            if klass == "nonresidual":
                # RealAgnosticInteractionBlock: skip_tp mixes the MESSAGE
                # with the species one-hot (target -> target irreps)
                mlin_blocks = _skip_tp_scalar_attrs(
                    mlin_blocks,
                    onehot,
                    skip_w,
                    self.interaction_irreps,
                    self.interaction_irreps,
                    xp=xp,
                )
            x_cat = xp.concatenate(mlin_blocks, axis=-1)
            ppre = f"products.{i}.symmetric_contractions.contractions."
            prod_blocks = []
            for j, (mul_out, l_out, p_out) in enumerate(out_irreps):
                cstate = {
                    k[len(ppre) + len(str(j)) + 1 :]: state[k]
                    for k in state
                    if k.startswith(f"{ppre}{j}.")
                }
                out = _symmetric_contraction(
                    x_cat, onehot, cstate, self.correlation, xp
                )
                if out.ndim == 2:
                    out = out[:, :, None]
                prod_blocks.append(out)
            plin = o3_linear(
                xp.concatenate(
                    [b.reshape(A, -1) for b in prod_blocks], axis=-1
                ),
                g(f"products.{i}.linear.weight").reshape(-1),
                out_irreps,
                out_irreps,
                xp=xp,
            )
            new_blocks = split_irreps(plin, out_irreps, xp=xp)
            if sc_blocks is not None:
                feats_blocks = [
                    nb + sb for nb, sb in zip(new_blocks, sc_blocks)
                ]
            else:
                # non-residual block: no self connection in the product
                # (mace EquivariantProductBasisBlock use_sc=False)
                feats_blocks = list(new_blocks)
            feats_irreps = out_irreps

            # readout on the scalar channel
            scal = feats_blocks[0][:, :, 0]  # (A, C)
            rpre = f"readouts.{i}."
            if (rpre + "linear.weight") in state:
                e = o3_linear(
                    scal,
                    g(rpre + "linear.weight").reshape(-1),
                    [(C, 0, 1)],
                    [(1, 0, 1)],
                    xp=xp,
                )[:, 0]
            else:
                h_dim = state[rpre + "linear_1.weight"].size // C
                h = o3_linear(
                    scal,
                    g(rpre + "linear_1.weight").reshape(-1),
                    [(C, 0, 1)],
                    [(h_dim, 0, 1)],
                    xp=xp,
                )
                # e3nn.nn.Activation normalizes the act's second moment
                h = _silu(h, xp) / _SILU_NORM
                e = o3_linear(
                    h,
                    g(rpre + "linear_2.weight").reshape(-1),
                    [(h_dim, 0, 1)],
                    [(1, 0, 1)],
                    xp=xp,
                )[:, 0]
            node_energies = node_energies + e

        return node_energies
