"""SOAP-BPNN neural modules (flax).

TPU-first re-design of the reference ``src/metatrain/soap_bpnn``: the
spherical expansion runs on the NEF layout as three fused contractions
(radial basis x species channel x spherical harmonics -> one einsum onto
the MXU), the power spectrum is one batched self-outer-product per l, and
the per-species Behler-Parrinello MLPs are *gathered* batched matmuls
(weights indexed by species) instead of one module per species --
identical math to ``MLPMap`` (reference ``soap_bpnn/model.py:50-94``)
with no species loop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.radial import radial_basis
from ...ops.spherical import real_spherical_harmonics


class SphericalExpansion(nn.Module):
    """Density expansion coefficients on the NEF layout.

    ``c[i, a, n, l, m] = sum_j w_a(z_j) R_n(r_ij) Y_lm(u_ij)`` where
    ``w_a`` is either a one-hot species channel (legacy / "Orthogonal")
    or a learned alchemical pseudo-species embedding (reference
    torch-spex usage at ``soap_bpnn/modules/power_spectrum.py:42-53``).
    """

    cutoff: float
    cutoff_width: float
    max_angular: int
    max_radial: int
    num_species: int
    num_pseudo_species: int = 0  # 0 -> one-hot species channels
    radial_kind: str = "bessel"
    #: torch-spex compat: ((values rows...), (derivative rows...),
    #: spacing, (n_per_l...)) -- the checkpoint's splined radial basis
    #: with per-l function counts; hashable tuples (static module field)
    spex_spline: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, edge_vectors, edge_distances, nbr_species_index, nbr_mask):
        A, M = edge_distances.shape

        unit = edge_vectors / jnp.maximum(edge_distances, 1e-10)[:, :, None]
        sph = jnp.concatenate(
            real_spherical_harmonics(unit, self.max_angular), axis=-1
        ).astype(self.dtype)  # (A, M, (l_max+1)^2)
        sph = jnp.where(nbr_mask[:, :, None], sph, 0.0)

        if self.num_pseudo_species > 0:
            species_w = nn.Embed(
                self.num_species,
                self.num_pseudo_species,
                dtype=self.dtype,
                name="alchemical_embedding",
            )(nbr_species_index)  # (A, M, a)
        else:
            species_w = jax.nn.one_hot(
                nbr_species_index, self.num_species, dtype=self.dtype
            )

        if self.spex_spline is not None:
            # imported reference descriptor: evaluate the checkpoint's
            # spline (exact spex radial) x shifted-cosine cutoff; per-l
            # radial counts -> a LIST of per-l coefficient stacks
            from ...ops.radial import cosine_cutoff, hermite_spline_basis

            values, derivs, spacing, n_per_l = self.spex_spline
            rb_all = hermite_spline_basis(
                edge_distances,
                jnp.asarray(values, self.dtype),
                jnp.asarray(derivs, self.dtype),
                float(spacing),
            )
            cut = cosine_cutoff(
                edge_distances, self.cutoff, self.cutoff_width
            ).astype(self.dtype)
            rb_all = rb_all * cut[:, :, None]
            rb_all = jnp.where(nbr_mask[:, :, None], rb_all, 0.0)
            coeffs_per_l = []
            off_n = 0
            off_m = 0
            acc = jnp.promote_types(jnp.float32, self.dtype)
            for l, n_l in enumerate(n_per_l):
                rb = rb_all[:, :, off_n : off_n + n_l]
                sph_l = sph[:, :, off_m : off_m + 2 * l + 1]
                chan = (
                    species_w[:, :, :, None] * rb[:, :, None, :]
                ).reshape(A, M, -1)
                coeffs_per_l.append(
                    jnp.einsum(
                        "amc,aml->acl",
                        chan,
                        sph_l,
                        preferred_element_type=acc,
                    )
                )
                off_n += n_l
                off_m += 2 * l + 1
            return coeffs_per_l

        n_max = self.max_radial + 1
        rb = radial_basis(
            edge_distances,
            self.cutoff,
            n_max,
            self.radial_kind,
            self.cutoff_width,
        )  # (A, M, n)
        rb = jnp.where(nbr_mask[:, :, None], rb, 0.0).astype(self.dtype)

        # fuse radial x species channel, then contract against harmonics:
        # (A, M, a*n) x (A, M, L) -> (A, a*n, L) -- batched MXU matmul
        chan = (species_w[:, :, :, None] * rb[:, :, None, :]).reshape(
            A, M, -1
        )
        coeffs = jnp.einsum(
            "amc,aml->acl",
            chan,
            sph,
            preferred_element_type=jnp.promote_types(jnp.float32, chan.dtype),
        )
        return coeffs  # (A, n_channels, (l_max+1)^2)


def power_spectrum(coeffs, max_angular: int) -> jnp.ndarray:
    """SOAP power spectrum: per-l invariant contraction
    ``p[i, c, c'] = sum_m c[i, c, lm] c[i, c', lm]``
    (reference ``power_spectrum.py:127-137``), concatenated over l.

    ``coeffs`` is either a single (A, C, (lmax+1)^2) stack (native
    basis: same radial count per l) or a per-l LIST of (A, C_l, 2l+1)
    stacks (spex-compat imports: per-l radial counts)."""
    if isinstance(coeffs, (list, tuple)):
        A = coeffs[0].shape[0]
        acc_dtype = jnp.promote_types(jnp.float32, coeffs[0].dtype)
        blocks = []
        for c_l in coeffs:
            C_l = c_l.shape[1]
            p_l = jnp.einsum(
                "acm,adm->acd", c_l, c_l, preferred_element_type=acc_dtype
            )
            blocks.append(p_l.reshape(A, C_l * C_l))
        return jnp.concatenate(blocks, axis=1)
    A, C, _ = coeffs.shape
    acc_dtype = jnp.promote_types(jnp.float32, coeffs.dtype)
    blocks = []
    offset = 0
    for l in range(max_angular + 1):
        c_l = coeffs[:, :, offset : offset + 2 * l + 1]
        offset += 2 * l + 1
        p_l = jnp.einsum(
            "acm,adm->acd", c_l, c_l, preferred_element_type=acc_dtype
        )
        blocks.append(p_l.reshape(A, C * C))
    return jnp.concatenate(blocks, axis=1)


class SpeciesMLP(nn.Module):
    """Per-species MLP as gathered batched matmuls.

    The reference builds one ``nn.Sequential`` per species and routes
    blocks by ``center_type`` keys (``MLPMap``); here every atom picks its
    species' weight slices, so one einsum serves all species at once.
    """

    num_species: int
    d_in: int
    d_hidden: int
    num_hidden_layers: int
    d_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, species_index):
        h = features.astype(self.dtype)
        d_prev = self.d_in
        for layer in range(self.num_hidden_layers):
            W = self.param(
                f"W_{layer}",
                nn.initializers.lecun_normal(),
                (self.num_species, d_prev, self.d_hidden),
            )
            b = self.param(
                f"b_{layer}", nn.initializers.zeros, (self.num_species, self.d_hidden)
            )
            W_atom = W[species_index].astype(self.dtype)
            b_atom = b[species_index].astype(self.dtype)
            h = (
                jnp.einsum(
                    "ad,adh->ah",
                    h,
                    W_atom,
                    preferred_element_type=jnp.promote_types(
                        jnp.float32, self.dtype
                    ),
                ).astype(self.dtype)
                + b_atom
            )
            h = jax.nn.silu(h)
            d_prev = self.d_hidden
        W_out = self.param(
            "W_out",
            nn.initializers.lecun_normal(),
            (self.num_species, d_prev, self.d_out),
        )
        b_out = self.param(
            "b_out", nn.initializers.zeros, (self.num_species, self.d_out)
        )
        out = jnp.einsum(
            "ad,ado->ao",
            h,
            W_out[species_index].astype(self.dtype),
            preferred_element_type=jnp.promote_types(jnp.float32, self.dtype),
        )
        return out + b_out[species_index].astype(out.dtype)


class SpeciesLayerNorm(nn.Module):
    """Per-species LayerNorm (reference ``LayerNormMap``): per-species
    scale/offset over shared normalized features."""

    num_species: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, species_index):
        mean = jnp.mean(features, axis=-1, keepdims=True)
        var = jnp.var(features, axis=-1, keepdims=True)
        normalized = (features - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param(
            "scale", nn.initializers.ones, (self.num_species, self.dim)
        )
        offset = self.param(
            "offset", nn.initializers.zeros, (self.num_species, self.dim)
        )
        return normalized * scale[species_index] + offset[species_index]


class TensorBasis(nn.Module):
    """Equivariant basis for (lambda, sigma) spherical targets.

    Counterpart of the reference ``soap_bpnn/modules/tensor_basis.py``
    (``TensorBasis``/``ClebschGordanReal`` on sphericart + wigners): basis
    covariants are CG couplings of pairs of spherical-expansion vectors,
    ``b^{p}_{mu} = sum_{m1 m2} CG^{l1 l2 lam}_{m1 m2 mu} c^{l1}_{m1}
    c^{l2}_{m2}``, restricted to parity-matching paths
    ``sigma = (-1)^{l1+l2+lam}``; predictions are invariant-feature
    coefficients contracted against the basis.
    """

    o3_lambda: int
    o3_sigma: int
    max_angular: int
    num_properties: int
    add_lambda_basis: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coeffs: jnp.ndarray, invariants: jnp.ndarray):
        """:param coeffs: spherical expansion (A, C, (l_max+1)^2).
        :param invariants: per-atom scalar features (A, F).
        :return: (A, 2*lambda+1, num_properties)."""
        from ...ops.cg import real_clebsch_gordan

        lam = self.o3_lambda
        A, C, _ = coeffs.shape
        acc = jnp.promote_types(jnp.float32, self.dtype)

        offsets = np.cumsum([0] + [2 * l + 1 for l in range(self.max_angular + 1)])
        basis_vectors = []
        for l1 in range(self.max_angular + 1):
            for l2 in range(l1, self.max_angular + 1):
                if not (abs(l1 - l2) <= lam <= l1 + l2):
                    continue
                if (-1) ** (l1 + l2 + lam) != self.o3_sigma:
                    continue
                cg = jnp.asarray(real_clebsch_gordan(l1, l2, lam), dtype=acc)
                c1 = coeffs[:, :, offsets[l1] : offsets[l1 + 1]]
                c2 = coeffs[:, :, offsets[l2] : offsets[l2 + 1]]
                # couple, contracting channels diagonally (keeps the basis
                # compact: C vectors per path instead of C^2)
                vec = jnp.einsum(
                    "acm,acn,mnk->ack", c1, c2, cg, preferred_element_type=acc
                )
                basis_vectors.append(vec)
        if self.add_lambda_basis and lam <= self.max_angular and self.o3_sigma == 1:
            # direct l = lambda expansion term (reference add_lambda_basis)
            basis_vectors.append(
                coeffs[:, :, offsets[lam] : offsets[lam + 1]].astype(acc)
            )
        if not basis_vectors:
            return jnp.zeros(
                (A, 2 * lam + 1, self.num_properties), dtype=jnp.float32
            )
        basis = jnp.concatenate(basis_vectors, axis=1)  # (A, P_basis, 2lam+1)
        n_basis = basis.shape[1]

        weights = nn.Dense(
            n_basis * self.num_properties,
            dtype=self.dtype,
            name="coefficients",
        )(invariants)
        weights = weights.reshape(A, n_basis, self.num_properties).astype(acc)
        return jnp.einsum(
            "abk,abp->akp", basis, weights, preferred_element_type=acc
        )


class SoapBpnnModule(nn.Module):
    """Full SOAP-BPNN: expansion -> power spectrum -> per-species MLP ->
    per-target heads (linear or MLP) -> per-block last layers."""

    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    head_types: Dict[str, str]
    target_specs: Dict[str, Any] = None  # name -> list of per-block specs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any], requested: Sequence[str]):
        hp = self.hypers
        soap = hp["soap"]
        max_angular = soap["max_angular"]

        spex = hp.get("spex_compat")
        coeffs = SphericalExpansion(
            cutoff=soap["cutoff"]["radius"],
            cutoff_width=soap["cutoff"]["width"],
            max_angular=max_angular,
            max_radial=soap["max_radial"],
            num_species=self.num_species,
            num_pseudo_species=0 if hp["legacy"] else hp.get(
                "num_pseudo_species", 4
            ),
            spex_spline=(
                tuple(tuple(row) for row in spex["spline_values"]),
                tuple(tuple(row) for row in spex["spline_derivatives"]),
                float(spex["spline_spacing"]),
                tuple(spex["n_per_l"]),
            )
            if spex
            else None,
            dtype=self.dtype,
            name="spherical_expansion",
        )(
            batch_data["edge_vectors"],
            batch_data["edge_distances"],
            batch_data["neighbor_species_index"],
            batch_data["nbr_mask"],
        )
        features = power_spectrum(coeffs, max_angular).astype(self.dtype)
        if spex:
            for name, specs in (self.target_specs or {}).items():
                if any(s["type"] != "scalar" for s in specs):
                    raise NotImplementedError(
                        "spex-compat imported descriptors serve scalar "
                        f"targets only (target {name!r})"
                    )

        species_index = batch_data["species_index"]
        bpnn = hp["bpnn"]
        if hp["legacy"]:
            if bpnn["layernorm"]:
                features = SpeciesLayerNorm(
                    self.num_species, features.shape[-1], self.dtype,
                    name="layernorm",
                )(features, species_index)

            hidden = SpeciesMLP(
                num_species=self.num_species,
                d_in=features.shape[-1],
                d_hidden=bpnn["num_neurons_per_layer"],
                num_hidden_layers=bpnn["num_hidden_layers"],
                d_out=bpnn["num_neurons_per_layer"],
                dtype=self.dtype,
                name="bpnn",
            )(features, species_index)
            hidden = jax.nn.silu(hidden)
        else:
            # modern/alchemical path, reference parity
            # (soap_bpnn/model.py:268-312,553-583): learned center-type
            # encoding multiplies the features, then a SHARED LayerNorm
            # and a SHARED bias-free Linear+SiLU chain (the per-species
            # structure lives in the encodings, not the network)
            enc = nn.Embed(
                self.num_species,
                features.shape[-1],
                dtype=self.dtype,
                name="center_encoding",
            )(species_index)
            features = features * enc
            if bpnn["layernorm"]:
                # torch.nn.LayerNorm parity: eps=1e-5 (flax defaults 1e-6)
                features = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name="layernorm_shared"
                )(features)
            h = features
            for li in range(bpnn["num_hidden_layers"] + 1):
                h = nn.Dense(
                    bpnn["num_neurons_per_layer"],
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"bpnn_shared_{li}",
                )(h)
                h = jax.nn.silu(h)
            hidden = h

        lr = hp.get("long_range") or {}
        if lr.get("enable"):
            from ...engine.long_range import LongRangeFeaturizer

            lr_features = LongRangeFeaturizer(
                d_out=hidden.shape[-1],
                smearing=float(lr.get("smearing", 1.4)),
                n_kmax=int(lr.get("n_kmax", 4)),
                method=str(lr.get("method", "ewald")),
                mesh=int(lr.get("mesh", 32)),
                dtype=self.dtype,
                name="long_range",
            )(hidden, batch_data)
            # reference combination: (short + long) / sqrt(2)
            hidden = (hidden + lr_features) * (0.5**0.5)

        results: Dict[str, Any] = {"_features": hidden}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            head_type = self.head_types.get(target_name, "mlp")
            if head_type == "linear":
                head_features = hidden
            else:
                head_features = nn.Dense(
                    bpnn["num_neurons_per_layer"],
                    dtype=self.dtype,
                    name=f"head_{safe}",
                )(hidden)
                head_features = jax.nn.silu(head_features)
            results[f"_ll_features::{target_name}"] = head_features
            specs = (self.target_specs or {}).get(target_name)
            per_block: Dict[str, jnp.ndarray] = {}
            for b_idx, (block_key, size) in enumerate(shapes.items()):
                spec = specs[b_idx] if specs else {"type": "scalar"}
                if spec["type"] == "scalar":
                    if hp["legacy"]:
                        per_block[block_key] = SpeciesMLP(
                            num_species=self.num_species,
                            d_in=head_features.shape[-1],
                            d_hidden=1,
                            num_hidden_layers=0,
                            d_out=size,
                            dtype=self.dtype,
                            name=f"last_layer_{safe}_{block_key}",
                        )(head_features, species_index)
                    else:
                        # modern: one shared bias-free linear per block
                        # (reference LinearMap with Labels.single(),
                        # model.py:1205-1218)
                        per_block[block_key] = nn.Dense(
                            size,
                            use_bias=False,
                            dtype=self.dtype,
                            name=f"last_layer_{safe}_{block_key}",
                        )(head_features)
                elif spec["type"] == "cartesian_rank2":
                    # rank-2 Cartesian: predict the (0,1), (1,-1), (2,1)
                    # spherical parts and convert with the CG intertwiner
                    # (reference soap_bpnn/model.py:1085-1102,1320-1355)
                    from ...ops.cg import spherical_to_cartesian_rank2

                    parts = []
                    for lam, sigma in ((0, 1), (1, -1), (2, 1)):
                        parts.append(
                            TensorBasis(
                                o3_lambda=lam,
                                o3_sigma=sigma,
                                max_angular=max_angular,
                                num_properties=spec["num_properties"],
                                add_lambda_basis=hp["add_lambda_basis"],
                                dtype=self.dtype,
                                name=(
                                    f"tensor_basis_{safe}_{block_key}"
                                    f"_l{lam}s{1 if sigma > 0 else 'm1'}"
                                ),
                            )(coeffs, head_features)
                        )
                    sph = jnp.concatenate(parts, axis=1)  # (A, 9, p)
                    w_cart = jnp.asarray(
                        spherical_to_cartesian_rank2(), dtype=sph.dtype
                    )
                    cart = jnp.einsum("ijM,aMp->aijp", w_cart, sph)
                    per_block[block_key] = cart.reshape(cart.shape[0], -1)
                else:  # equivariant block via the CG tensor basis
                    lam = spec["o3_lambda"]
                    out = TensorBasis(
                        o3_lambda=lam,
                        o3_sigma=spec["o3_sigma"],
                        max_angular=max_angular,
                        num_properties=spec["num_properties"],
                        add_lambda_basis=hp["add_lambda_basis"],
                        dtype=self.dtype,
                        name=f"tensor_basis_{safe}_{block_key}",
                    )(coeffs, head_features)
                    if spec["type"] == "cartesian_rank1":
                        # real-SH order m=(-1,0,1) ~ (y,z,x) -> xyz
                        out = out[:, jnp.array([2, 0, 1]), :]
                    per_block[block_key] = out.reshape(out.shape[0], -1)
            results[target_name] = per_block
        return results
