"""PET neural modules (flax.linen), designed for the TPU MXU.

Behavioral parity with the reference PET backbone
(``/root/reference/src/metatrain/pet/modules/{transformer,backend}.py``),
built TPU-first:

- neighborhood attention runs directly on the NEF layout ``(n_atoms_pad,
  1 + max_nbrs, d)``: one batched MHA over tiny windows, where the heavy
  FLOPs (QKV/output/FFN projections) are large ``(A*(M+1), d) x (d, d')``
  matmuls that tile perfectly onto the MXU;
- the smooth cutoff enters as a log-additive pre-softmax bias
  (``log(clamp(cutoff, eps))``), exactly like the reference
  (``transformer.py:109-111``) -- padded and cut-off edges vanish smoothly
  and differentiably;
- no ``manual_attention`` split: JAX differentiates the same code path for
  double backward (training with forces);
- computation dtype is a parameter (bf16-ready), parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


EPSILON_ATTN = 1e-15


def _dense_params(mod, name, features, example, dtype):
    """Create (at init) / fetch an ``nn.Dense``'s kernel+bias WITHOUT
    running its compute: the parameter tree stays nn.Dense-compatible
    (checkpoints unaffected) while the FLOPs route through fused
    row-block kernels."""
    dense = nn.Dense(features, dtype=dtype, name=name)
    if mod.is_initializing():
        dense(example[:1])
    p = mod.scope.get_variable("params", name)
    return p["kernel"], p["bias"]


def _ln_params(mod, name, example, dtype):
    ln = nn.LayerNorm(dtype=dtype, name=name)
    if mod.is_initializing():
        ln(example[:1])
    p = mod.scope.get_variable("params", name)
    return p["scale"], p["bias"]


def _head_params(mod, name, d_head, example, dtype):
    head = Head(d_head, dtype=dtype, name=name)
    if mod.is_initializing():
        head(example[:1])
    p = mod.scope.get_variable("params", name)
    return (
        p["linear_0"]["kernel"],
        p["linear_0"]["bias"],
        p["linear_1"]["kernel"],
        p["linear_1"]["bias"],
    )


def _run_stage(math_fn, inputs, weights):
    """Fused Pallas row-block kernel on TPU (f32/bf16); identical-math
    XLA fallback elsewhere (and under ``MTT_PALLAS=0``)."""
    from ...ops.pallas import pallas_enabled
    from ...ops.pallas.rowblock import fused_rowblock, reference_rowblock

    if (
        pallas_enabled()
        and jax.default_backend() == "tpu"
        and inputs[0].dtype in (jnp.float32, jnp.bfloat16)
    ):
        return fused_rowblock(math_fn, inputs, weights)
    return reference_rowblock(math_fn, inputs, weights)


def cutoff_func_bump(values, cutoff, width):
    """C^inf bump switching function (reference ``pet/modules/utilities.py:4``)."""
    scaled = (values - (cutoff - width)) / width
    clamped = jnp.clip(scaled, 1e-6, 1.0 - 1e-6)
    return 0.5 * (1.0 + jnp.tanh(1.0 / jnp.tan(jnp.pi * clamped)))


def cutoff_func_cosine(values, cutoff, width):
    """Cosine switching function (reference ``pet/modules/utilities.py:25``)."""
    scaled = (values - (cutoff - width)) / width
    clamped = jnp.clip(scaled, 0.0, 1.0)
    return 0.5 * (1.0 + jnp.cos(jnp.pi * clamped))


class FeedForward(nn.Module):
    """SiLU MLP or SwiGLU gated unit (reference ``transformer.py:21-50``)."""

    d_model: int
    d_feedforward: int
    activation: str = "SwiGLU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.activation.lower() == "swiglu":
            vg = nn.Dense(2 * self.d_feedforward, dtype=self.dtype, name="w_in")(x)
            v, g = jnp.split(vg, 2, axis=-1)
            h = v * jax.nn.sigmoid(g)
        else:
            h = nn.Dense(self.d_feedforward, dtype=self.dtype, name="w_in")(x)
            h = jax.nn.silu(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="w_out")(h)


class AttentionBlock(nn.Module):
    """Multi-head attention over each atom's neighborhood window.

    With ``fused=True`` (default in f32/bf16) the core runs as a Pallas
    flash-style kernel (``ops/pallas/attention.py``): no (A, H, T, T)
    score materialization in HBM, q/k/v stay in the MXU-friendly
    (A, T, 128) layout. The XLA einsum path remains for f64 and as a
    numerical reference.

    :param attn_bias: (A, T) log-cutoff bias, identical for every query
        position and head.
    """

    total_dim: int
    num_heads: int
    temperature: float = 1.0
    dtype: Any = jnp.float32
    fused: bool = True  # Pallas kernel vs pure-XLA reference attention

    @nn.compact
    def __call__(self, x, attn_bias):
        from ...ops.pallas.attention import (
            reference_window_attention,
            window_attention,
        )

        A, T, D = x.shape
        head_dim = self.total_dim // self.num_heads
        qkv = nn.Dense(3 * self.total_dim, dtype=self.dtype, name="input_linear")(x)
        scale = 1.0 / (head_dim**0.5 * self.temperature)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (A, T, D) each, D minor

        # fused kernel on real TPUs only: the interpret-mode fallback is
        # far slower than plain XLA on CPU (tests exercise it directly)
        from ...ops.pallas import pallas_enabled

        use_fused = (
            self.fused
            and pallas_enabled()
            and jax.default_backend() == "tpu"
            and q.dtype in (jnp.float32, jnp.bfloat16)
        )
        if use_fused:
            out = window_attention(
                q, k, v, attn_bias.astype(jnp.float32), self.num_heads, scale
            )
        else:
            out = reference_window_attention(
                q, k, v, attn_bias, self.num_heads, scale
            )
        return nn.Dense(self.total_dim, dtype=self.dtype, name="output_linear")(
            out.astype(x.dtype)
        )


# torch-parity epsilons: torch.nn.LayerNorm defaults to eps=1e-5;
# torch.nn.RMSNorm defaults to eps=None, which ATen resolves to
# torch.finfo(input.dtype).eps (1.19e-7 for f32, 2.2e-16 for f64,
# 7.8e-3 for bf16) added to the f32-accumulated mean square.
EPS_LAYERNORM = 1e-5


def rmsnorm_eps(dtype) -> float:
    """torch.nn.RMSNorm(eps=None) parity: finfo(compute dtype).eps.

    For sub-f32 storage dtypes (bf16) the eps is capped at f32's: the
    mean square is f32-accumulated, and the reference only supports
    f32/f64 (``pet/model.py`` __supported_dtypes__) -- bf16 runs are our
    TPU extension and must approximate the f32 math (finfo(bf16).eps =
    7.8e-3 would perturb every norm by ~0.4%)."""
    dt = jnp.dtype(dtype or jnp.float32)
    if jnp.finfo(dt).bits < 32:
        dt = jnp.dtype(jnp.float32)
    return float(jnp.finfo(dt).eps)


def _norm(kind: str, dtype, name: str):
    if kind == "RMSNorm":
        return nn.RMSNorm(epsilon=rmsnorm_eps(dtype), dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=EPS_LAYERNORM, dtype=dtype, name=name)


class TransformerLayer(nn.Module):
    """One transformer layer over [center token | edge tokens].

    Node features live in ``d_node`` and are contracted to ``d_pet`` for
    attention when the widths differ (reference ``transformer.py:155-262``).
    """

    d_model: int
    num_heads: int
    d_node: int
    d_feedforward: int
    normalization: str = "RMSNorm"
    activation: str = "SwiGLU"
    transformer_type: str = "PreLN"
    temperature: float = 1.0
    dtype: Any = jnp.float32
    fused_attention: bool = True

    @nn.compact
    def __call__(self, node_emb, edge_emb, attn_bias):
        expanded = self.d_node != self.d_model
        attention = AttentionBlock(
            self.d_model,
            self.num_heads,
            self.temperature,
            dtype=self.dtype,
            fused=self.fused_attention,
            name="attention",
        )
        norm_attention = _norm(self.normalization, self.dtype, "norm_attention")
        norm_mlp = _norm(self.normalization, self.dtype, "norm_mlp")
        mlp = FeedForward(
            self.d_model, self.d_feedforward, self.activation, self.dtype, name="mlp"
        )

        if expanded:
            center_contraction = nn.Dense(
                self.d_model, dtype=self.dtype, name="center_contraction"
            )
            center_expansion = nn.Dense(
                self.d_node, dtype=self.dtype, name="center_expansion"
            )
            norm_center = _norm(self.normalization, self.dtype, "norm_center_features")
            center_mlp = FeedForward(
                self.d_node,
                2 * self.d_node,
                self.activation,
                self.dtype,
                name="center_mlp",
            )
            center_token = center_contraction(node_emb)
        else:
            center_token = node_emb

        tokens = jnp.concatenate([center_token[:, None, :], edge_emb], axis=1)

        if self.transformer_type == "PreLN":
            new_tokens = attention(norm_attention(tokens), attn_bias)
            out_center = new_tokens[:, 0, :]
            out_edges = new_tokens[:, 1:, :]
            if expanded:
                out_node = node_emb + center_expansion(out_center)
                out_node = out_node + center_mlp(norm_center(out_node))
            else:
                # reference parity (transformer.py:218-227): raw
                # attention output, no residual in the non-expanded case
                out_node = out_center
            out_edges = edge_emb + out_edges
            out_edges = out_edges + mlp(norm_mlp(out_edges))
        else:  # PostLN
            tokens = norm_attention(tokens + attention(tokens, attn_bias))
            tokens = norm_mlp(tokens + mlp(tokens))
            out_center = tokens[:, 0, :]
            out_edges = tokens[:, 1:, :]
            if expanded:
                out_node = node_emb + center_expansion(out_center)
                out_node = out_node + center_mlp(norm_center(out_node))
            else:
                out_node = out_center
        return out_node, out_edges


class FusedTransformerLayer(nn.Module):
    """PreLN/RMSNorm/SwiGLU transformer layer backed by the fused Pallas
    mega-kernel (``ops/pallas/fused_layer.py``): one HBM read + write per
    layer instead of ~10 activation round-trips. The center token rides
    in the reserved last NEF slot INSIDE the kernel (no (A, M+1, D)
    concat in HBM). The node-stream pieces (center contraction/expansion,
    center MLP) are tiny O(A x d) XLA ops.
    """

    d_model: int
    num_heads: int
    d_node: int
    d_feedforward: int
    temperature: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_emb, edge_emb, cf_tokens):
        from ...ops.pallas.fused_layer import (
            LayerWeights,
            fused_transformer_layer,
        )

        D = self.d_model
        expanded = self.d_node != D
        head_dim = D // self.num_heads
        scale = 1.0 / (head_dim**0.5 * self.temperature)

        def param(name, shape, init=nn.initializers.lecun_normal()):
            if len(shape) == 1 and name.startswith("b_"):
                init = nn.initializers.zeros
            if name.startswith("norm_"):
                init = nn.initializers.ones
            return self.param(name, init, shape)

        weights = LayerWeights(
            norm_attn=param("norm_attn", (D,)),
            w_qkv=param("w_qkv", (D, 3 * D)),
            b_qkv=param("b_qkv", (3 * D,)),
            w_out=param("w_out", (D, D)),
            b_out=param("b_out", (D,)),
            norm_mlp=param("norm_mlp", (D,)),
            w_in=param("w_in", (D, 2 * self.d_feedforward)),
            b_in=param("b_in", (2 * self.d_feedforward,)),
            w_ffn_out=param("w_ffn_out", (self.d_feedforward, D)),
            b_ffn_out=param("b_ffn_out", (D,)),
        )
        # weights stay f32: the kernel casts to the compute dtype internally
        # and returns f32 weight gradients from its accumulating backward

        if expanded:
            center_token = nn.Dense(
                D, dtype=self.dtype, name="center_contraction"
            )(node_emb)
        else:
            center_token = node_emb

        from ...ops.pallas import pallas_enabled

        use_kernel = (
            pallas_enabled()
            and jax.default_backend() == "tpu"
            and self.dtype in (jnp.float32, jnp.bfloat16)
        )
        import os as _os

        if _os.environ.get("MTT_INT8_CALIBRATE", "0") == "1":
            # W8A8 calibration probe: sow the absmaxes of the activations
            # the static-int8 path quantizes (collected by
            # fused_layer.calibrate_from_sow)
            from ...ops.pallas.fused_layer import layer_probe_stats

            self.sow(
                "intermediates",
                "int8_probe",
                layer_probe_stats(
                    edge_emb.astype(self.dtype),
                    center_token.astype(self.dtype),
                    cf_tokens,
                    weights,
                    self.num_heads,
                    scale,
                ),
            )
        calib = None
        if use_kernel:
            from ...ops.pallas.fused_layer import (
                get_int8_calib,
                use_int8_static,
            )

            if use_int8_static(self.dtype):
                key = "/".join(self.scope.path)
                calib = get_int8_calib(key)
                if calib is None:
                    raise RuntimeError(
                        "MTT_INT8_STATIC=1 but no int8 calibration is "
                        f"registered for layer {key!r}; run a forward "
                        "under MTT_INT8_CALIBRATE=1 and "
                        "fused_layer.calibrate_from_sow first"
                    )
        if use_kernel:
            edge_out, center_attn = fused_transformer_layer(
                edge_emb.astype(self.dtype),
                center_token.astype(self.dtype),
                cf_tokens,
                weights,
                self.num_heads,
                scale,
                calib,
            )
        else:
            from ...ops.pallas.fused_layer import _layer_math

            edge_out, center_attn = _layer_math(
                edge_emb.astype(self.dtype),
                center_token.astype(self.dtype),
                cf_tokens,
                weights,
                self.num_heads,
                scale,
            )

        if expanded:
            out_node = node_emb + nn.Dense(
                self.d_node, dtype=self.dtype, name="center_expansion"
            )(center_attn)
            out_node = out_node + FeedForward(
                self.d_node,
                2 * self.d_node,
                "SwiGLU",
                self.dtype,
                name="center_mlp",
            )(
                nn.RMSNorm(
                    epsilon=rmsnorm_eps(self.dtype),
                    dtype=self.dtype,
                    name="norm_center_features",
                )(out_node)
            )
        else:
            # reference parity (transformer.py:218-227): when d_node ==
            # d_pet the center token takes the RAW attention output --
            # no residual, no center MLP
            out_node = center_attn
        return out_node, edge_out


class _FusedLayerParams(nn.Module):
    """Parameter holder with EXACTLY :class:`FusedTransformerLayer`'s
    tree (same names, same shapes -- checkpoints are interchangeable),
    returning the weight tensors for the fused GNN-block megakernel
    instead of running per-layer compute."""

    d_model: int
    d_node: int
    d_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_example, edge_example):
        from ...ops.pallas.fused_layer import CenterWeights, LayerWeights

        D = self.d_model
        expanded = self.d_node != D

        def param(name, shape, init=nn.initializers.lecun_normal()):
            if len(shape) == 1 and name.startswith("b_"):
                init = nn.initializers.zeros
            if name.startswith("norm_"):
                init = nn.initializers.ones
            return self.param(name, init, shape)

        lw = LayerWeights(
            norm_attn=param("norm_attn", (D,)),
            w_qkv=param("w_qkv", (D, 3 * D)),
            b_qkv=param("b_qkv", (3 * D,)),
            w_out=param("w_out", (D, D)),
            b_out=param("b_out", (D,)),
            norm_mlp=param("norm_mlp", (D,)),
            w_in=param("w_in", (D, 2 * self.d_feedforward)),
            b_in=param("b_in", (2 * self.d_feedforward,)),
            w_ffn_out=param("w_ffn_out", (self.d_feedforward, D)),
            b_ffn_out=param("b_ffn_out", (D,)),
        )
        if not expanded:
            return lw, None
        wc, bc = _dense_params(
            self, "center_contraction", D, node_example, self.dtype
        )
        we, be = _dense_params(
            self, "center_expansion", self.d_node, edge_example, self.dtype
        )
        norm_c = nn.RMSNorm(
            epsilon=rmsnorm_eps(self.dtype),
            dtype=self.dtype,
            name="norm_center_features",
        )
        if self.is_initializing():
            norm_c(node_example[:1])
        nc_scale = self.scope.get_variable("params", "norm_center_features")[
            "scale"
        ]
        mlp = FeedForward(
            self.d_node, 2 * self.d_node, "SwiGLU", self.dtype,
            name="center_mlp",
        )
        if self.is_initializing():
            mlp(node_example[:1])
        mp = self.scope.get_variable("params", "center_mlp")
        cw = CenterWeights(
            w_contr=wc, b_contr=bc, w_exp=we, b_exp=be, norm_c=nc_scale,
            w_in_c=mp["w_in"]["kernel"], b_in_c=mp["w_in"]["bias"],
            w_out_c=mp["w_out"]["kernel"], b_out_c=mp["w_out"]["bias"],
        )
        return lw, cw


class CartesianTransformer(nn.Module):
    """One GNN layer: geometric edge tokens -> windowed attention.

    Reference ``transformer.py:395-562``: edge token = Dense([edge_vec,
    dist]) composed with neighbor-species embedding (layers > 0) and the
    incoming message, compressed to ``d_pet``; attention over [center |
    edges] with log-cutoff bias.
    """

    d_pet: int
    d_node: int
    num_heads: int
    d_feedforward: int
    num_attention_layers: int
    normalization: str
    activation: str
    transformer_type: str
    temperature: float
    num_species: int
    is_first: bool
    dtype: Any = jnp.float32
    fused_layers: bool = True
    fused_attention: bool = True

    @nn.compact
    def __call__(
        self,
        node_emb,  # (A, d_node)
        input_messages,  # (A, M, d_pet)
        neighbor_species_index,  # (A, M) int
        edge_vectors,  # (A, M, 3)
        edge_distances,  # (A, M)
        nbr_mask,  # (A, M) bool
        cutoff_factors,  # (A, M)
    ):
        from .fused_stages import compress_math

        geom = jnp.concatenate(
            [edge_vectors, edge_distances[:, :, None]], axis=-1
        ).astype(self.dtype)
        edge_emb = nn.Dense(self.d_pet, dtype=self.dtype, name="edge_embedder")(geom)

        if self.is_first:
            parts = (edge_emb, input_messages.astype(self.dtype))
        else:
            nbr_emb = nn.Embed(
                self.num_species,
                self.d_pet,
                dtype=self.dtype,
                name="neighbor_embedder",
            )(neighbor_species_index)
            parts = (edge_emb, nbr_emb, input_messages.astype(self.dtype))

        cat_example = jnp.concatenate([p[:1] for p in parts], axis=-1)
        w0 = _dense_params(self, "compress_0", self.d_pet, cat_example, self.dtype)
        w1 = _dense_params(
            self, "compress_1", self.d_pet, parts[0][:1], self.dtype
        )
        # flat (A*M, D) blocks: M is a multiple of 16 so the reshape is
        # layout-free, and every block matmul is row-aligned
        A, M, D = parts[0].shape
        flat = tuple(p.reshape(A * M, D) for p in parts)
        (tok_flat,) = _run_stage(compress_math, flat, (*w0, *w1))
        edge_tokens = tok_flat.reshape(A, M, D)

        # cutoff factor of the central token is 1; padded edges are 0
        cf = jnp.where(nbr_mask, cutoff_factors, 0.0)

        use_fused_layer = (
            self.fused_layers
            and self.normalization == "RMSNorm"
            and self.activation == "SwiGLU"
            and self.transformer_type == "PreLN"
        )
        if use_fused_layer:
            # fused kernel: multiplicative cutoff factors, center token in
            # the reserved last NEF slot (always masked -> cf there is 0;
            # the center's factor is 1)
            A = cf.shape[0]
            M = cf.shape[1]
            cf_tokens = jax.lax.dynamic_update_slice(
                cf, jnp.ones((A, 1), cf.dtype), (0, M - 1)
            )
        else:
            # unfused layers: center-first [center | edges] tokens with an
            # additive log-cutoff bias
            cf_first = jnp.concatenate(
                [jnp.ones((cf.shape[0], 1), dtype=cf.dtype), cf], axis=1
            )
            attn_bias = jnp.log(jnp.clip(cf_first, EPSILON_ATTN, None))
        from ...ops.pallas import pallas_enabled
        from ...ops.pallas.fused_layer import use_gnn_megakernel

        import os as _os

        use_megakernel = (
            use_fused_layer
            and pallas_enabled()
            and (
                jax.default_backend() == "tpu"
                or _os.environ.get("MTT_FUSED_GNN") == "force"
            )
            and self.dtype in (jnp.float32, jnp.bfloat16)
            and use_gnn_megakernel(
                edge_tokens.shape[1], self.d_pet, self.num_heads
            )
        )
        if use_megakernel:
            # one kernel for the WHOLE GNN layer: every attention layer
            # plus the between-layer center stream
            # (ops/pallas/fused_layer.fused_gnn_block); the parameter
            # tree is identical to the per-layer path
            from ...ops.pallas.fused_layer import _flatten_gnn_weights
            from ...ops.pallas.fused_layer import (
                fused_gnn_block,
            )

            expanded = self.d_node != self.d_pet
            lws, cws = [], []
            for i in range(self.num_attention_layers):
                lw, cw = _FusedLayerParams(
                    d_model=self.d_pet,
                    d_node=self.d_node,
                    d_feedforward=self.d_feedforward,
                    dtype=self.dtype,
                    name=f"layer_{i}",
                )(node_emb, edge_tokens[:, 0])
                lws.append(lw)
                cws.append(cw)
            head_dim = self.d_pet // self.num_heads
            scale = 1.0 / (head_dim**0.5 * self.temperature)
            out_edges, out_node = fused_gnn_block(
                edge_tokens.astype(self.dtype),
                node_emb.astype(self.dtype),
                cf_tokens,
                tuple(_flatten_gnn_weights(lws, cws, expanded)),
                self.num_heads,
                scale,
                self.num_attention_layers,
                expanded,
            )
            return out_node, out_edges

        out_node, out_edges = node_emb, edge_tokens
        for i in range(self.num_attention_layers):
            if use_fused_layer:
                out_node, out_edges = FusedTransformerLayer(
                    d_model=self.d_pet,
                    num_heads=self.num_heads,
                    d_node=self.d_node,
                    d_feedforward=self.d_feedforward,
                    temperature=self.temperature,
                    dtype=self.dtype,
                    name=f"layer_{i}",
                )(out_node, out_edges, cf_tokens)
            else:
                out_node, out_edges = TransformerLayer(
                    d_model=self.d_pet,
                    num_heads=self.num_heads,
                    d_node=self.d_node,
                    d_feedforward=self.d_feedforward,
                    normalization=self.normalization,
                    activation=self.activation,
                    transformer_type=self.transformer_type,
                    temperature=self.temperature,
                    dtype=self.dtype,
                    fused_attention=self.fused_attention,
                    name=f"layer_{i}",
                )(out_node, out_edges, attn_bias)
        return out_node, out_edges


def reverse_edges(edge_array, batch_data):
    """Gather each edge's reversed (j -> i) partner: the message-passing
    primitive (reference ``nef.py:221-251`` + ``backend.py:556-566``).

    ``nbr_reverse`` is an involutive permutation of flat edge indices (the
    reverse of the reverse is the edge itself; padded slots self-map), so
    this lowers to the :mod:`ops.involution` primitive whose autodiff
    transpose is the SAME gather -- the generic scatter-add transpose
    costs ~3x more on TPU (benchmarks/micro_edges.py) -- and whose JVP /
    batching rules keep forward-mode autodiff working.

    When the batch carries the colored NEF layout (``color_band > 0``),
    the permutation instead runs as banded one-hot matmuls on the MXU
    (``ops/pallas/color_gather.py``, bit-identical to the plain gather,
    ~3x faster at the 10k-atom bench); otherwise the gather runs on the
    flat (A*M, ...) view: with M a multiple of 16
    (``containers.bucket_neighbors``) the reshape is layout-free, so the
    gather is a pure aligned row permutation with no relayout copies.
    """
    nbr_reverse = batch_data["nbr_reverse"]
    band = batch_data.get("color_band", 0)
    groups = batch_data.get("color_groups", ())
    if (band or groups) and edge_array.ndim == 3:
        from ...ops.pallas.color_gather import colored_permute

        return colored_permute(
            edge_array,
            nbr_reverse.reshape(-1),
            batch_data["nbr_indices"],
            batch_data["nbr_fixup_src"],
            batch_data["nbr_fixup_dst"],
            band=band,
            groups=groups,
            fixup_split=batch_data.get("color_fixup_split", (0, 0)),
        )
    from ...ops.involution import permute_rows

    A, M = edge_array.shape[:2]
    flat = edge_array.reshape((A * M,) + edge_array.shape[2:])
    return permute_rows(flat, nbr_reverse.reshape(-1)).reshape(
        edge_array.shape
    )


def _reverse_edges_impl(edge_array, nbr_reverse):
    A, M = edge_array.shape[:2]
    flat = edge_array.reshape((A * M,) + edge_array.shape[2:])
    return flat[nbr_reverse.reshape(-1)].reshape(edge_array.shape)


class SystemConditioningEmbedding(nn.Module):
    """Charge / spin-multiplicity conditioning, broadcast to atoms.

    Reference ``pet/modules/conditioning.py:8-52``: per-system embeddings
    of integer charge (in [-max_charge, max_charge]) and spin multiplicity
    (in [1, max_spin]), combined and passed through a zero-initialized
    output gate so an unconditioned model is unchanged at init.
    """

    d_out: int
    max_charge: int = 10
    max_spin_multiplicity: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, charge, spin_multiplicity, system_index):
        charge_idx = jnp.clip(
            charge.astype(jnp.int32) + self.max_charge,
            0,
            2 * self.max_charge,
        )
        spin_idx = jnp.clip(
            spin_multiplicity.astype(jnp.int32) - 1,
            0,
            self.max_spin_multiplicity - 1,
        )
        charge_emb = nn.Embed(
            2 * self.max_charge + 1, self.d_out, dtype=self.dtype,
            name="charge_embedding",
        )(charge_idx)
        spin_emb = nn.Embed(
            self.max_spin_multiplicity, self.d_out, dtype=self.dtype,
            name="spin_embedding",
        )(spin_idx)
        combined = jax.nn.silu(charge_emb + spin_emb)
        gated = nn.Dense(
            self.d_out,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="gate",
        )(combined)
        return gated[system_index]  # (A, d_out)


class PETBackbone(nn.Module):
    """Featurizer: species embeddings -> stacked CartesianTransformers.

    Returns per-readout-layer node features (A, d_node) and edge features
    (A, M, d_pet): one pair for the ``feedforward`` featurizer, one per
    GNN layer for ``residual`` (reference ``backend.py:496-649``).
    """

    hypers: Dict[str, Any]
    num_species: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_data: Dict[str, Any]):
        hp = self.hypers
        d_pet, d_node = hp["d_pet"], hp["d_node"]
        num_gnn = hp["num_gnn_layers"]
        feedforward = hp["featurizer_type"] == "feedforward"
        num_readout = 1 if feedforward else num_gnn
        # rematerialize each GNN layer in the backward pass: activations
        # are recomputed instead of stored, the standard TPU memory/FLOP
        # trade for training with forces (double backward doubles the
        # stored-activation footprint otherwise)
        layer_cls = (
            nn.remat(CartesianTransformer)
            if hp.get("remat", False)
            else CartesianTransformer
        )

        species_idx = batch_data["species_index"]  # (A,)
        nbr_species_idx = batch_data["neighbor_species_index"]  # (A, M)
        conditioning = batch_data.get("conditioning")  # (A, d_node) or None

        node_embedders = [
            nn.Embed(
                self.num_species, d_node, dtype=self.dtype, name=f"node_embedder_{i}"
            )
            for i in range(num_readout)
        ]
        edge_embedder = nn.Embed(
            self.num_species, d_pet, dtype=self.dtype, name="edge_species_embedder"
        )

        gnn_layers = [
            layer_cls(
                d_pet=d_pet,
                d_node=d_node,
                num_heads=hp["num_heads"],
                d_feedforward=hp["d_feedforward"],
                num_attention_layers=hp["num_attention_layers"],
                normalization=hp["normalization"],
                activation=hp["activation"],
                transformer_type=hp["transformer_type"],
                temperature=hp["attention_temperature"],
                num_species=self.num_species,
                is_first=(i == 0),
                fused_layers=hp.get("fused_layers", True),
                fused_attention=hp.get("fused_attention", True),
                dtype=self.dtype,
                name=f"gnn_layer_{i}",
            )
            for i in range(num_gnn)
        ]

        input_messages = edge_embedder(nbr_species_idx)
        node_features: List[jnp.ndarray] = []
        edge_features: List[jnp.ndarray] = []

        common = (
            nbr_species_idx,
            batch_data["edge_vectors"],
            batch_data["edge_distances"],
            batch_data["nbr_mask"],
            batch_data["cutoff_factors"],
        )

        if feedforward:
            node_state = node_embedders[0](species_idx)
            for i, layer in enumerate(gnn_layers):
                out_node, out_edges = layer(node_state, input_messages, *common)
                if conditioning is not None:
                    out_node = out_node + conditioning
                node_state = out_node
                # fan-out pair: out_edges feeds BOTH the permute and the
                # combination stage; the pair primitive fuses the two
                # backward cotangents into the permute kernel
                # (ops/pallas/color_gather.reverse_pair)
                from ...ops.pallas.color_gather import reverse_pair

                out_edges, reversed_edges = reverse_pair(
                    out_edges, batch_data
                )
                from .fused_stages import combination_math

                cat_example = jnp.concatenate(
                    [out_edges[:1], reversed_edges[:1]], axis=-1
                )
                ln = _ln_params(
                    self, f"combination_norm_{i}", cat_example, self.dtype
                )
                w0 = _dense_params(
                    self,
                    f"combination_mlp_{i}_0",
                    2 * d_pet,
                    cat_example,
                    self.dtype,
                )
                w1 = _dense_params(
                    self,
                    f"combination_mlp_{i}_1",
                    d_pet,
                    cat_example,
                    self.dtype,
                )
                A, M, D = out_edges.shape
                flat = (
                    out_edges.reshape(A * M, D),
                    reversed_edges.reshape(A * M, D),
                    input_messages.astype(out_edges.dtype).reshape(A * M, D),
                )
                (msg_flat,) = _run_stage(
                    combination_math, flat, (*ln, *w0, *w1)
                )
                input_messages = msg_flat.reshape(A, M, D)
            node_features.append(node_state)
            edge_features.append(input_messages)
        else:  # residual
            for i, layer in enumerate(gnn_layers):
                node_state = node_embedders[i](species_idx)
                out_node, out_edges = layer(node_state, input_messages, *common)
                if conditioning is not None:
                    out_node = out_node + conditioning
                node_features.append(out_node)
                from ...ops.pallas.color_gather import reverse_pair

                out_edges, reversed_edges = reverse_pair(
                    out_edges, batch_data
                )
                edge_features.append(out_edges)
                input_messages = 0.5 * (input_messages + reversed_edges)

        return node_features, edge_features


class Head(nn.Module):
    """Two-layer SiLU head (reference ``backend.py:171-193``)."""

    d_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_head, dtype=self.dtype, name="linear_0")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.d_head, dtype=self.dtype, name="linear_1")(x)
        return jax.nn.silu(x)


class PETModule(nn.Module):
    """Full PET network: backbone + per-target heads and last layers.

    ``output_shapes``: target name -> {block key string -> flat output
    size}; one node head/edge head pair and per-block last linear layers
    per target, per readout layer (reference ``backend.py:157-217``).
    """

    hypers: Dict[str, Any]
    num_species: int
    output_shapes: Dict[str, Dict[str, int]]
    dtype: Any = jnp.float32
    long_range: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(
        self,
        batch_data: Dict[str, Any],
        requested: Sequence[str],
    ) -> Dict[str, Any]:
        if self.hypers.get("system_conditioning"):
            conditioning = SystemConditioningEmbedding(
                d_out=self.hypers["d_node"],
                max_charge=self.hypers.get("max_charge", 10),
                max_spin_multiplicity=self.hypers.get(
                    "max_spin_multiplicity", 10
                ),
                dtype=self.dtype,
                name="system_conditioning",
            )(
                batch_data["charge"],
                batch_data["spin_multiplicity"],
                batch_data["system_index"],
            )
            batch_data = dict(batch_data, conditioning=conditioning)

        node_features, edge_features = PETBackbone(
            self.hypers, self.num_species, dtype=self.dtype, name="backbone"
        )(batch_data)

        if self.long_range and self.long_range.get("enable"):
            from ...engine.long_range import LongRangeFeaturizer

            lr_features = LongRangeFeaturizer(
                d_out=self.hypers["d_node"],
                smearing=float(self.long_range.get("smearing", 1.4)),
                n_kmax=int(self.long_range.get("n_kmax", 4)),
                method=str(self.long_range.get("method", "ewald")),
                mesh=int(self.long_range.get("mesh", 32)),
                dtype=self.dtype,
                name="long_range",
            )(node_features[-1], batch_data)
            # reference: (node + lr) / sqrt(2), pet/model.py:508-518
            node_features = [
                (nf + lr_features) * (0.5**0.5) for nf in node_features
            ]

        cutoff_factors = jnp.where(
            batch_data["nbr_mask"], batch_data["cutoff_factors"], 0.0
        )

        d_head = self.hypers["d_head"]
        results: Dict[str, Any] = {"_node_features": node_features,
                                   "_edge_features": edge_features}
        for target_name, shapes in self.output_shapes.items():
            if target_name not in requested:
                continue
            safe = target_name.replace(":", "_")
            node_ll_list, edge_ll_list = [], []
            per_block_sums: Dict[str, jnp.ndarray] = {}
            for layer_i, (nf, ef) in enumerate(
                zip(node_features, edge_features)
            ):
                from .fused_stages import head_math

                node_ll = Head(
                    d_head, dtype=self.dtype, name=f"node_head_{safe}_{layer_i}"
                )(nf)
                hw = _head_params(
                    self,
                    f"edge_head_{safe}_{layer_i}",
                    d_head,
                    ef,
                    self.dtype,
                )
                A_, M_, D_ = ef.shape
                (edge_ll_flat,) = _run_stage(
                    head_math,
                    (ef.astype(self.dtype).reshape(A_ * M_, D_),),
                    hw,
                )
                edge_ll = edge_ll_flat.reshape(A_, M_, -1)
                node_ll_list.append(node_ll)
                edge_ll_list.append(edge_ll)
                for block_key, size in shapes.items():
                    node_pred = nn.Dense(
                        size,
                        dtype=self.dtype,
                        name=f"node_last_{safe}_{layer_i}_{block_key}",
                    )(node_ll)
                    edge_pred = nn.Dense(
                        size,
                        dtype=self.dtype,
                        name=f"edge_last_{safe}_{layer_i}_{block_key}",
                    )(edge_ll)
                    # edge contributions: cutoff-weighted sum over neighbors
                    edge_pred = jnp.sum(
                        edge_pred * cutoff_factors[:, :, None], axis=1
                    )
                    total = node_pred + edge_pred
                    if block_key in per_block_sums:
                        per_block_sums[block_key] = per_block_sums[block_key] + total
                    else:
                        per_block_sums[block_key] = total
            results[target_name] = per_block_sums
            results[f"_ll_features::{target_name}"] = (node_ll_list, edge_ll_list)
        return results
