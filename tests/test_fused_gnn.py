"""Fused GNN-block megakernel (ops/pallas/fused_layer.fused_gnn_block):
value/gradient/second-order parity against the chained per-layer fused
path (same math, interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metatrain_tpu.ops.pallas.fused_layer import (
    CenterWeights,
    LayerWeights,
    _flatten_gnn_weights,
    _layer_math,
    fused_gnn_block,
)


A, M, D, H, F, N = 12, 16, 64, 4, 48, 96
SCALE = 1.0 / ((D // H) ** 0.5)


def _weights(rng, expanded, n_layers=2):
    def mk(shape, s=0.3):
        return jnp.asarray(rng.normal(0, s, size=shape), jnp.float32)

    lws, cws = [], []
    for _ in range(n_layers):
        lws.append(
            LayerWeights(
                norm_attn=jnp.ones((D,)) + mk((D,), 0.05),
                w_qkv=mk((D, 3 * D)),
                b_qkv=mk((3 * D,), 0.05),
                w_out=mk((D, D)),
                b_out=mk((D,), 0.05),
                norm_mlp=jnp.ones((D,)) + mk((D,), 0.05),
                w_in=mk((D, 2 * F)),
                b_in=mk((2 * F,), 0.05),
                w_ffn_out=mk((F, D)),
                b_ffn_out=mk((D,), 0.05),
            )
        )
        if expanded:
            cws.append(
                CenterWeights(
                    w_contr=mk((N, D)),
                    b_contr=mk((D,), 0.05),
                    w_exp=mk((D, N)),
                    b_exp=mk((N,), 0.05),
                    norm_c=jnp.ones((N,)) + mk((N,), 0.05),
                    w_in_c=mk((N, 4 * N)),
                    b_in_c=mk((4 * N,), 0.05),
                    w_out_c=mk((2 * N, N)),
                    b_out_c=mk((N,), 0.05),
                )
            )
        else:
            cws.append(None)
    return lws, cws


def _reference_chain(edges, node, cf, lws, cws, expanded):
    """The per-layer fused path's math, composed in XLA."""
    for lw, cw in zip(lws, cws):
        if expanded:
            center = node @ cw.w_contr + cw.b_contr
        else:
            center = node
        edges, cattn = _layer_math(edges, center, cf, lw, H, SCALE)
        if expanded:
            n_mid = node + cattn @ cw.w_exp + cw.b_exp
            x = n_mid.astype(jnp.float32)
            r = jax.lax.rsqrt(
                jnp.mean(x * x, axis=-1, keepdims=True)
                + jnp.finfo(jnp.float32).eps
            )
            hn = x * r * cw.norm_c
            vg = hn @ cw.w_in_c + cw.b_in_c
            v, g = vg[:, : 2 * N], vg[:, 2 * N :]
            h = v * jax.nn.sigmoid(g)
            node = n_mid + h @ cw.w_out_c + cw.b_out_c
        else:
            node = cattn
    return edges, node


@pytest.mark.parametrize("expanded", [True, False])
def test_fwd_and_grads_match_reference(expanded):
    rng = np.random.default_rng(0)
    lws, cws = _weights(rng, expanded)
    n_node = N if expanded else D
    edges = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    node = jnp.asarray(rng.normal(size=(A, n_node)), jnp.float32)
    cf = jnp.asarray(rng.uniform(0.2, 1.0, size=(A, M)), jnp.float32)
    cf = cf.at[:, M - 1].set(1.0)
    flat = tuple(_flatten_gnn_weights(lws, cws if expanded else (), expanded))

    e_ref, n_ref = _reference_chain(edges, node, cf, lws, cws, expanded)
    e_k, n_k = fused_gnn_block(edges, node, cf, flat, H, SCALE, 2, expanded)
    np.testing.assert_allclose(
        np.asarray(e_k), np.asarray(e_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(n_k), np.asarray(n_ref), rtol=2e-4, atol=2e-4
    )

    def loss_k(edges, node, cf, flat):
        e, n = fused_gnn_block(edges, node, cf, flat, H, SCALE, 2, expanded)
        return jnp.sum(jnp.sin(e)) + jnp.sum(jnp.cos(n))

    def loss_r(edges, node, cf, flat):
        lws2, cws2 = [], []
        nl = len(LayerWeights._fields)
        for i in range(2):
            lws2.append(LayerWeights(*flat[i * nl : (i + 1) * nl]))
        off = 2 * nl
        nc = len(CenterWeights._fields)
        for i in range(2):
            cws2.append(
                CenterWeights(*flat[off + i * nc : off + (i + 1) * nc])
                if expanded
                else None
            )
        e, n = _reference_chain(edges, node, cf, lws2, cws2, expanded)
        return jnp.sum(jnp.sin(e)) + jnp.sum(jnp.cos(n))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(edges, node, cf, flat)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(edges, node, cf, flat)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # RMS-relative: f32 reduction-order noise lands at ~1e-5; an
        # actual missing term would be O(1)
        scale = np.sqrt(np.mean(b**2)) or 1.0
        assert np.sqrt(np.mean((a - b) ** 2)) / scale < 1e-3


def test_grad_of_grad_matches_reference():
    """Second order (training with forces): d/d inputs of a function of
    the first-order input gradient."""
    expanded = True
    rng = np.random.default_rng(1)
    lws, cws = _weights(rng, expanded)
    edges = jnp.asarray(rng.normal(size=(A, M, D)), jnp.float32)
    node = jnp.asarray(rng.normal(size=(A, N)), jnp.float32)
    cf = jnp.asarray(rng.uniform(0.2, 1.0, size=(A, M)), jnp.float32)
    flat = tuple(_flatten_gnn_weights(lws, cws, expanded))

    def force_norm_k(edges, flat):
        def e_fn(ed):
            e, n = fused_gnn_block(ed, node, cf, flat, H, SCALE, 2, True)
            return jnp.sum(jnp.sin(e)) + jnp.sum(n * n)

        f = jax.grad(e_fn)(edges)
        return jnp.sum(f * f)

    def force_norm_r(edges):
        def e_fn(ed):
            e, n = _reference_chain(ed, node, cf, lws, cws, True)
            return jnp.sum(jnp.sin(e)) + jnp.sum(n * n)

        f = jax.grad(e_fn)(edges)
        return jnp.sum(f * f)

    gk = jax.grad(force_norm_k, argnums=(0, 1))(edges, flat)
    gr = jax.grad(force_norm_r, argnums=(0,))(edges)
    a = np.asarray(gk[0], np.float64)
    b = np.asarray(gr[0], np.float64)
    scale = np.sqrt(np.mean(b**2)) or 1.0
    assert np.sqrt(np.mean((a - b) ** 2)) / scale < 2e-3


def test_module_path_matches_per_layer(monkeypatch):
    """PET forward with the megakernel enabled equals the per-layer fused
    path (same parameters -- the trees are interchangeable)."""
    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )
    from metatrain_tpu.models.pet import PET
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    from conftest import make_molecule

    ds_info = DatasetInfo(
        "angstrom", [1, 6, 8],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    hypers = {
        "cutoff": 4.0, "d_pet": 64, "d_head": 16, "d_node": 96,
        "d_feedforward": 48, "num_heads": 4, "num_attention_layers": 2,
        "num_gnn_layers": 1,
    }
    model = PET(hypers, ds_info)
    params = model.init_params(jax.random.PRNGKey(0))
    system = make_molecule(6, seed=5)
    nbr = compute_neighbor_data(system, cutoff=4.0)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float32)

    monkeypatch.setenv("MTT_FUSED_GNN", "0")
    e0 = np.asarray(
        model.forward(params, batch, ["energy"])["energy"].block(0).values
    )
    # "force" bypasses the TPU-backend gate; kernels run in interpret
    # mode on CPU
    monkeypatch.setenv("MTT_FUSED_GNN", "force")
    e1 = np.asarray(
        model.forward(params, batch, ["energy"])["energy"].block(0).values
    )
    np.testing.assert_allclose(e1, e0, rtol=1e-4, atol=1e-5)
