"""Hand-written row-block stage backwards vs jax.vjp (f32, CPU).

The hand-written backwards (``models/pet/fused_stages.py``) must compute
the same mathematical function as autodiff of the stage math; inside the
TPU kernels they replace the vjp trace to keep cotangent matmuls in the
compute dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatrain_tpu.models.pet.fused_stages import (
    combination_bwd,
    combination_math,
    compress_bwd,
    compress_math,
    head_bwd,
    head_math,
)
from metatrain_tpu.ops.pallas.rowblock import (
    fused_rowblock,
    reference_rowblock,
)

E, D, F = 37, 32, 48


def _cases(rng):
    def a(*shape):
        return jnp.asarray(rng.normal(size=shape), dtype=jnp.float32)

    return [
        (
            compress_math,
            compress_bwd,
            (a(E, D), a(E, D), a(E, D)),
            (a(3 * D, F), a(F), a(F, D), a(D)),
        ),
        (
            combination_math,
            combination_bwd,
            (a(E, D), a(E, D), a(E, D)),
            (a(2 * D), a(2 * D), a(2 * D, 2 * D), a(2 * D), a(2 * D, D), a(D)),
        ),
        (
            head_math,
            head_bwd,
            (a(E, D),),
            (a(D, F), a(F), a(F, F), a(F)),
        ),
    ]


@pytest.mark.parametrize("case_idx", [0, 1, 2])
@pytest.mark.parametrize("weight_grads", [True, False])
def test_handwritten_stage_bwd_matches_vjp(case_idx, weight_grads):
    rng = np.random.default_rng(7)
    math_fn, bwd_fn, inputs, weights = _cases(rng)[case_idx]

    outs = math_fn(inputs, weights)
    g = tuple(
        jnp.asarray(rng.normal(size=o.shape), dtype=o.dtype) for o in outs
    )

    def f(ins, w):
        return tuple(math_fn(ins, w))

    _, vjp = jax.vjp(f, inputs, weights)
    d_ins_ref, d_w_ref = vjp(g)

    d_ins, d_w = bwd_fn(inputs, weights, g, weight_grads)
    for a_, b_ in zip(d_ins, d_ins_ref):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=3e-5, rtol=1e-4
        )
    if weight_grads:
        for i, (a_, b_) in enumerate(zip(d_w, d_w_ref)):
            np.testing.assert_allclose(
                np.asarray(a_),
                np.asarray(b_),
                atol=5e-5,
                rtol=5e-4,
                err_msg=f"weight grad leaf {i}",
            )
    else:
        assert d_w == []


@pytest.mark.parametrize("case_idx", [0, 1, 2])
def test_fused_rowblock_grad_matches_reference(case_idx):
    """End-to-end: the backward kernel (interpret mode) with the
    registered hand-written bwd matches autodiff of the XLA reference."""
    rng = np.random.default_rng(3)
    math_fn, _, inputs, weights = _cases(rng)[case_idx]

    def loss_fused(ins, w):
        outs = fused_rowblock(math_fn, ins, w)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_ref(ins, w):
        outs = reference_rowblock(math_fn, ins, w)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(inputs, weights)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(inputs, weights)
    # kernel-vs-XLA f32 reduction-order noise amplifies through the sin
    # loss to ~1e-3 absolute (identical for the autodiff kernel path);
    # exact functional parity is asserted by the direct bwd test above
    for a_, b_ in zip(
        jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)
    ):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=4e-3, rtol=4e-3
        )
