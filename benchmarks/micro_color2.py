"""Ablate the color-gather kernel legs: onehot generation, per-color
matmuls, layouts. Band input held resident (constant index_map) so no DMA
variation -- isolates compute throughput."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

M, D = 48, 128
BA, W = 256, 2048
G = 44  # blocks (~11264 atoms)
FLOPS = G * M * 2 * BA * W * D


def kern_amd(idx_ref, band_ref, out_ref):
    """band (W, M, D): strided per-color slice (as in micro_color_gather)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (BA, W), 1)
    local = idx_ref[:]
    for m in range(M):
        onehot = (col == local[:, m][:, None]).astype(band_ref.dtype)
        out_ref[:, m, :] = jax.lax.dot_general(
            onehot, band_ref[:, m, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def kern_mad(idx_ref, band_ref, out_ref):
    """band (M, W, D): contiguous per-color slice."""
    col = jax.lax.broadcasted_iota(jnp.int32, (BA, W), 1)
    local = idx_ref[:]
    for m in range(M):
        onehot = (col == local[:, m][:, None]).astype(band_ref.dtype)
        out_ref[m] = jax.lax.dot_general(
            onehot, band_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def kern_mad_batched(idx_ref, band_ref, out_ref):
    """one batched dot_general over the color axis."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, BA, W), 2)
    local = jnp.swapaxes(idx_ref[:], 0, 1)[:, :, None]  # (M, BA, 1)
    onehot = (col == local).astype(band_ref.dtype)  # (M, BA, W)
    out_ref[:] = jax.lax.dot_general(
        onehot, band_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def kern_onehot_only(idx_ref, band_ref, out_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (BA, W), 1)
    local = idx_ref[:]
    acc = jnp.zeros((BA, D), jnp.float32)
    for m in range(M):
        onehot = (col == local[:, m][:, None]).astype(band_ref.dtype)
        acc += jnp.sum(onehot, axis=1, keepdims=True) * band_ref[m, :BA, :].astype(jnp.float32)
        out_ref[m] = acc.astype(out_ref.dtype)


def kern_matmul_only(idx_ref, band_ref, out_ref):
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (BA, W), 1) < BA
    ).astype(band_ref.dtype)
    for m in range(M):
        out_ref[m] = jax.lax.dot_general(
            onehot, band_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def run_variant(name, kern, band_shape, out_shape):
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.normal(size=band_shape), dtype)
    idx = jnp.asarray(
        rng.integers(0, W, size=(G * BA, M)).astype(np.int32)
    )
    spec_band = pl.BlockSpec(
        band_shape, lambda i: (0,) * len(band_shape), memory_space=pltpu.VMEM
    )
    spec_idx = pl.BlockSpec((BA, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if len(out_shape) == 3 and out_shape[0] == G * BA:
        spec_out = pl.BlockSpec(
            (BA, M, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        spec_out = pl.BlockSpec(
            (M, BA, D), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    @jax.jit
    def run(idx, band):
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[spec_idx, spec_band],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(idx, band)

    try:
        run(idx, band).block_until_ready()
        secs = chain_time(lambda idx: run(idx, band), (idx,), n1=5, n2=20)
        report(name, secs, FLOPS)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_variant("AMD strided slices", kern_amd, (W, M, D), (G * BA, M, D))
    run_variant("MAD contiguous", kern_mad, (M, W, D), (M, G * BA, D))
    run_variant("MAD batched dot", kern_mad_batched, (M, W, D), (M, G * BA, D))
    run_variant("matmul only (const onehot)", kern_matmul_only, (M, W, D), (M, G * BA, D))
    run_variant("onehot only (no matmul)", kern_onehot_only, (M, W, D), (M, G * BA, D))


if __name__ == "__main__":
    main()
