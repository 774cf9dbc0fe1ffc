"""Feasibility + rate of Mosaic's in-VMEM dynamic row gather
(tpu.dynamic_gather via jnp.take_along_axis) vs the XLA HBM gather.

The reversed-edge permutation costs 5.9 ms per 140 MB gather under XLA
(profile_force_call r3): random 256 B rows pay a full HBM tile each. If
atoms are spatially ordered, the permutation is BANDED: sources for a
block of output rows lie within a bounded row band. Plan: DMA the band
HBM->VMEM contiguously (full bandwidth), then gather rows inside VMEM.
This micro measures the in-VMEM gather rate and end-to-end banded
permutation vs jnp.take.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402


def vmem_gather_kernel(idx_ref, x_ref, out_ref):
    x = x_ref[:]
    idx = jnp.broadcast_to(idx_ref[:][:, None], x.shape)
    out_ref[:] = jnp.take_along_axis(x, idx, axis=0)


def make_single_block(N, D, dtype):
    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            vmem_gather_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, D), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(idx, x)

    return run


def banded_kernel(off_ref, idx_ref, x_hbm, out_ref, band, sem, *, B):
    # DMA the band [off, off+B) of x into VMEM, then gather locally
    off = off_ref[pl.program_id(0)]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, B)], band, sem)
    cp.start()
    cp.wait()
    x = band[:]
    idx = jnp.broadcast_to(idx_ref[:][:, None], (idx_ref.shape[0], x.shape[1]))
    # local indices padded band-relative; gather then write
    out_ref[:] = jnp.take_along_axis(
        x, jnp.minimum(idx, B - 1), axis=0, mode="promise_in_bounds"
    )[: out_ref.shape[0]]


def make_banded(N, D, R, B, dtype):
    grid = N // R

    @jax.jit
    def run(x, local_idx, offsets):
        return pl.pallas_call(
            functools.partial(banded_kernel, B=B),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,  # offsets
                in_specs=[
                    pl.BlockSpec((R,), lambda i, off: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (R, D), lambda i, off: (i, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((B, D), dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((N, D), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(offsets, local_idx, x)

    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    D = 128

    # ---- baseline: XLA take at the bench shape --------------------------
    N_full = 11392 * 48
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.normal(size=(N_full, D)), dtype)
        perm = rng.permutation(N_full).astype(np.int32)
        take = jax.jit(lambda x, p: jnp.take(x, p, axis=0))
        secs = chain_time(take, (x, jnp.asarray(perm)), n1=5, n2=20)
        gb = N_full * D * jnp.dtype(dtype).itemsize / 1e9
        report(f"XLA take {dtype.__name__} ({gb:.2f} GB useful)", secs)

    # ---- in-VMEM gather rate (single block, random within block) --------
    for dtype in (jnp.float32, jnp.bfloat16):
        for N in (8192, 32768):
            x = jnp.asarray(rng.normal(size=(N, D)), dtype)
            idx = jnp.asarray(rng.permutation(N).astype(np.int32))
            try:
                fn = make_single_block(N, D, dtype)
                out = fn(x, idx)
                ok = bool(
                    jnp.allclose(
                        out.astype(jnp.float32),
                        jnp.take(x, idx, axis=0).astype(jnp.float32),
                    )
                )
                secs = chain_time(fn, (x, idx), n1=5, n2=20)
                report(
                    f"VMEM gather {dtype.__name__} N={N} ok={ok}", secs
                )
            except Exception as e:
                print(f"VMEM gather {dtype.__name__} N={N}: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ---- banded end-to-end at bench scale -------------------------------
    # simulate bench banding: atoms slab-ordered, band +-W rows
    N = N_full // 512 * 512
    R = 16384
    W = 24576
    B = R + 2 * W  # 65536 rows band
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(N, D)), dtype)
    # banded permutation: each output row r maps within [r-W, r+W]
    perm = np.arange(N, dtype=np.int64)
    shuffle = rng.integers(-W // 2, W // 2, size=N)
    perm = np.clip(perm + shuffle, 0, N - 1)
    # make it a real (non-bijective is fine for rate measurement) map
    offsets = []
    local = np.empty(N, np.int32)
    for g in range(N // R):
        lo = max(0, min(g * R + R // 2 - B // 2, N - B))
        offsets.append(lo)
        local[g * R : (g + 1) * R] = perm[g * R : (g + 1) * R] - lo
    assert local.min() >= 0 and local.max() < B, (local.min(), local.max())
    offsets = jnp.asarray(np.array(offsets, np.int32))
    local_j = jnp.asarray(local)
    try:
        fn = make_banded(N, D, R, B, dtype)
        out = fn(x, local_j, offsets)
        ref = jnp.take(x, jnp.asarray(perm.astype(np.int32)), axis=0)
        ok = bool(
            jnp.allclose(out.astype(jnp.float32), ref.astype(jnp.float32))
        )
        secs = chain_time(
            lambda x: fn(x, local_j, offsets), (x,), n1=5, n2=20
        )
        report(f"banded VMEM permutation ok={ok}", secs)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"banded: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
