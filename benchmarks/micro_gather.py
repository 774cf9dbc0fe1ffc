"""Row-gather strategies for the reversed-edge permutation at bench shape:
(541440, 128) bf16 rows, involutive permutation. XLA's gather reads one
full (16,128) tile per row (~16x amplification); candidates below try to
beat it with Pallas DMA pipelines."""

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

A, M, D = 11520, 47, 128
N = A * M


def make_reverse(a=11520, m=47, seed=0):
    """Synthetic involutive permutation with lattice-like locality."""
    rng = np.random.default_rng(seed)
    rev = np.arange(a * m)
    # pair random slots whose atoms are within +-300 atoms (locality)
    order = rng.permutation(a * m)
    used = np.zeros(a * m, bool)
    for e in order:
        if used[e]:
            continue
        i = e // m
        j = int(np.clip(i + rng.integers(-300, 301), 0, a - 1))
        f = j * m + rng.integers(0, m)
        if used[f] or f == e:
            continue
        rev[e], rev[f] = f, e
        used[e] = used[f] = True
    return jnp.asarray(rev, jnp.int32)


def xla_take(x, rev):
    return jnp.take(x, rev, axis=0)


def pallas_dma_gather(x, rev, rows_per_block=512):
    """Per-row DMA gather: indices scalar-prefetched, each output block
    issues rows_per_block row-DMAs from HBM with a semaphore array."""
    n, d = x.shape
    BR = rows_per_block

    def kernel(idx_ref, x_hbm, out_ref, sems):
        blk = pl.program_id(0)
        base = blk * BR

        def start(r, _):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r],
            )
            dma.start()
            return 0

        jax.lax.fori_loop(0, BR, start, 0)

        def wait(r, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r],
            ).wait()
            return 0

        jax.lax.fori_loop(0, BR, wait, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BR, d), lambda i, idx: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((BR,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(rev, x)


def main():
    rev = make_reverse()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, D)), jnp.bfloat16
    )

    secs = chain_time(jax.jit(lambda x, r: xla_take(x, r)), (x, rev))
    report("XLA take (541440,128) bf16", secs)

    for br in (256, 512, 1024):
        try:
            fn = jax.jit(functools.partial(pallas_dma_gather, rows_per_block=br))
            out = fn(x, rev)
            ok = bool(jnp.array_equal(out[:100], x[rev[:100]]))
            secs = chain_time(fn, (x, rev))
            report(f"pallas row-DMA gather BR={br} (ok={ok})", secs)
        except Exception as e:  # noqa: BLE001
            print(f"pallas BR={br}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # f32 x 3 (edge vectors)
    x3 = jnp.asarray(np.random.default_rng(0).normal(size=(N, 3)), jnp.float32)
    secs = chain_time(jax.jit(lambda x, r: xla_take(x, r)), (x3, rev))
    report("XLA take (541440,3) f32", secs)


if __name__ == "__main__":
    main()
