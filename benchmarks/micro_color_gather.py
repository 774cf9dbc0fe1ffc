"""Perf model validation for the color-slot banded matmul gather.

If NEF slots are assigned by proper edge coloring (edge (a,b) occupies
the SAME slot m in both windows), the reversed-edge permutation becomes
slot-preserving: out[a, m] = x[match_m(a), m] with match_m an involutive
atom matching. With atoms spatially ordered, |match_m(a) - a| <= W_half
(banded), so a Pallas kernel can:

  - DMA the contiguous atom band x[lo:hi] (W, M, D) per output block
  - per color m: out[:, m, :] = onehot(BA, W) @ band[:, m, :]

turning the 5.9 ms random-row XLA gather into ~2 ms of MXU work +
full-bandwidth DMA. This micro measures that kernel on synthetic banded
matchings at the bench shape.
"""

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
W_HALF = 896


def color_gather_kernel(off_ref, idx_ref, x_hbm, out_ref, band, sem, *, W):
    blk = pl.program_id(0)
    lo = off_ref[blk]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(lo, W)], band, sem)
    cp.start()
    BA = out_ref.shape[0]
    idx = idx_ref[:]  # (BA, M) absolute atom matches
    local = idx - lo  # band-relative
    cp.wait()
    col = jax.lax.broadcasted_iota(jnp.int32, (BA, W), 1)
    for m in range(M):
        onehot = (col == local[:, m][:, None]).astype(x_hbm.dtype)  # (BA, W)
        band_m = band[:, m, :]  # (W, D)
        out_ref[:, m, :] = jax.lax.dot_general(
            onehot,
            band_m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def make_color_gather(A, BA, W, dtype):
    grid = A // BA

    @jax.jit
    def run(x, idx, offsets):
        return pl.pallas_call(
            functools.partial(color_gather_kernel, W=W),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,  # offsets
                in_specs=[
                    pl.BlockSpec(
                        (BA, M), lambda i, off: (i, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (BA, M, D), lambda i, off: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((W, M, D), dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
                grid=(grid,),
            ),
            out_shape=jax.ShapeDtypeStruct((A, M, D), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(offsets, idx, x)

    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    for BA in (256, 512):
        A = 11392 // BA * BA
        W = BA + 2 * W_HALF
        # synthetic banded involutive matching per color
        idx = np.tile(np.arange(A)[:, None], (1, M)).astype(np.int32)
        for m in range(M):
            perm = np.arange(A)
            # random banded pairing: swap a with a+delta
            cand = rng.permutation(A - W_HALF)
            used = np.zeros(A, bool)
            for a in cand[: A // 2]:
                d = int(rng.integers(1, W_HALF))
                b = a + d
                if used[a] or used[b]:
                    continue
                perm[a], perm[b] = b, a
                used[a] = used[b] = True
            idx[:, m] = perm
        offsets = np.empty(A // BA, np.int32)
        for g in range(A // BA):
            lo = min(max(0, g * BA + BA // 2 - W // 2), A - W)
            offsets[g] = lo
            local = idx[g * BA : (g + 1) * BA] - lo
            assert local.min() >= 0 and local.max() < W, (
                g,
                local.min(),
                local.max(),
            )

        x = jnp.asarray(rng.normal(size=(A, M, D)), dtype)
        idx_j = jnp.asarray(idx)
        off_j = jnp.asarray(offsets)

        fn = make_color_gather(A, BA, W, dtype)
        out = fn(x, idx_j, off_j)
        # reference: flat row gather
        flat_rev = (idx * M + np.arange(M)[None, :]).reshape(-1)
        ref = jnp.take(
            x.reshape(A * M, D), jnp.asarray(flat_rev), axis=0
        ).reshape(A, M, D)
        ok = bool(jnp.array_equal(out, ref))
        secs = chain_time(lambda x: fn(x, idx_j, off_j), (x,), n1=5, n2=20)
        gb = A * M * D * jnp.dtype(dtype).itemsize / 1e9
        report(f"color gather BA={BA} W={W} ok={ok} ({gb:.2f} GB)", secs)

        take = jax.jit(
            lambda x, p: jnp.take(x.reshape(A * M, D), p, axis=0)
        )
        secs = chain_time(take, (x, jnp.asarray(flat_rev)), n1=5, n2=20)
        report(f"XLA take same perm", secs)


if __name__ == "__main__":
    main()
