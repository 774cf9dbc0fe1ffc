"""Quantify the M=48 aligned-flat layout vs the current (A, 47, D) NEF
layout for the row-block stages and the reversed-edge gather, fwd and
fwd+bwd, at bench shape. Decides the M48 migration."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402


def make_reverse_fast(a, m, seed=0):
    """Vectorized synthetic involution with lattice-like locality."""
    rng = np.random.default_rng(seed)
    n = a * m
    rev = np.arange(n)
    # random pairing: permute all slots, pair consecutive entries
    perm = rng.permutation(n)
    e, f = perm[0 : n - 1 : 2], perm[1::2]
    rev[e], rev[f] = f, e
    return rev

from metatrain_tpu.models.pet.fused_stages import (  # noqa: E402
    combination_math,
    compress_math,
    head_math,
)
from metatrain_tpu.ops.pallas.rowblock import fused_rowblock  # noqa: E402

A, M, D = 11520, 47, 128
MS = 48  # storage slots (aligned)


def bench_fwd(label, fn, args):
    f = jax.jit(fn)
    f(*args)  # compile
    report(label, chain_time(f, args))


def bench_grad(label, fn, args):
    from metatrain_tpu.ops import inference

    def loss(*a):
        outs = fn(*a)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    with inference.no_param_grads():
        g = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
        g(*args)  # trace + compile inside the flag's scope
    report(label, chain_time(lambda *a: g(*a)[0], args))


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape, dtype=dt):
        return jnp.asarray(rng.normal(size=shape), dtype)

    # --- compress stage: 3 parts (D-wide) -> D
    w0 = mk((3 * D, D), jnp.float32)
    b0 = mk((D,), jnp.float32)
    w1 = mk((D, D), jnp.float32)
    b1 = mk((D,), jnp.float32)
    parts3d = tuple(mk((A, M, D)) for _ in range(3))
    partsflat = tuple(mk((A * MS, D)) for _ in range(3))

    def compress3d(*parts):
        return fused_rowblock(compress_math, parts, (w0, b0, w1, b1))

    def compressflat(*parts):
        return fused_rowblock(compress_math, parts, (w0, b0, w1, b1))

    bench_fwd("compress 3D (A,47,D) fwd", compress3d, parts3d)
    bench_fwd("compress flat (A*48,D) fwd", compressflat, partsflat)
    bench_grad("compress 3D fwd+bwd", compress3d, parts3d)
    bench_grad("compress flat fwd+bwd", compressflat, partsflat)

    # --- combination stage
    lnw = (mk((2 * D,), jnp.float32), mk((2 * D,), jnp.float32))
    cw = (mk((2 * D, 2 * D), jnp.float32), mk((2 * D,), jnp.float32),
          mk((2 * D, D), jnp.float32), mk((D,), jnp.float32))

    def comb3d(e, r, m):
        return fused_rowblock(combination_math, (e, r, m), (*lnw, *cw))

    args3d = (mk((A, M, D)), mk((A, M, D)), mk((A, M, D)))
    argsflat = (mk((A * MS, D)), mk((A * MS, D)), mk((A * MS, D)))
    bench_fwd("combination 3D fwd", comb3d, args3d)
    bench_fwd("combination flat fwd", comb3d, argsflat)
    bench_grad("combination 3D fwd+bwd", comb3d, args3d)
    bench_grad("combination flat fwd+bwd", comb3d, argsflat)

    # --- head stage
    hw = (mk((D, D), jnp.float32), mk((D,), jnp.float32),
          mk((D, D), jnp.float32), mk((D,), jnp.float32))

    def head(x):
        return fused_rowblock(head_math, (x,), hw)

    bench_fwd("head 3D fwd", head, (mk((A, M, D)),))
    bench_fwd("head flat fwd", head, (mk((A * MS, D)),))

    # --- reversed-edge gather
    from metatrain_tpu.ops.involution import permute_nef, permute_rows

    rev = make_reverse_fast(A, M)
    rev_i = jnp.asarray(rev // M, jnp.int32).reshape(A, M)
    rev_m = jnp.asarray(rev % M, jnp.int32).reshape(A, M)
    # flat-48 permutation over the full A*48 rows
    rev48 = jnp.asarray(make_reverse_fast(A, MS), jnp.int32)

    x3d = mk((A, M, D))
    xflat = mk((A * MS, D))

    bench_fwd("gather NEF-native (A,47,D)", lambda x: (permute_nef(x, rev_i, rev_m),), (x3d,))
    bench_fwd("gather flat48 (A*48,D)", lambda x: (permute_rows(x, rev48),), (xflat,))
    bench_grad("gather NEF-native fwd+bwd", lambda x: (permute_nef(x, rev_i, rev_m),), (x3d,))
    bench_grad("gather flat48 fwd+bwd", lambda x: (permute_rows(x, rev48),), (xflat,))


if __name__ == "__main__":
    main()
