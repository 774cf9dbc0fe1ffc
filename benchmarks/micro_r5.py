"""Round-5 lever micros, run on the real bench geometry (10,976-atom FCC,
grouped colored layout).

Questions answered on-chip (PERF_ANALYSIS.md r5 levers):

1. payload carry: does the grouped permute at D=256 cost ~2x its D=128
   time (matmul-bound) or less (onehot-generation amortized)?  Decides
   whether the position-gather adjoint can ride an existing permute.
2. pos-gather legs: time of the XLA fwd gather pos[nbr] (A,3)->(A,M,3),
   and of the adjoint (flat (A*M,3) permute + window sum).
3. in-kernel VMEM transpose: (BA, M, D) <-> (M, BA, D) swap cost inside a
   pallas kernel, per 138 MB edge array.  Decides the color-major
   end-to-end design (kill the XLA transposes or not).

Run: python benchmarks/micro_r5.py
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


def build_bench_batch():
    from metatrain_tpu.containers import System, batch_from_systems, bucket_neighbors
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    n_cells = int(os.environ.get("MTT_BENCH_CELLS", "14"))
    a = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    rng = np.random.default_rng(0)
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(n_cells)
            for j in range(n_cells)
            for k in range(n_cells)
        ]
    )
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(0, 0.05, size=(len(frac), 3))
    system = System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )
    os.environ["MTT_COLOR_GROUPED"] = "1"
    nbr = compute_neighbor_data(system, cutoff=4.5, colored=True)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=-(-len(system) // 256) * 256,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    return batch


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    batch = build_bench_batch()
    A = batch.n_atoms_padded
    M = batch.max_neighbors
    print(f"A={A} M={M} groups={batch.color_groups} "
          f"fixup_split={batch.color_fixup_split} "
          f"K={batch.extra['nbr_fixup_src'].shape if 'nbr_fixup_src' in batch.extra else None}",
          flush=True)

    from metatrain_tpu.ops.pallas.color_gather import colored_permute

    bd = {
        "nbr_reverse": jnp.asarray(batch.nbr_reverse),
        "nbr_indices": jnp.asarray(batch.nbr_indices),
    }
    fix_src = jnp.asarray(batch.extra.get("nbr_fixup_src", np.zeros((A // 256, 0), np.int32)))
    fix_dst = jnp.asarray(batch.extra.get("nbr_fixup_dst", np.zeros((A // 256, 0), np.int32)))
    groups = batch.color_groups
    split = batch.color_fixup_split

    rng = np.random.default_rng(1)

    def permute_fn(x):
        return colored_permute(
            x, bd["nbr_reverse"].reshape(-1), bd["nbr_indices"],
            fix_src, fix_dst, band=0, groups=groups, fixup_split=split,
        )

    for Dp in (128, 256):
        x = jnp.asarray(rng.normal(size=(A, M, Dp)), jnp.bfloat16)
        secs = chain_time(permute_fn, (x,), n1=5, n2=25)
        print(f"grouped permute D={Dp}: {secs*1e3:.3f} ms", flush=True)

    # -- pos gather legs ----------------------------------------------------
    pos = jnp.asarray(rng.normal(size=(A, 3)), jnp.float32)
    nbr_idx = bd["nbr_indices"]
    rev = bd["nbr_reverse"].reshape(-1)

    def fwd_gather(pos):
        return jnp.take(pos, nbr_idx, axis=0)

    secs = chain_time(fwd_gather, (pos,), n1=5, n2=25)
    print(f"pos fwd gather (A,3)->(A,M,3): {secs*1e3:.3f} ms", flush=True)

    dvec = jnp.asarray(rng.normal(size=(A, M, 3)), jnp.float32)

    def adjoint(dvec):
        flat = dvec.reshape(A * M, 3)
        revd = jnp.take(flat, rev, axis=0).reshape(A, M, 3)
        return jnp.sum(revd, axis=1)

    secs = chain_time(adjoint, (dvec,), n1=5, n2=25)
    print(f"pos adjoint (permute+wsum): {secs*1e3:.3f} ms", flush=True)

    def adjoint_scatter(dvec):
        flat = dvec.reshape(A * M, 3)
        return jax.ops.segment_sum(flat, nbr_idx.reshape(-1), num_segments=A)

    secs = chain_time(adjoint_scatter, (dvec,), n1=5, n2=25)
    print(f"pos adjoint (segment_sum): {secs*1e3:.3f} ms", flush=True)

    # payload variant: permute a D=128 cotangent with 3 extra payload
    # lanes packed into a 256-lane array (the real fused plan), vs the
    # 128-lane permute + separate XLA adjoint
    ct = jnp.asarray(rng.normal(size=(A, M, 128)), jnp.bfloat16)

    def fused_payload(ct, dvec):
        payload = jnp.concatenate(
            [ct, dvec.astype(jnp.bfloat16),
             jnp.zeros((A, M, 125), jnp.bfloat16)], axis=-1)
        out = permute_fn(payload)
        return out[:, :, :128], jnp.sum(out[:, :, 128:131].astype(jnp.float32), axis=1)

    secs = chain_time(fused_payload, (ct, dvec), n1=5, n2=25)
    print(f"payload permute (128+3 in 256): {secs*1e3:.3f} ms", flush=True)

    # -- VMEM transpose cost ------------------------------------------------
    BA = 256
    D = 128
    G = A // BA

    def kern_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def kern_swap(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    x = jnp.asarray(rng.normal(size=(A, M, D)), jnp.bfloat16)

    for name, kern, oshape, ospec in (
        ("pallas copy (BA,M,D)", kern_copy, (A, M, D),
         pl.BlockSpec((BA, M, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        ("pallas swap (BA,M,D)->(M,BA,D)", kern_swap, (M, A, D),
         pl.BlockSpec((M, BA, D), lambda i: (0, i, 0), memory_space=pltpu.VMEM)),
    ):
        @jax.jit
        def run(x, _kern=kern, _oshape=oshape, _ospec=ospec):
            return pl.pallas_call(
                _kern,
                grid=(G,),
                in_specs=[pl.BlockSpec((BA, M, D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=_ospec,
                out_shape=jax.ShapeDtypeStruct(_oshape, x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
            )(x)

        try:
            run(x).block_until_ready()
            secs = chain_time(lambda x, _run=run: _run(x), (x,), n1=5, n2=25)
            print(f"{name}: {secs*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)

    # XLA transpose reference
    def xla_T(x):
        return jnp.swapaxes(x, 0, 1)

    secs = chain_time(xla_T, (x,), n1=5, n2=25)
    print(f"XLA transpose (A,M,D)->(M,A,D): {secs*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
