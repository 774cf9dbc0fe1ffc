"""Colored reversed-edge permutation: banded one-hot matmuls on the MXU.

PET's message reversal is an involutive permutation of (A*M, D) edge
rows. XLA's gather pays a full HBM tile per random 256 B row (~5.9 ms
per 140 MB at the 10k-atom bench, the single largest non-matmul cost of
a force call). This module exploits two structural properties created by
the host-side NEF builder (``ops/neighbors.py`` with ``colored=True``):

- **slot preservation**: NEF slots are assigned by proper edge coloring
  (C++ ``color_edges``), so edge (a, b) occupies the SAME slot m in both
  windows and the reversal becomes ``out[a, m] = x[nbr_indices[a, m], m]``
  -- no extra index arrays;
- **bandedness**: for spatially-ordered atoms the matched atom is within
  a bounded circular index distance (``band``), so a block of output
  atoms only needs a contiguous band of input atoms.

The kernel DMAs the color-major band contiguously and computes, per
block of atoms, ONE batched one-hot matmul over the color axis:
``(M, BA, W) @ (M, W, D)`` -- measured at ~163 TF/s on v5e
(benchmarks/micro_color2.py), turning the permutation into ~2 ms of
MXU work. Rows whose reversal is not slot-preserving-in-band (coloring
overflow, periodic self-image pairs, band outliers -- <1% by
construction) are patched afterwards by a tiny XLA row gather+scatter
(the ``fixup`` lists, built at batch assembly in
``containers/system.py:colored_fixups``).

The one-hot matmul is EXACT (not approximate): each output row picks one
band row with weight 1.0; bf16 inputs accumulate in f32 and round-trip
bit-identically, and f32 inputs survive the MXU's split-accumulate
passes exactly because the second factor is exactly 1.0 or 0.0. So the
colored path equals ``x.reshape(A*M, D)[rev]`` bitwise for every row
(masked slots self-map inside their own block's band).

The op is a JAX primitive (same pattern as ``ops/involution``): the
permutation is involutive, so JVP and autodiff transpose are the SAME
op -- grad and grad-of-grad never materialize a scatter.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir


# Rows below which the XLA gather wins (kernel launch + margin copies
# dominate); also the threshold for enabling the colored layout at all.
MIN_ROWS = 65536

# Margin buckets: the band half-width is rounded up so kernel geometry
# (and therefore compilation) stays coarse-grained, not per batch. Finer
# than powers of two near the top: the VMEM band scratch scales with the
# bucket (2*M*W*D), and at 10k-atom shapes the jump 1024 -> 2048 would
# blow the budget while ~1536 suffices for periodic wrap margins.
BAND_BUCKETS = (256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 1792, 2048)
_COLOR_CHUNK = 8
# Band-scratch cap. The double-buffered band slab (2*M*W*D bytes) is the
# dominant VMEM consumer but not the only one: the kernel's one-hot and
# result temporaries add ~35-40 MB at bench shapes, and the whole scoped
# allocation must stay under ``vmem_limit_bytes`` (120 MB). 80 MB here
# keeps the total near ~105 MB at the largest supported geometry
# (measured: mg=1536 scratch = 81.8 MB put the total 108 KB OVER the
# 120 MB limit on v5e; mg=1280 -> 69.2 MB fits).
_VMEM_BUDGET = 76 * 1024 * 1024

# Measured v5e cost coefficients for the band-selection model
# (benchmarks: one-hot matmul ~180 TF/s; XLA row scatter ~0.28 us/row;
# XLA random row gather ~11 ns/row at 256 B rows). Selection picks the
# band minimizing matmul-width cost + fixup-scatter cost, and reports
# band 0 when the plain gather is estimated faster.
SCATTER_SECONDS_PER_ROW = 0.28e-6
GATHER_SECONDS_PER_ROW = 11e-9
MATMUL_FLOPS_PER_SECOND = 175e12


def kernel_geometry(A: int, band: int) -> Optional[Tuple[int, int, int]]:
    """(BA, mg, W) for the banded kernel, or None if unsupported.

    Shared by the device kernel and the host-side fixup detection in
    ``containers/system.py`` -- both must agree exactly on the block
    window placement: block g covers output atoms [g*BA, (g+1)*BA) and
    reads extended rows [g*BA, g*BA + W), i.e. atoms
    [(g*BA - mg) mod A, ...) circularly.
    """
    if band <= 0 or band > BAND_BUCKETS[-1]:
        return None
    mg = next(b for b in BAND_BUCKETS if b >= band)
    BA = 256 if A % 256 == 0 else 128
    if A % BA != 0 or A < BA or A < 2 * mg + BA:
        return None
    W = BA + 2 * mg
    return BA, mg, W


def local_band_index(nbr, a0_block, mg: int, A: int, W: int, xp=jnp):
    """Band-local row of matched atom ``nbr`` for the block starting at
    output atom ``a0_block`` (= g*BA). Mirrors the kernel's wrap
    arithmetic exactly; the result is valid iff it lands in [0, W)
    BEFORE the final clip (checked host-side, ``colored_fixups``)."""
    l = nbr + mg - a0_block
    l = xp.where(l < 0, l + A, l)
    l = xp.where(l >= W, l - A, l)
    return l


# -- kernel ------------------------------------------------------------------


def _band_dma(x_hbm, band, sems, slot, gi, *, A, BA, mg, W, G, start, ext=False):
    """Start (or wait for) the band DMA of block ``gi`` into ``band[slot]``.

    Reads directly from the color-major (M, A, D) array: interior blocks
    are one contiguous window per color; the first/last ``ceil(mg/BA)``
    blocks wrap circularly and are served by TWO static-size copies
    (DMA sizes must be trace-time constants, so each wrap block gets its
    own ``pl.when`` branch -- the split point differs per block)."""
    n_wrap = -(-mg // BA)
    gi = jnp.asarray(gi, jnp.int32)

    def act(copy):
        copy.start() if start else copy.wait()

    if ext:  # extended-copy layout: every window is one plain slab
        act(
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(pl.multiple_of(gi * BA, BA), W), :],
                band.at[slot],
                sems.at[slot, 0],
            )
        )
        return

    is_interior = jnp.logical_and(gi >= n_wrap, gi < G - n_wrap)

    @pl.when(is_interior)
    def _():
        # BA and every BAND_BUCKET are multiples of 128, so the start is
        # 8-sublane-aligned; Mosaic cannot prove that through the
        # subtraction ("Failed to prove that a tile index in dimension 1
        # is divisible by the tiling (8)", v5e 2026-08 libtpu) without
        # the explicit multiple_of annotation.
        start_i = pl.multiple_of(gi * BA - mg, 8)
        act(
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(start_i, W), :],
                band.at[slot],
                sems.at[slot, 0],
            )
        )

    for gs in range(n_wrap):
        s = mg - gs * BA  # rows wrapped around from the top end
        if s <= 0:
            continue

        @pl.when(gi == gs)
        def _(s=s):
            act(
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(A - s, s), :],
                    band.at[slot, :, pl.ds(0, s), :],
                    sems.at[slot, 0],
                )
            )
            act(
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(0, W - s), :],
                    band.at[slot, :, pl.ds(s, W - s), :],
                    sems.at[slot, 1],
                )
            )

    for k in range(n_wrap):
        over = mg - k * BA  # rows wrapped past the bottom end
        if over <= 0:
            continue

        @pl.when(gi == G - 1 - k)
        def _(over=over, k=k):
            lo = (G - 1 - k) * BA - mg
            act(
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(lo, W - over), :],
                    band.at[slot, :, pl.ds(0, W - over), :],
                    sems.at[slot, 0],
                )
            )
            act(
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(0, over), :],
                    band.at[slot, :, pl.ds(W - over, over), :],
                    sems.at[slot, 1],
                )
            )


def _roll_chunk_dma(x_hbm, band2, sems, c, *, A, BA, mg, NR, start):
    """Start (or wait for) the DMA of stream chunk ``c`` into the rolling
    ring buffer.

    The band stream is the linear row sequence s in [0, A + 2*mg) with
    physical source row (s - mg) mod A; chunk c covers stream rows
    [c*BA, (c+1)*BA). Ring slot rho = (c mod NR) * BA; every chunk is
    written TWICE (at rho and rho + R, R = NR*BA) so any W-wide window
    read [phi, phi + W) with phi in [0, R) is contiguous.

    At most two chunk indices straddle a physical boundary (stream rows
    mg and A + mg); their split sizes are trace-time constants, so each
    gets its own ``pl.when`` branch (DMA sizes must be static).
    """
    R = NR * BA
    c = jnp.asarray(c, jnp.int32)
    rho = jax.lax.rem(c, jnp.asarray(NR, jnp.int32)) * BA

    def act(copy):
        copy.start() if start else copy.wait()

    # boundary-straddling chunk indices (static): stream row mg inside
    # chunk c_lo, stream row A + mg inside chunk c_hi
    split_chunks = []
    if mg % BA:
        c_lo = mg // BA
        s1 = mg - c_lo * BA  # rows from the top end [A - s1, A)
        split_chunks.append((c_lo, s1))
        c_hi = (A + mg) // BA
        t1 = A + mg - c_hi * BA  # rows up to A, then wrap to [0, BA - t1)
        if c_hi != c_lo:
            split_chunks.append((c_hi, t1))
    is_split = jnp.zeros((), jnp.bool_)
    for cs, _ in split_chunks:
        is_split = jnp.logical_or(is_split, c == cs)

    @pl.when(jnp.logical_not(is_split))
    def _():
        p0 = jax.lax.rem(c * BA - mg + A, jnp.asarray(A, jnp.int32))
        p0 = pl.multiple_of(p0, 8)
        for k, dst0 in enumerate((rho, rho + R)):
            act(
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(p0, BA), :],
                    band2.at[:, pl.ds(pl.multiple_of(dst0, 8), BA), :],
                    sems.at[jax.lax.rem(c, jnp.asarray(NR, jnp.int32)), k],
                )
            )

    for cs, s1 in split_chunks:

        @pl.when(c == cs)
        def _(cs=cs, s1=s1):
            # stream [cs*BA, cs*BA + s1) = physical [A - s1, A);
            # remainder wraps to [0, BA - s1)
            for k, dst0 in enumerate((rho, rho + R)):
                act(
                    pltpu.make_async_copy(
                        x_hbm.at[:, pl.ds(A - s1, s1), :],
                        band2.at[:, pl.ds(pl.multiple_of(dst0, 8), s1), :],
                        sems.at[
                            jax.lax.rem(c, jnp.asarray(NR, jnp.int32)), k
                        ],
                    )
                )
                act(
                    pltpu.make_async_copy(
                        x_hbm.at[:, pl.ds(0, BA - s1), :],
                        band2.at[:, pl.ds(dst0 + s1, BA - s1), :],
                        sems.at[
                            jax.lax.rem(c, jnp.asarray(NR, jnp.int32)), 2 + k
                        ],
                    )
                )


def _width_classes(groups):
    """Consecutive runs of equal-width groups, merged into one scratch
    band each so their one-hot matmuls batch together (a cap-1 group's
    (1, BA, W) dot otherwise runs at a fraction of MXU utilization).
    Returns ``[(group_indices, width, row_offsets, total_cap), ...]``;
    row_offsets position each group's slots inside the class band.
    """
    classes = []
    for gi, (base, cap, delta, width, pair) in enumerate(groups):
        if classes and classes[-1][1] == width:
            gids, w, offsets, total = classes[-1]
            classes[-1] = (gids + [gi], w, offsets + [total], total + cap)
        else:
            classes.append(([gi], width, [0], cap))
    return classes


def _grouped_band_dma(
    x_hbm, band, sems, gi, block, slot, *, A, BA, G, groups, mgx, ext,
    start,
):
    """Start (or wait for) group ``gi``'s window DMA for ``block``.

    With ``ext`` the source is the (M, A + 2*mgx, D) extended color-major
    array and every window is one contiguous slab. Without it the source
    is the plain (M, A, D) color-major array: group deltas are STATIC,
    so the set of blocks whose window wraps the circular boundary is
    static per group, and each wrapping block is served by two
    static-size copies under its own ``pl.when`` branch (the same
    pattern as the ungrouped ``_band_dma``, generalized to a per-group
    window offset) -- no extended HBM copy of the whole array.
    """
    base, cap, delta, width, pair = groups[gi]
    W = BA + 2 * width
    pair_base = groups[pair][0]
    u = delta - width  # static window offset from the block start
    gi_ = jnp.asarray(block, jnp.int32)

    def act(copy):
        copy.start() if start else copy.wait()

    if ext:
        t0 = block * BA + (u + mgx)
        t0 = pl.multiple_of(t0, 8)
        act(
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pair_base, cap), pl.ds(t0, W), :],
                band.at[slot],
                sems.at[gi, slot, 0],
            )
        )
        return

    # per-block window start, normalized into [0, A): u is static, so
    # the set of blocks whose window straddles the circular boundary --
    # and each one's split point -- is static per group
    wrap = [i for i in range(G) if (i * BA + u) % A + W > A]
    interior = jnp.ones((), jnp.bool_)
    for i in wrap:
        interior = jnp.logical_and(interior, gi_ != i)

    @pl.when(interior)
    def _():
        s0 = block * BA + u  # in (-A, 2A): two conditional wraps
        s0 = jnp.where(s0 < 0, s0 + A, s0)
        s0 = jnp.where(s0 >= A, s0 - A, s0)
        s0 = pl.multiple_of(s0, 8)
        act(
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pair_base, cap), pl.ds(s0, W), :],
                band.at[slot],
                sems.at[gi, slot, 0],
            )
        )

    for i in wrap:
        s_norm = (i * BA + u) % A
        n1 = A - s_norm  # rows before the boundary (< W)

        @pl.when(gi_ == i)
        def _(s_norm=s_norm, n1=n1):
            act(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pair_base, cap), pl.ds(s_norm, n1), :],
                    band.at[slot, :, pl.ds(0, n1), :],
                    sems.at[gi, slot, 0],
                )
            )
            act(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pair_base, cap), pl.ds(0, W - n1), :],
                    band.at[slot, :, pl.ds(n1, W - n1), :],
                    sems.at[gi, slot, 1],
                )
            )


def _grouped_kernel(
    idx_ref, dstloc_ref, vals_ref, x_hbm, *rest,
    A, M, D, BA, K, groups, mgx, k_split=0, ov_base=0, has_acc=False,
):
    if has_acc:
        acc_ref, out_ref, *scratch = rest
    else:
        acc_ref = None
        out_ref, *scratch = rest
    """Grouped-window variant: slots are partitioned into sigma-paired
    groups, each with its own (narrow) circular window at offset delta
    -- the one-hot matmul width drops ~3x vs the all-slots band (the
    permute is compute-bound: the r3 rolling-DMA A/B showed band HBM
    traffic is already overlapped).

    ``x_hbm`` is the (M, A, D) color-major array (or its (M, A + 2*mgx,
    D) extended copy under ``MTT_COLOR_GEXT=1``); windows are served by
    ``_grouped_band_dma`` (static per-group wrap branches). Output slot
    m = base_g + k of block i reads color ``pair_base_g + k`` rows
    [i*BA + delta_g - w_g, + W_g) circularly: the sigma pairing maps
    slot k of a group to slot k of its mirror group, so the slab is
    contiguous in the color axis too.

    Masked (padded) slots of non-self-paired groups carry unspecified
    values (their reversal is not representable color-contiguously);
    every consumer masks them (nbr_mask / cutoff factors) and their
    cotangents are exactly zero, so autodiff through the involution
    stays exact for real rows. Self-paired groups (including the wide
    overflow group, which also holds the reserved always-masked batch
    slot) serve masked rows their own value exactly, like the ungrouped
    kernel.
    """
    g = pl.program_id(0)
    G = pl.num_programs(0)
    classes = _width_classes(groups)
    bands = scratch[: len(classes)]
    sems = scratch[len(classes)]
    ext = x_hbm.shape[1] != A
    G_static = A // BA

    def dma(ci, gi_local, block, slot, start):
        gids, _, offsets, _ = classes[ci]
        gi = gids[gi_local]
        cap = groups[gi][1]
        band = bands[ci]
        _grouped_band_dma(
            x_hbm,
            band.at[:, pl.ds(offsets[gi_local], cap)],
            sems, gi, block, slot, A=A, BA=BA,
            G=G_static, groups=groups, mgx=mgx, ext=ext, start=start,
        )

    def all_dma(block, slot, start):
        for ci, (gids, _, _, _) in enumerate(classes):
            for j in range(len(gids)):
                dma(ci, j, block, slot, start)

    @pl.when(g == 0)
    def _():
        all_dma(0, 0, start=True)

    slot = jax.lax.rem(g, jnp.asarray(2, g.dtype))
    all_dma(g, slot, start=False)

    @pl.when(g + 1 < G)
    def _():
        all_dma(g + 1, 1 - slot, start=True)

    dtype = out_ref.dtype
    res_groups = []
    for ci, (gids, width_c, offsets, class_cap) in enumerate(classes):
        W = BA + 2 * width_c
        window = bands[ci].at[slot]  # (class_cap, W, D)
        # per-slot local window rows: each group's own circular offset
        l_parts = []
        for gi in gids:
            base, cap, delta, width, pair = groups[gi]
            idx_g = jax.lax.slice(idx_ref[:], (0, base), (BA, base + cap))
            l = idx_g + (width - delta) - g * BA
            l = jnp.where(l < 0, l + A, l)
            l = jnp.where(l >= A, l - A, l)  # delta can push either way
            l = jnp.clip(l, 0, W - 1)
            l_parts.append(jnp.swapaxes(l, 0, 1))  # (cap, BA)
        lT = jnp.concatenate(l_parts, axis=0)  # (class_cap, BA)
        chunks = []
        for c0 in range(0, class_cap, _COLOR_CHUNK):
            c1 = min(c0 + _COLOR_CHUNK, class_cap)
            cmp = jax.lax.broadcasted_iota(jnp.int32, (c1 - c0, BA, W), 2)
            lc = jax.lax.slice(lT, (c0, 0), (c1, BA))
            onehot = (cmp == lc[:, :, None]).astype(dtype)
            res = jax.lax.dot_general(
                onehot,
                window[c0:c1],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            chunks.append(res.astype(dtype))
        res_groups.append(jnp.concatenate(chunks, axis=0))
    res_all = jnp.concatenate(res_groups, axis=0)  # (M, BA, D)

    if K:
        # Range-split fixup: the host fill routes unassigned edges into
        # the wide overflow group's slots whenever one is free, so most
        # fixup destinations live in the slot range [ov_base, M) -- the
        # main correction matmul only spans those (M - ov_base) * BA
        # rows (~4-8x fewer); a second small matmul over all rows
        # patches the stragglers (dst column split is static: tier A in
        # [0, k_split), tier B in [k_split, K)). Both one-hot matmuls
        # are exact; dst == -1 matches nothing.
        def apply_fix(res2d, dst, vals):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (res2d.shape[0], dst.shape[-1]), 0
            )
            onehot_fix = (rows == dst).astype(dtype)
            keep = 1.0 - jnp.sum(
                onehot_fix.astype(jnp.float32), axis=1, keepdims=True
            ).astype(dtype)
            corr = jax.lax.dot_general(
                onehot_fix,
                vals,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            return res2d * keep + corr

        k1 = k_split
        if k1:
            # tier B (full-range stragglers) first, then the restricted
            # tier A: a fixup matmul consuming the concat result below
            # trips Mosaic ("Invalid input layout", v5e 2026-08), so the
            # concat must come last
            if k1 < K:
                res_flat = apply_fix(
                    res_all.reshape(M * BA, D),
                    dstloc_ref[0][:, k1:],
                    vals_ref[0][k1:],
                )
                res_all = res_flat.reshape(M, BA, D)
            M_ov = M - ov_base
            res_ov = apply_fix(
                res_all[ov_base:].reshape(M_ov * BA, D),
                dstloc_ref[0][:, :k1],
                vals_ref[0][:k1],
            )
            res_all = jnp.concatenate(
                [res_all[:ov_base], res_ov.reshape(M_ov, BA, D)], axis=0
            )
        else:
            res_flat = apply_fix(
                res_all.reshape(M * BA, D), dstloc_ref[0], vals_ref[0]
            )
            res_all = res_flat.reshape(M, BA, D)

    out = jnp.swapaxes(res_all, 0, 1)
    if acc_ref is not None:
        # fused accumulate: out = permute(x) + acc in one store, saving
        # the separate XLA add's full read+write round trip (the r4
        # profile's add_any cotangent adds)
        out = out + acc_ref[:]
    out_ref[:] = out


def grouped_geometry(A: int, groups, M: Optional[int] = None) -> Optional[Tuple[int, int]]:
    """(BA, mgx) for the grouped kernel, or None if unsupported.

    Requirements (shared with the host-side fixup detection): BA divides
    A; group slots partition [0, M) contiguously in spec order; deltas
    are multiples of 8 and widths multiples of 128 (DMA sublane
    alignment); pairing is involutive with mirrored deltas and equal
    caps; the last group is self-paired at delta 0 (it absorbs the
    reserved always-masked batch slot).
    """
    if not groups:
        return None
    BA = 256 if A % 256 == 0 else 128
    if A % BA or A < BA:
        return None
    next_base = 0
    mgx = 0
    for gi, (base, cap, delta, width, pair) in enumerate(groups):
        if base != next_base or cap < 1:
            return None
        next_base += cap
        if delta % 8 or width % 128 or width < 128:
            return None
        if pair < 0 or pair >= len(groups):
            return None
        _, pc, pd, pw, pp = groups[pair]
        if pc != cap or pd != -delta or pw != width or pp != gi:
            return None
        mgx = max(mgx, abs(delta) + width)
    last = groups[-1]
    if last[2] != 0 or last[4] != len(groups) - 1:
        return None
    if M is not None and next_base != M:
        return None
    mgx = -(-mgx // 128) * 128
    if A < 2 * mgx + BA:
        return None
    return BA, mgx


def _kernel_impl_grouped(
    x, nbr_indices, fixup_src, fixup_dst, groups, interpret: bool,
    fixup_split=(0, 0), acc=None,
):
    A, M, D = x.shape
    BA, mgx = grouped_geometry(A, groups, M)
    G = A // BA
    GK, K = fixup_src.shape
    if GK != G:
        raise ValueError(
            f"fixup lists built for {GK} blocks, kernel grid has {G}"
        )

    xT = jnp.swapaxes(x, 0, 1)  # (M, A, D)
    # MTT_COLOR_GEXT=1: extended-copy layout (one plain slab per window)
    # -- A/B fallback; the default serves wrap windows with static split
    # copies straight from the color-major array (the extended copy cost
    # ~0.54 ms/permute of pure HBM traffic at the 10k bench, r4 profile)
    if os.environ.get("MTT_COLOR_GEXT", "0") != "0":
        xT = jnp.concatenate([xT[:, A - mgx:], xT, xT[:, :mgx]], axis=1)

    if K:
        vals = jnp.take(
            x.reshape(A * M, D), fixup_src.reshape(-1), axis=0
        ).reshape(G, K, D)
    else:
        vals = jnp.zeros((G, 1, D), x.dtype)

    scratch = [
        pltpu.VMEM((2, class_cap, BA + 2 * width, D), x.dtype)
        for (_, width, _, class_cap) in _width_classes(groups)
    ] + [pltpu.SemaphoreType.DMA((len(groups), 2, 2))]

    k_split, ov_base = fixup_split
    block3 = pl.BlockSpec(
        (BA, M, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    operands = [
        nbr_indices,
        fixup_dst.reshape(G, 1, -1) if K else jnp.zeros((G, 1, 1), jnp.int32),
        vals,
        xT,
    ]
    in_specs = [
        pl.BlockSpec((BA, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, max(K, 1)), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, max(K, 1), D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if acc is not None:
        operands.append(acc)
        in_specs.append(block3)
    return pl.pallas_call(
        functools.partial(
            _grouped_kernel, A=A, M=M, D=D, BA=BA, K=K, groups=groups,
            mgx=mgx, k_split=int(k_split), ov_base=int(ov_base),
            has_acc=acc is not None,
        ),
        grid=(G,),
        in_specs=in_specs,
        out_specs=block3,
        out_shape=jax.ShapeDtypeStruct((A, M, D), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _kernel(
    idx_ref, dstloc_ref, vals_ref, x_hbm, *rest,
    A, M, D, W, mg, BA, K, ext, roll=False, has_acc=False,
):
    if has_acc:
        acc_ref, out_ref, band, sems = rest
    else:
        acc_ref = None
        out_ref, band, sems = rest
    g = pl.program_id(0)
    G = pl.num_programs(0)

    if roll:
        # rolling ring buffer: one (M, BA, D) chunk DMA per step instead
        # of re-reading the whole (M, W, D) window -- band HBM traffic
        # drops by the W/BA overlap factor (~8x at bench geometry)
        NC = W // BA  # chunks per window
        NR = NC + 1  # ring slots (one extra so the next-step prefetch
        # never lands on a slot this step still reads)
        nchunks = G + 2 * mg // BA
        dma = functools.partial(
            _roll_chunk_dma, x_hbm, band, sems, A=A, BA=BA, mg=mg, NR=NR
        )

        @pl.when(g == 0)
        def _():
            for c in range(NC):
                dma(c, start=True)

        # prefetch the chunk step g+1 needs; its ring slot held chunk
        # g-1, which this step's window [g, g+NC) does not read
        @pl.when(g + NC < nchunks)
        def _():
            dma(g + NC, start=True)

        @pl.when(g == 0)
        def _():
            for c in range(NC - 1):
                dma(c, start=False)

        dma(g + NC - 1, start=False)

        R = NR * BA
        phi = jax.lax.rem(g, jnp.asarray(NR, jnp.int32)) * BA
        phi = pl.multiple_of(phi, 8)
        window = band.at[:, pl.ds(phi, W), :]  # (M, W, D) view
    else:
        dma = functools.partial(
            _band_dma, x_hbm, band, sems, A=A, BA=BA, mg=mg, W=W, G=G,
            ext=ext,
        )

        @pl.when(g == 0)
        def _():
            dma(0, 0, start=True)

        slot = jax.lax.rem(g, jnp.asarray(2, g.dtype))
        dma(slot, g, start=False)

        @pl.when(g + 1 < G)
        def _():
            dma(1 - slot, g + 1, start=True)

        window = band.at[slot]  # (M, W, D) view of the active buffer

    l = local_band_index(idx_ref[:], g * BA, mg, A, W)  # (BA, M)
    l = jnp.clip(l, 0, W - 1)
    lT = jnp.swapaxes(l, 0, 1)  # (M, BA)

    dtype = out_ref.dtype
    chunks = []
    for c0 in range(0, M, _COLOR_CHUNK):
        c1 = min(c0 + _COLOR_CHUNK, M)
        cmp = jax.lax.broadcasted_iota(jnp.int32, (c1 - c0, BA, W), 2)
        # NB: lax.slice, not lT[c0:c1] -- jnp basic indexing lowers via
        # gather here, which Mosaic cannot lower inside a kernel
        lc = jax.lax.slice(lT, (c0, 0), (c1, BA))
        onehot = (cmp == lc[:, :, None]).astype(dtype)
        res = jax.lax.dot_general(
            onehot,
            window[c0:c1],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (chunk, BA, D)
        chunks.append(res.astype(dtype))
    res_all = jnp.concatenate(chunks, axis=0)  # (M, BA, D)

    if K:
        # in-kernel fixup: zero the non-servable rows and add their true
        # values with a second one-hot matmul. An XLA row scatter costs
        # ~2 ms FLAT at this array size (measured) -- this is free.
        # dst_local entries index the block-local (M*BA) flat layout
        # (m * BA + a_local); -1 padding matches nothing.
        dst = dstloc_ref[0]  # (1, K) int32
        rows = jax.lax.broadcasted_iota(jnp.int32, (M * BA, K), 0)
        onehot_fix = (rows == dst).astype(dtype)  # (M*BA, K)
        keep = 1.0 - jnp.sum(
            onehot_fix.astype(jnp.float32), axis=1, keepdims=True
        ).astype(dtype)
        corr = jax.lax.dot_general(
            onehot_fix,
            vals_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)  # (M*BA, D)
        res_flat = res_all.reshape(M * BA, D) * keep + corr
        res_all = res_flat.reshape(M, BA, D)

    out = jnp.swapaxes(res_all, 0, 1)
    if acc_ref is not None:
        out = out + acc_ref[:]  # fused accumulate (see _grouped_kernel)
    out_ref[:] = out


def _kernel_impl(x, nbr_indices, fixup_src, fixup_dst, band_width: int,
                 interpret: bool, acc=None):
    A, M, D = x.shape
    BA, mg, W = kernel_geometry(A, band_width)
    G = A // BA
    GK, K = fixup_src.shape
    if GK != G:
        raise ValueError(
            f"fixup lists built for {GK} blocks, kernel grid has {G} -- "
            "band/geometry mismatch between batch assembly and kernel"
        )

    # Wrap-DMA layout by default: band DMAs read straight from the
    # color-major (M, A, D) array, wrap blocks served by two static-size
    # copies -- no extended HBM copy. Hardware-validated on TPU v5e
    # (on-chip lane + bench force guard; an earlier MosaicError was the
    # missing ``pl.multiple_of`` alignment proof on the interior band
    # start, see ``_band_dma``). ``MTT_COLOR_EXT=1`` selects the
    # extended-copy layout (A/B knob): every block's band is one plain
    # contiguous slab of an (M, A+2*mg, D) extended copy of the array.
    # ``MTT_COLOR_ROLL=1`` selects the rolling ring-buffer layout: the
    # band advances by one (M, BA, D) chunk DMA per block instead of
    # re-reading the whole (M, W, D) window, cutting band HBM traffic by
    # the W/BA overlap factor (~8x at bench geometry). Needs W % BA == 0
    # (true for all BAND_BUCKETS: BA and mg are multiples of 128).
    xT = jnp.swapaxes(x, 0, 1)  # (M, A, D)
    use_roll = (
        os.environ.get("MTT_COLOR_ROLL", "0") != "0" and W % BA == 0
    )
    use_ext = (
        not use_roll and os.environ.get("MTT_COLOR_EXT", "0") != "0"
    )
    if use_ext:
        xT = jnp.concatenate([xT[:, A - mg :], xT, xT[:, :mg]], axis=1)
    NR = W // BA + 1

    # patch values for the in-kernel fixup: a tiny XLA row gather
    if K:
        vals = jnp.take(
            x.reshape(A * M, D), fixup_src.reshape(-1), axis=0
        ).reshape(G, K, D)
    else:
        vals = jnp.zeros((G, 1, D), x.dtype)

    block3 = pl.BlockSpec(
        (BA, M, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    operands = [
        nbr_indices,
        fixup_dst.reshape(G, 1, -1) if K else jnp.zeros((G, 1, 1), jnp.int32),
        vals,
        xT,
    ]
    in_specs = [
        pl.BlockSpec((BA, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, max(K, 1)), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, max(K, 1), D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if acc is not None:
        operands.append(acc)
        in_specs.append(block3)
    return pl.pallas_call(
        functools.partial(
            _kernel, A=A, M=M, D=D, W=W, mg=mg, BA=BA, K=K, ext=use_ext,
            roll=use_roll, has_acc=acc is not None,
        ),
        grid=(G,),
        in_specs=in_specs,
        out_specs=block3,
        out_shape=jax.ShapeDtypeStruct((A, M, D), x.dtype),
        scratch_shapes=(
            [
                pltpu.VMEM((M, 2 * NR * BA, D), x.dtype),
                pltpu.SemaphoreType.DMA((NR, 4)),
            ]
            if use_roll
            else [
                pltpu.VMEM((2, M, W, D), x.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


# -- primitive ---------------------------------------------------------------

colored_permute_p = jex_core.Primitive("colored_permute")


def colored_permute(
    x, rev, nbr_indices, fixup_src, fixup_dst, *, band: int, groups=(),
    fixup_split=(0, 0),
):
    """``x.reshape(A*M, D)[rev].reshape(A, M, D)`` via the banded colored
    kernel (TPU) or a plain gather (other backends / band == 0).

    :param x: (A, M, D) edge array.
    :param rev: (A*M,) involutive flat permutation (fallback + fixup
        source; padded slots self-map).
    :param nbr_indices: (A, M) int32 neighbor atom per slot -- under the
        colored layout this IS the matched atom per color.
    :param fixup_src: (G, K) int32: per kernel block, the GLOBAL flat
        rows (into A*M) whose values patch the block's non-servable
        outputs; padding entries may point anywhere valid.
    :param fixup_dst: (G, K) int32: the matching BLOCK-LOCAL output rows
        in the kernel's (M*BA) color-major layout (``m * BA + a_local``);
        padding entries are -1 (match nothing). The non-servable set is
        symmetric under the involution, so the autodiff transpose uses
        the same lists.
    :param band: circular atom-index band bound (static); 0 disables the
        kernel path.
    :param groups: static tuple of (base, cap, delta, width, pair) slot
        groups for the grouped-window layout (``_grouped_kernel``);
        empty selects the single-band kernel. Under the grouped layout,
        masked slots of non-self-paired groups carry unspecified values
        in the kernel path (every consumer masks them and their
        cotangents are exactly zero); the plain-gather fallback still
        self-serves them via ``rev``.
    """
    return colored_permute_p.bind(
        x,
        rev,
        nbr_indices,
        fixup_src,
        fixup_dst,
        band=int(band),
        groups=tuple(tuple(int(v) for v in g) for g in groups),
        fixup_split=(int(fixup_split[0]), int(fixup_split[1])),
    )


def use_kernel(x_shape, dtype, band: int) -> bool:
    """Whether the banded kernel path applies (shape/dtype/VMEM gates).
    The decision must be trace-time static: it depends only on shapes and
    the static band."""
    if band <= 0:
        return False
    A, M, D = x_shape
    if A * M < MIN_ROWS or D % 128 != 0 or M % _COLOR_CHUNK != 0:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    geom = kernel_geometry(A, band)
    if geom is None:
        return False
    _, _, W = geom
    itemsize = jnp.dtype(dtype).itemsize
    if 2 * M * W * D * itemsize > _VMEM_BUDGET:
        return False
    return True


def use_kernel_grouped(x_shape, dtype, groups) -> bool:
    """Trace-time static gate for the grouped-window kernel path."""
    if not groups:
        return False
    A, M, D = x_shape
    if A * M < MIN_ROWS or D % 128 != 0:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    geom = grouped_geometry(A, groups, M)
    if geom is None:
        return False
    BA, _ = geom
    itemsize = jnp.dtype(dtype).itemsize
    vmem = sum(
        2 * cap * (BA + 2 * width) * D * itemsize
        for (_, cap, _, width, _) in groups
    )
    return vmem <= _VMEM_BUDGET


def _impl(x, rev, nbr_indices, fixup_src, fixup_dst, *, band, groups=(),
          fixup_split=(0, 0), interpret=None):
    from . import pallas_enabled

    A, M, D = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and pallas_enabled():
        if groups and use_kernel_grouped(x.shape, x.dtype, groups):
            return _kernel_impl_grouped(
                x, nbr_indices, fixup_src, fixup_dst, groups,
                interpret=False, fixup_split=fixup_split,
            )
        if not groups and use_kernel(x.shape, x.dtype, band):
            return _kernel_impl(
                x, nbr_indices, fixup_src, fixup_dst, band, interpret=False
            )
    flat = x.reshape(A * M, D)
    return jnp.take(flat, rev, axis=0).reshape(A, M, D)


def _abstract_eval(x, rev, nbr_indices, fixup_src, fixup_dst, *, band,
                   groups=(), fixup_split=(0, 0)):
    return x.update(shape=x.shape, dtype=x.dtype)


def _jvp(primals, tangents, *, band, groups=(), fixup_split=(0, 0)):
    x, rev, idx, fsrc, fdst = primals
    dx = tangents[0]
    out = colored_permute(x, rev, idx, fsrc, fdst, band=band, groups=groups,
                          fixup_split=fixup_split)
    if type(dx) is ad.Zero:
        return out, ad.Zero.from_primal_value(out)
    dout = colored_permute(dx, rev, idx, fsrc, fdst, band=band,
                           groups=groups, fixup_split=fixup_split)
    return out, dout


def _transpose(ct, x, rev, idx, fsrc, fdst, *, band, groups=(),
               fixup_split=(0, 0)):
    if type(ct) is ad.Zero:
        return ad.Zero.from_primal_value(x), None, None, None, None
    # involution: the exact adjoint is the same permutation (the grouped
    # non-servable set is symmetric and real masked rows carry exactly
    # zero cotangents)
    return (
        colored_permute(ct, rev, idx, fsrc, fdst, band=band, groups=groups,
                        fixup_split=fixup_split),
        None,
        None,
        None,
        None,
    )


def _batching(args, dims, *, band, groups=(), fixup_split=(0, 0)):
    x, rev, idx, fsrc, fdst = args
    if any(d is not None for d in dims[1:]):
        raise NotImplementedError("batched permutation indices")
    xdim = dims[0]
    # fold the batch axis into D (trailing); D changes, so the kernel
    # gate re-evaluates -- correctness is unaffected either way
    x_moved = jnp.moveaxis(x, xdim, -1)  # (A, M, D, B)
    A, M = idx.shape
    merged = x_moved.reshape(A, M, -1)
    out = colored_permute(merged, rev, idx, fsrc, fdst, band=band,
                          groups=groups, fixup_split=fixup_split)
    out = out.reshape(x_moved.shape)
    return jnp.moveaxis(out, -1, xdim), xdim


colored_permute_p.def_impl(functools.partial(_impl, interpret=None))
colored_permute_p.def_abstract_eval(_abstract_eval)
ad.primitive_jvps[colored_permute_p] = _jvp
ad.primitive_transposes[colored_permute_p] = _transpose
batching.primitive_batchers[colored_permute_p] = _batching
mlir.register_lowering(
    colored_permute_p,
    mlir.lower_fun(
        functools.partial(_impl, interpret=None), multiple_results=False
    ),
)


# -- fused permute + accumulate ----------------------------------------------
#
# ``colored_permute_acc(x, acc, ...) == colored_permute(x, ...) + acc`` with
# the add fused into the permute kernel's store (one read of ``acc`` instead
# of the separate XLA add's read-read-write round trip). Linear in both
# array operands, so the transpose stays closed under the colored family:
# d_x = permute(ct), d_acc = ct.

colored_permute_acc_p = jex_core.Primitive("colored_permute_acc")


def colored_permute_acc(
    x, acc, rev, nbr_indices, fixup_src, fixup_dst, *, band: int,
    groups=(), fixup_split=(0, 0),
):
    return colored_permute_acc_p.bind(
        x, acc, rev, nbr_indices, fixup_src, fixup_dst,
        band=int(band),
        groups=tuple(tuple(int(v) for v in g) for g in groups),
        fixup_split=(int(fixup_split[0]), int(fixup_split[1])),
    )


def _impl_acc(x, acc, rev, nbr_indices, fixup_src, fixup_dst, *, band,
              groups=(), fixup_split=(0, 0), interpret=None):
    from . import pallas_enabled

    A, M, D = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and pallas_enabled():
        if groups and use_kernel_grouped(x.shape, x.dtype, groups):
            return _kernel_impl_grouped(
                x, nbr_indices, fixup_src, fixup_dst, groups,
                interpret=False, fixup_split=fixup_split, acc=acc,
            )
        if not groups and use_kernel(x.shape, x.dtype, band):
            return _kernel_impl(
                x, nbr_indices, fixup_src, fixup_dst, band,
                interpret=False, acc=acc,
            )
    flat = x.reshape(A * M, D)
    return jnp.take(flat, rev, axis=0).reshape(A, M, D) + acc


def _abstract_eval_acc(x, acc, *rest, **params):
    return x.update(shape=x.shape, dtype=x.dtype)


def _jvp_acc(primals, tangents, *, band, groups=(), fixup_split=(0, 0)):
    x, acc, rev, idx, fsrc, fdst = primals
    dx, dacc = tangents[0], tangents[1]
    out = colored_permute_acc(
        x, acc, rev, idx, fsrc, fdst, band=band, groups=groups,
        fixup_split=fixup_split,
    )
    dx_zero = type(dx) is ad.Zero
    dacc_zero = type(dacc) is ad.Zero
    if dx_zero and dacc_zero:
        return out, ad.Zero.from_primal_value(out)
    if dx_zero:
        return out, dacc
    if dacc_zero:
        dout = colored_permute(
            dx, rev, idx, fsrc, fdst, band=band, groups=groups,
            fixup_split=fixup_split,
        )
        return out, dout
    dout = colored_permute_acc(
        dx, dacc, rev, idx, fsrc, fdst, band=band, groups=groups,
        fixup_split=fixup_split,
    )
    return out, dout


def _transpose_acc(ct, x, acc, rev, idx, fsrc, fdst, *, band, groups=(),
                   fixup_split=(0, 0)):
    if type(ct) is ad.Zero:
        zero = ad.Zero.from_primal_value(x)
        return (zero, zero, None, None, None, None)
    d_x = colored_permute(
        ct, rev, idx, fsrc, fdst, band=band, groups=groups,
        fixup_split=fixup_split,
    )
    return (d_x, ct, None, None, None, None)


colored_permute_acc_p.def_impl(functools.partial(_impl_acc, interpret=None))
colored_permute_acc_p.def_abstract_eval(_abstract_eval_acc)
ad.primitive_jvps[colored_permute_acc_p] = _jvp_acc
ad.primitive_transposes[colored_permute_acc_p] = _transpose_acc
mlir.register_lowering(
    colored_permute_acc_p,
    mlir.lower_fun(
        functools.partial(_impl_acc, interpret=None), multiple_results=False
    ),
)


# -- fan-out pair -------------------------------------------------------------
#
# ``reverse_pair(x, ...) -> (x, permute(x))``: the model consumes BOTH the
# edge array and its reversal (combination stage / residual message mix).
# Expressed as one primitive, the cotangent fan-in ``d_x = ct_x +
# permute(ct_p)`` lowers to the FUSED accumulate kernel above instead of an
# XLA add_any -- the r4 profile's 1.9 ms of cotangent adds.

reverse_pair_p = jex_core.Primitive("colored_reverse_pair")
reverse_pair_p.multiple_results = True


def reverse_pair(x, batch_data):
    """(x, reversed(x)) with the backward add fused into the permute.

    Drop-in replacement for ``(x, reverse_edges(x, batch_data))`` when
    both values are consumed downstream. Falls back to the involution/
    gather path exactly like :func:`reverse_edges` would.
    """
    band = batch_data.get("color_band", 0)
    groups = batch_data.get("color_groups", ())
    if (band or groups) and x.ndim == 3:
        return tuple(
            reverse_pair_p.bind(
                x,
                batch_data["nbr_reverse"].reshape(-1),
                batch_data["nbr_indices"],
                batch_data["nbr_fixup_src"],
                batch_data["nbr_fixup_dst"],
                band=int(band),
                groups=tuple(
                    tuple(int(v) for v in g) for g in groups
                ),
                fixup_split=tuple(
                    int(v) for v in batch_data.get("color_fixup_split", (0, 0))
                ),
            )
        )
    from ...ops.involution import permute_rows

    A, M = x.shape[:2]
    flat = x.reshape((A * M,) + x.shape[2:])
    rev = permute_rows(flat, batch_data["nbr_reverse"].reshape(-1)).reshape(
        x.shape
    )
    return x, rev


def _pair_impl(x, rev, idx, fsrc, fdst, *, band, groups=(),
               fixup_split=(0, 0)):
    return (
        x,
        _impl(x, rev, idx, fsrc, fdst, band=band, groups=groups,
              fixup_split=fixup_split),
    )


def _pair_abstract(x, *rest, **params):
    out = x.update(shape=x.shape, dtype=x.dtype)
    return (out, out)


def _pair_jvp(primals, tangents, *, band, groups=(), fixup_split=(0, 0)):
    x, rev, idx, fsrc, fdst = primals
    dx = tangents[0]
    outs = tuple(
        reverse_pair_p.bind(
            x, rev, idx, fsrc, fdst, band=band, groups=groups,
            fixup_split=fixup_split,
        )
    )
    if type(dx) is ad.Zero:
        z = ad.Zero.from_primal_value(outs[0])
        return outs, (z, z)
    douts = tuple(
        reverse_pair_p.bind(
            dx, rev, idx, fsrc, fdst, band=band, groups=groups,
            fixup_split=fixup_split,
        )
    )
    return outs, douts


def _pair_transpose(cts, x, rev, idx, fsrc, fdst, *, band, groups=(),
                    fixup_split=(0, 0)):
    ct_x, ct_p = cts
    x_zero = type(ct_x) is ad.Zero
    p_zero = type(ct_p) is ad.Zero
    if x_zero and p_zero:
        return (ad.Zero.from_primal_value(x), None, None, None, None)
    if p_zero:
        return (ct_x, None, None, None, None)
    if x_zero:
        d_x = colored_permute(
            ct_p, rev, idx, fsrc, fdst, band=band, groups=groups,
            fixup_split=fixup_split,
        )
        return (d_x, None, None, None, None)
    d_x = colored_permute_acc(
        ct_p, ct_x, rev, idx, fsrc, fdst, band=band, groups=groups,
        fixup_split=fixup_split,
    )
    return (d_x, None, None, None, None)


reverse_pair_p.def_impl(_pair_impl)
reverse_pair_p.def_abstract_eval(_pair_abstract)
ad.primitive_jvps[reverse_pair_p] = _pair_jvp
ad.primitive_transposes[reverse_pair_p] = _pair_transpose
mlir.register_lowering(
    reverse_pair_p,
    mlir.lower_fun(_pair_impl, multiple_results=True),
)
