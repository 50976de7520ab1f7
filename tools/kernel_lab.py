"""Kernel experiment: run-granular DMA for the ADC scan.

The production kernel (ops/pallas/adc_scan.py) moves one 256-code tile per
DMA and pays the per-chunk scalar bookkeeping (SMEM reads, div/rem, DMA
descriptor + semaphore wait, branch) once per tile — measured 231 ns per
4 KB tile at the primary operating point, ~4x the pure vector-compute cost
of the gather+sum. Posting lists are stored as CONTIGUOUS tile runs, so a
probe's tiles can move as one multi-tile DMA. This lab implements the scan
with RUN=4 tiles per DMA / schedule slot (one SMEM entry, one descriptor,
one wait per 16 KB) and compares output + marginal latency against the
production kernel on the cached primary-point index.

Verdict (v5e, 2M codes, nprobe=32, max_codes=10k, B=1024): see __main__
output; integrated into adc_scan.py if it wins.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ivfhnsw_tpu.ops.pallas import adc_scan as pk  # noqa: E402

CHUNK = 256
LUT_ROWS = 24
RUN = 4            # tiles per DMA / schedule slot
RCHUNK = RUN * CHUNK
CPSR = 2           # runs per grid step -> CPSR*RUN = 8 out rows (8,256) block
DEPTH_R = 8        # run-slot DMA pipeline depth (must exceed 2*CPSR)
RTL_PACK = 2048    # packed schedule: tile * RTL_PACK + len (len <= RCHUNK);
                   # bounds tiles per shard to 2^31/2048 = 1.05M (268M codes)


@functools.partial(jax.jit, static_argnames=("nrun",))
def run_metadata(probes, qc_dists, centroid_norms, tile_offsets, list_sizes,
                 max_codes, nrun: int):
    """Per-query RUN-granular schedule: (run_tile [B,nrun] i32 — first tile,
    run_len [B,nrun] i32 — codes covered (<= RCHUNK), run_bias [B,nrun])."""
    B, P = probes.shape
    nc = list_sizes.shape[0]
    pack = jnp.stack([list_sizes.astype(jnp.float32),
                      tile_offsets[:nc].astype(jnp.float32),
                      centroid_norms], axis=1)
    pack = jnp.pad(pack, ((0, 0), (0, 5)))
    g = jnp.take(pack, probes, axis=0)
    sizes = g[..., 0].astype(jnp.int32)
    tile_off = g[..., 1]
    term1 = qc_dists - g[..., 2]

    cum_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(sizes, axis=1)[:, :-1]],
        axis=1)
    included = jnp.logical_or(max_codes <= 0, cum_before < max_codes)
    rcnt = jnp.where(included, (sizes + RCHUNK - 1) // RCHUNK, 0)
    bounds = jnp.cumsum(rcnt, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, :-1]], axis=1)
    j = jnp.arange(nrun, dtype=jnp.int32)
    oh = jnp.logical_and(starts[:, None, :] <= j[None, :, None],
                         bounds[:, None, :] > j[None, :, None])
    vals = jnp.stack([starts.astype(jnp.float32), sizes.astype(jnp.float32),
                      term1, tile_off], axis=-1)
    sel = jnp.einsum("bjp,bpv->bjv", oh.astype(jnp.float32), vals,
                     precision=jax.lax.Precision.HIGHEST)
    valid = j[None, :] < bounds[:, -1:]
    within = j[None, :] - jnp.round(sel[..., 0]).astype(jnp.int32)
    tile = jnp.round(sel[..., 3]).astype(jnp.int32) + within * RUN
    ln = jnp.clip(jnp.round(sel[..., 1]).astype(jnp.int32) - within * RCHUNK,
                  0, RCHUNK)
    return (jnp.where(valid, tile, 0),
            jnp.where(valid, ln, 0),
            jnp.where(valid, sel[..., 2], 0.0))


def _adc_kernel_v2(rtl_smem, luts_ref, tiles_hbm, out_ref,
                   scratch, sems):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nrun = nsteps * CPSR

    def dma(slot, t):
        return pltpu.make_async_copy(tiles_hbm.at[pl.ds(t, RUN)],
                                     scratch.at[slot], sems.at[slot])

    def start_for(gg):
        bb = gg // nrun
        cc = jax.lax.rem(gg, nrun)
        tl = rtl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, DEPTH_R), tl // RTL_PACK).start()

    g0 = b * nrun + j * CPSR

    @pl.when(g0 == 0)
    def _():
        for w in range(DEPTH_R - CPSR):
            @pl.when(w < nb * nrun)
            def _():
                start_for(jnp.int32(w))

    for i in range(CPSR):
        @pl.when(g0 + DEPTH_R - CPSR + i < nb * nrun)
        def _():
            start_for(g0 + DEPTH_R - CPSR + i)

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPSR):
        c = j * CPSR + i
        g = g0 + i
        tl = rtl_smem[b, c]
        ln = jax.lax.rem(tl, RTL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH_R), tl // RTL_PACK).wait()
            for rr in range(RUN):
                @pl.when(ln > rr * CHUNK)
                def _():
                    idx = scratch[jax.lax.rem(g, DEPTH_R), rr].astype(
                        jnp.int32)
                    gg2 = jnp.concatenate(
                        [half(idx[:, :128]), half(idx[:, 128:])], axis=1)
                    out_ref[0, i * RUN + rr, :] = jnp.sum(gg2, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_runs(luts_ext, run_tile, run_len, run_bias, tiles_padded,
                  interpret: bool = False):
    """Run-granular scan. Returns dists [B, nrun*RCHUNK] f32 (masked +inf).

    tiles_padded must have RUN-1 trailing pad tiles (over-fetch room)."""
    B, nrun = run_tile.shape
    if nrun % CPSR:
        pad = CPSR - nrun % CPSR
        run_tile = jnp.pad(run_tile, ((0, 0), (0, pad)))
        run_len = jnp.pad(run_len, ((0, 0), (0, pad)))
        run_bias = jnp.pad(run_bias, ((0, 0), (0, pad)))
        nrun += pad
    rtl = run_tile * RTL_PACK + run_len
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nrun // CPSR),
        in_specs=[
            pl.BlockSpec((1, LUT_ROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CPSR * RUN, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH_R, RUN, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH_R,)),
        ],
    )
    out = pl.pallas_call(
        _adc_kernel_v2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nrun * RUN, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(rtl, luts_ext, tiles_padded)
    # Expand run metadata to chunk granularity for mask + bias.
    rr = jnp.arange(RUN, dtype=jnp.int32)
    chunk_len = jnp.clip(run_len[:, :, None] - rr[None, None, :] * CHUNK,
                         0, CHUNK).reshape(B, nrun * RUN)
    chunk_bias = jnp.broadcast_to(run_bias[:, :, None],
                                  (B, nrun, RUN)).reshape(B, nrun * RUN)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out + chunk_bias[:, :, None], jnp.inf)
    return out.reshape(B, nrun * RUN * CHUNK)


CPS = pk.CPS
DEPTH = pk.DEPTH
TL_PACK = pk.TL_PACK


def _adc_kernel_nodma(tl_smem, luts_ref, tiles_hbm, out_ref, scratch, sems):
    """v1 minus DMA: compute from slot 0 garbage — isolates vector cost."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPS):
        c = j * CPS + i
        tl = tl_smem[b, c]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[0].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)
            out_ref[0, i, :] = jnp.sum(gg, axis=0)


def _adc_kernel_dmaonly(tl_smem, luts_ref, tiles_hbm, out_ref, scratch,
                        sems):
    """v1 minus gathers: full DMA pipeline, trivial store — isolates
    DMA + scalar bookkeeping cost."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nch = nsteps * CPS

    def dma(slot, t):
        return pltpu.make_async_copy(tiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        bb = gg // nch
        cc = jax.lax.rem(gg, nch)
        tl = tl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, DEPTH), tl // TL_PACK).start()

    g0 = b * nch + j * CPS

    @pl.when(g0 == 0)
    def _():
        for w in range(DEPTH - CPS):
            @pl.when(w < nb * nch)
            def _():
                start_for(jnp.int32(w))

    for i in range(CPS):
        @pl.when(g0 + DEPTH - CPS + i < nb * nch)
        def _():
            start_for(g0 + DEPTH - CPS + i)

    for i in range(CPS):
        g = g0 + i
        tl = tl_smem[b, j * CPS + i]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH), tl // TL_PACK).wait()
            idx = scratch[jax.lax.rem(g, DEPTH)].astype(jnp.int32)
            out_ref[0, i, :] = jnp.sum(idx.astype(jnp.float32), axis=0)


def _adc_kernel_v1b(tl_smem, luts_ref, tiles_hbm, out_ref, scratch, sems):
    """v1 with BATCHED waits: all CPS waits issued before any compute, so
    the vector pipeline streams through 8 chunks without scalar stalls."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nch = nsteps * CPS

    def dma(slot, t):
        return pltpu.make_async_copy(tiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        bb = gg // nch
        cc = jax.lax.rem(gg, nch)
        tl = tl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, DEPTH), tl // TL_PACK).start()

    g0 = b * nch + j * CPS

    @pl.when(g0 == 0)
    def _():
        for w in range(DEPTH - CPS):
            @pl.when(w < nb * nch)
            def _():
                start_for(jnp.int32(w))

    for i in range(CPS):
        @pl.when(g0 + DEPTH - CPS + i < nb * nch)
        def _():
            start_for(g0 + DEPTH - CPS + i)

    for i in range(CPS):
        g = g0 + i
        tl = tl_smem[b, j * CPS + i]

        @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH), tl // TL_PACK).wait()

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPS):
        g = g0 + i
        tl = tl_smem[b, j * CPS + i]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[jax.lax.rem(g, DEPTH)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)
            out_ref[0, i, :] = jnp.sum(gg, axis=0)


# --- quad-tile layout: 4 chunks per [72, 256] tile, rows interleaved 4m+c
QROWS = 72         # 64 code rows (4m+c) + 4 norm rows + 4 pad
CPSQ = 2           # quad tiles per grid step -> 8 chunk rows out
DEPTH_Q = 8


def build_quad_layout(store):
    """1024-aligned quad-tile layout from a host-resident store.

    Returns (qtiles [NQT, 72, 256] u8 — rows 4m+c = subq m of chunk c,
    rows 64+c = norm codes of chunk c; ids_q [NQT*1024] i32;
    qtile_offsets [nc+1] i32; sizes [nc] i32)."""
    off = np.asarray(store.list_offsets).astype(np.int64)
    sizes = (off[1:] - off[:-1]).astype(np.int64)
    qcnt = (sizes + RCHUNK - 1) // RCHUNK
    qoff = np.zeros(store.nc + 1, np.int64)
    np.cumsum(qcnt, out=qoff[1:])
    nqt = max(int(qoff[-1]), 1)
    n_al = nqt * RCHUNK

    codes = np.asarray(store.codes)
    ncodes = np.asarray(store.norm_codes)
    ids = np.asarray(store.ids)
    m = codes.shape[1]

    pos = np.arange(store.ntotal, dtype=np.int64)
    list_of = np.repeat(np.arange(store.nc), sizes)
    within = pos - off[list_of]
    dest = qoff[list_of] * RCHUNK + within

    codes_al = np.zeros((n_al, 16), np.uint8)
    norm_al = np.zeros(n_al, np.uint8)
    ids_al = np.full(n_al, -1, np.int32)
    codes_al[dest, :m] = codes
    norm_al[dest] = ncodes
    ids_al[dest] = ids

    # [NQT, 4 chunks, 256 lanes, 16 m] -> rows 4m+c
    c4 = codes_al.reshape(nqt, 4, CHUNK, 16)
    qt = np.zeros((nqt, QROWS, CHUNK), np.uint8)
    # row 4m+c: transpose to [NQT, 16 m, 4 c, 256]
    qt[:, :64, :] = c4.transpose(0, 3, 1, 2).reshape(nqt, 64, CHUNK)
    qt[:, 64:68, :] = norm_al.reshape(nqt, 4, CHUNK)
    return (qt, ids_al, qoff.astype(np.int32), sizes.astype(np.int32))


def build_luts_quad(luts_ext):
    """[B, 24, 256] standard ext LUTs -> [B, 72, 256] quad LUTs (each table
    replicated over its chunk's 4 sublane slots)."""
    B = luts_ext.shape[0]
    pq = jnp.repeat(luts_ext[:, :16, :], 4, axis=1)        # rows 4m+c
    nrm = jnp.repeat(luts_ext[:, 16:17, :], 4, axis=1)     # rows 64..67
    pad = jnp.zeros((B, 4, 256), jnp.float32)
    return jnp.concatenate([pq, nrm, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("nquad",))
def quad_metadata(probes, qc_dists, centroid_norms, qtile_offsets,
                  list_sizes, max_codes, nquad: int):
    """RCHUNK-granular schedule against QUAD tile indices."""
    B, P = probes.shape
    nc = list_sizes.shape[0]
    pack = jnp.stack([list_sizes.astype(jnp.float32),
                      qtile_offsets[:nc].astype(jnp.float32),
                      centroid_norms], axis=1)
    pack = jnp.pad(pack, ((0, 0), (0, 5)))
    g = jnp.take(pack, probes, axis=0)
    sizes = g[..., 0].astype(jnp.int32)
    qtile_off = g[..., 1]
    term1 = qc_dists - g[..., 2]

    cum_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(sizes, axis=1)[:, :-1]],
        axis=1)
    included = jnp.logical_or(max_codes <= 0, cum_before < max_codes)
    qcnt = jnp.where(included, (sizes + RCHUNK - 1) // RCHUNK, 0)
    bounds = jnp.cumsum(qcnt, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, :-1]], axis=1)
    j = jnp.arange(nquad, dtype=jnp.int32)
    oh = jnp.logical_and(starts[:, None, :] <= j[None, :, None],
                         bounds[:, None, :] > j[None, :, None])
    vals = jnp.stack([starts.astype(jnp.float32), sizes.astype(jnp.float32),
                      term1, qtile_off], axis=-1)
    sel = jnp.einsum("bjp,bpv->bjv", oh.astype(jnp.float32), vals,
                     precision=jax.lax.Precision.HIGHEST)
    valid = j[None, :] < bounds[:, -1:]
    within = j[None, :] - jnp.round(sel[..., 0]).astype(jnp.int32)
    qtile = jnp.round(sel[..., 3]).astype(jnp.int32) + within
    ln = jnp.clip(jnp.round(sel[..., 1]).astype(jnp.int32) - within * RCHUNK,
                  0, RCHUNK)
    return (jnp.where(valid, qtile, 0),
            jnp.where(valid, ln, 0),
            jnp.where(valid, sel[..., 2], 0.0))


def _adc_kernel_quad_nb(qtl_smem, luts_ref, qtiles_hbm, out_ref, scratch,
                        sems, *, cpsq=CPSQ, depth=DEPTH_Q):
    """BRANCHLESS quad scan: every schedule slot issues its DMA, waits, and
    computes unconditionally — padding slots (tl=0) fetch tile 0 and their
    garbage rows are masked outside the kernel exactly as before. Rationale:
    at profiled slot budgets padding is rare and the scan runs at ~3% of
    HBM speed-of-light, so trading a few wasted tile fetches for the
    removal of THREE scalar branches per unit (start/wait/compute guards)
    attacks the per-unit scalar floor directly.

    Out-of-range lookahead starts saturate to the LAST chunk (same slot,
    same bytes — benign duplicate DMA); the final grid step drains the
    DEPTH-CPSQ duplicate signals so semaphores are zero at kernel exit."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nq = nsteps * cpsq
    total = nb * nq

    def dma(slot, t):
        return pltpu.make_async_copy(qtiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        gg = jnp.minimum(gg, total - 1)
        bb = gg // nq
        cc = jax.lax.rem(gg, nq)
        tl = qtl_smem[bb, cc]
        dma(jax.lax.rem(gg, depth), tl // RTL_PACK).start()

    g0 = b * nq + j * cpsq

    @pl.when(g0 == 0)
    def _():
        for w in range(depth - cpsq):
            start_for(jnp.int32(w))

    for i in range(cpsq):
        start_for(g0 + depth - cpsq + i)

    for i in range(cpsq):
        g = g0 + i
        dma(jax.lax.rem(g, depth), jnp.int32(0)).wait()

    lut = luts_ref[0]                                      # [72, 256]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(cpsq):
        g = g0 + i
        idx = scratch[jax.lax.rem(g, depth)].astype(jnp.int32)
        gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                             axis=1)                       # [72, 256]
        out_ref[0, i * 4:(i + 1) * 4, :] = jnp.sum(
            gg.reshape(18, 4, 256), axis=0)

    # Drain the saturated duplicate starts (one per lookahead slot past the
    # grid end) so every semaphore is zero when the kernel exits. Each
    # dma.wait() consumes exactly one copy's completion (the DMA semaphore
    # counts bytes, so a raw semaphore_wait with a completion count would
    # not match).
    @pl.when(g0 == total - cpsq)
    def _():
        for _w in range(depth - cpsq):
            dma(jax.lax.rem(jnp.int32(total - 1), depth),
                jnp.int32(0)).wait()


def _adc_kernel_quad(qtl_smem, luts_ref, qtiles_hbm, out_ref, scratch,
                     sems, *, cpsq=CPSQ, depth=DEPTH_Q, arith=False):
    CPSQ_ = cpsq
    DEPTH_Q_ = depth
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nq = nsteps * CPSQ_

    def dma(slot, t):
        return pltpu.make_async_copy(qtiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        bb = gg // nq
        cc = jax.lax.rem(gg, nq)
        tl = qtl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, DEPTH_Q_), tl // RTL_PACK).start()

    g0 = b * nq + j * CPSQ_

    @pl.when(g0 == 0)
    def _():
        for w in range(DEPTH_Q_ - CPSQ_):
            @pl.when(w < nb * nq)
            def _():
                start_for(jnp.int32(w))

    for i in range(CPSQ_):
        @pl.when(g0 + DEPTH_Q_ - CPSQ_ + i < nb * nq)
        def _():
            start_for(g0 + DEPTH_Q_ - CPSQ_ + i)

    for i in range(CPSQ_):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ_ + i]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH_Q_), tl // RTL_PACK).wait()

    lut = luts_ref[0]                                      # [72, 256]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        if arith:
            hi = (idx_h >> 7).astype(jnp.float32)
            idxm = idx_h & 127
            ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                     mode="promise_in_bounds")
            gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                     mode="promise_in_bounds")
            return ga + hi * (gb - ga)
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPSQ_):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ_ + i]
        ln = jax.lax.rem(tl, RTL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[jax.lax.rem(g, DEPTH_Q_)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)                  # [72, 256]
            # Per-chunk sums: rows 4m+c -> sum over the 18 sublane groups.
            out_ref[0, i * 4:(i + 1) * 4, :] = jnp.sum(
                gg.reshape(18, 4, 256), axis=0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "cpsq", "depth", "arith",
                                    "branchless"))
def adc_scan_quad(luts_quad, qtile, qlen, qbias, qtiles,
                  interpret: bool = False, cpsq: int = CPSQ,
                  depth: int = DEPTH_Q, arith: bool = False,
                  branchless: bool = False):
    """Quad-tile scan. Returns dists [B, nquad*RCHUNK] f32 (masked +inf)."""
    import functools as ft
    B, nquad = qtile.shape
    if nquad % cpsq:
        pad = cpsq - nquad % cpsq
        qtile = jnp.pad(qtile, ((0, 0), (0, pad)))
        qlen = jnp.pad(qlen, ((0, 0), (0, pad)))
        qbias = jnp.pad(qbias, ((0, 0), (0, pad)))
        nquad += pad
    qtl = qtile * RTL_PACK + qlen
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nquad // cpsq),
        in_specs=[
            pl.BlockSpec((1, QROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cpsq * 4, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, QROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    kern = (ft.partial(_adc_kernel_quad_nb, cpsq=cpsq, depth=depth)
            if branchless
            else ft.partial(_adc_kernel_quad, cpsq=cpsq, depth=depth,
                            arith=arith))
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nquad * 4, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qtl, luts_quad, qtiles)
    rr = jnp.arange(4, dtype=jnp.int32)
    chunk_len = jnp.clip(qlen[:, :, None] - rr[None, None, :] * CHUNK,
                         0, CHUNK).reshape(B, nquad * 4)
    chunk_bias = jnp.broadcast_to(qbias[:, :, None],
                                  (B, nquad, 4)).reshape(B, nquad * 4)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out + chunk_bias[:, :, None], jnp.inf)
    return out.reshape(B, nquad * 4 * CHUNK)


def _variant_call(kernel, luts_ext, chunk_tile, chunk_len, chunk_bias,
                  tiles):
    B, nch = chunk_tile.shape
    if nch % CPS:
        pad = CPS - nch % CPS
        chunk_tile = jnp.pad(chunk_tile, ((0, 0), (0, pad)))
        chunk_len = jnp.pad(chunk_len, ((0, 0), (0, pad)))
        nch += pad
    tl = chunk_tile * TL_PACK + chunk_len
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nch // CPS),
        in_specs=[
            pl.BlockSpec((1, LUT_ROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CPS, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nch, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tl, luts_ext, tiles)


def _adc_kernel_cps(tl_smem, luts_ref, tiles_hbm, out_ref, scratch, sems,
                    *, cps, depth, batched_wait=False):
    """Production chunk kernel parametrized over (chunks per grid step,
    DMA pipeline depth, wait placement) — the chunk-layout analog of the
    quad cpsq/depth sweep."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nch = nsteps * cps

    def dma(slot, t):
        return pltpu.make_async_copy(tiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        bb = gg // nch
        cc = jax.lax.rem(gg, nch)
        tl = tl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, depth), tl // TL_PACK).start()

    g0 = b * nch + j * cps

    @pl.when(g0 == 0)
    def _():
        for w in range(depth - cps):
            @pl.when(w < nb * nch)
            def _():
                start_for(jnp.int32(w))

    for i in range(cps):
        @pl.when(g0 + depth - cps + i < nb * nch)
        def _():
            start_for(g0 + depth - cps + i)

    if batched_wait:
        for i in range(cps):
            g = g0 + i
            tl = tl_smem[b, j * cps + i]

            @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
            def _():
                dma(jax.lax.rem(g, depth), tl // TL_PACK).wait()

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(cps):
        g = g0 + i
        tl = tl_smem[b, j * cps + i]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            if not batched_wait:
                dma(jax.lax.rem(g, depth), tl // TL_PACK).wait()
            idx = scratch[jax.lax.rem(g, depth)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)
            out_ref[0, i, :] = jnp.sum(gg, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("cps", "depth", "batched_wait"))
def adc_scan_tiles_cps(luts_ext, chunk_tile, chunk_len, chunk_bias, tiles,
                       cps: int = CPS, depth: int = DEPTH,
                       batched_wait: bool = False):
    """Parametrized chunk scan (wide output, masked like production)."""
    B, nch = chunk_tile.shape
    if nch % cps:
        pad = cps - nch % cps
        chunk_tile = jnp.pad(chunk_tile, ((0, 0), (0, pad)))
        chunk_len = jnp.pad(chunk_len, ((0, 0), (0, pad)))
        chunk_bias = jnp.pad(chunk_bias, ((0, 0), (0, pad)))
        nch += pad
    tl = chunk_tile * TL_PACK + chunk_len
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nch // cps),
        in_specs=[
            pl.BlockSpec((1, LUT_ROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cps, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_adc_kernel_cps, cps=cps, depth=depth,
                          batched_wait=batched_wait),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nch, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tl, luts_ext, tiles)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out + chunk_bias[:, :, None], jnp.inf)
    return out.reshape(B, nch * CHUNK)


def main():
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    from perf_probe import marginal_ms

    NQ, D, NC = 8192, 128, 4096
    NPROBE, MAX_CODES, K = 32, 10_000, 10
    B = 1024

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
    idx.load_quantizers(os.path.join(CACHE, "bench.pq"),
                        os.path.join(CACHE, "bench.norm_pq"))
    idx.read(os.path.join(CACHE, "bench.index"))
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MAX_CODES)
    queries = np.load(os.path.join(CACHE, "queries.npy"))[:B]
    q = jnp.asarray(queries)

    # Chunk-layout store EXPLICITLY: the index's auto layout resolves to
    # quad at this geometry (488 codes/list >= 416), but the chunk-path
    # experiments below need per-chunk tiles.
    centroids, centroid_norms = idx.centroids, idx.centroid_norms
    codebooks, norm_centroids = idx.pq.codebooks, idx.norm_pq.centroids
    mc = jnp.int32(MAX_CODES)
    store = idx._ensure_store()
    _tl = store.tiled()
    tiles, ids_aligned = _tl.tiles, _tl.ids_aligned
    tile_offsets, list_sizes = _tl.tile_offsets, _tl.list_sizes
    mx = store.max_list_size()
    nch = (MAX_CODES + mx) // CHUNK + NPROBE + 1  # chunk-granular worst case
    nrun = (MAX_CODES + mx) // RCHUNK + NPROBE + 1
    tiles_padded = jnp.concatenate(
        [tiles, jnp.zeros((RUN - 1,) + tiles.shape[1:], jnp.uint8)])
    print(f"nch={nch} nrun={nrun}", file=sys.stderr)

    @jax.jit
    def pre_v1(q):
        qc, probes = streaming_topk_l2(q, centroids, NPROBE, block=4096,
                                       point_sqnorms=centroid_norms,
                                       precision=jax.lax.Precision.HIGHEST)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids,
                                 precision=jax.lax.Precision.HIGHEST)
        ct, cl, cb = pk.chunk_metadata(probes, qc, centroid_norms,
                                       tile_offsets, list_sizes, mc, nch)
        rt, rl, rb = run_metadata(probes, qc, centroid_norms,
                                  tile_offsets, list_sizes, mc, nrun)
        return luts, ct, cl, cb, rt, rl, rb

    luts, ct, cl, cb, rt, rl, rb = jax.block_until_ready(pre_v1(q))

    @jax.jit
    def kern_v1(luts, ct, cl, cb):
        return pk.adc_scan_tiles(luts, ct, cl, cb, tiles)

    @jax.jit
    def kern_v2(luts, rt, rl, rb):
        return adc_scan_runs(luts, rt, rl, rb, tiles_padded)

    d1 = jax.block_until_ready(kern_v1(luts, ct, cl, cb))
    d2 = jax.block_until_ready(kern_v2(luts, rt, rl, rb))

    # Correctness: compare per-query sorted finite distance multisets.
    a1 = np.sort(np.asarray(d1), axis=1)[:, :MAX_CODES]
    a2 = np.sort(np.asarray(d2), axis=1)[:, :MAX_CODES]
    ok = np.allclose(a1, a2, atol=1e-3, rtol=1e-5, equal_nan=True)
    print(f"outputs match: {ok}")
    if not ok:
        bad = np.where(~np.isclose(a1, a2, atol=1e-3, rtol=1e-5))[0]
        print(f"  first mismatch query {bad[0] if len(bad) else '?'}")

    ms1 = marginal_ms(kern_v1, luts, ct, cl, cb)
    ms2 = marginal_ms(kern_v2, luts, rt, rl, rb)
    real = float(np.asarray((cl > 0).sum(axis=1)).mean())
    print(f"v1 per-tile DMA: {ms1:.2f} ms ({ms1*1e3/B:.2f} us/q, "
          f"{ms1*1e6/B/real:.0f} ns/chunk)")
    print(f"v2 RUN={RUN} DMA: {ms2:.2f} ms ({ms2*1e3/B:.2f} us/q, "
          f"{ms2*1e6/B/real:.0f} ns/chunk)")

    @jax.jit
    def kern_nodma(luts, ct, cl, cb):
        return _variant_call(_adc_kernel_nodma, luts, ct, cl, cb, tiles)

    @jax.jit
    def kern_dmaonly(luts, ct, cl, cb):
        return _variant_call(_adc_kernel_dmaonly, luts, ct, cl, cb, tiles)

    jax.block_until_ready(kern_nodma(luts, ct, cl, cb))
    jax.block_until_ready(kern_dmaonly(luts, ct, cl, cb))
    ms3 = marginal_ms(kern_nodma, luts, ct, cl, cb)
    ms4 = marginal_ms(kern_dmaonly, luts, ct, cl, cb)
    print(f"v1-compute-only: {ms3:.2f} ms ({ms3*1e6/B/real:.0f} ns/chunk)")
    print(f"v1-dma-only:     {ms4:.2f} ms ({ms4*1e6/B/real:.0f} ns/chunk)")

    # v1b: batched waits
    @jax.jit
    def kern_v1b(luts, ct, cl, cb):
        out = _variant_call(_adc_kernel_v1b, luts, ct, cl, cb, tiles)
        lane = jnp.arange(CHUNK, dtype=jnp.int32)
        nch_p = out.shape[1]
        clp = jnp.pad(cl, ((0, 0), (0, nch_p - cl.shape[1])))
        cbp = jnp.pad(cb, ((0, 0), (0, nch_p - cb.shape[1])))
        out = jnp.where(lane[None, None, :] < clp[:, :, None],
                        out + cbp[:, :, None], jnp.inf)
        return out.reshape(B, -1)

    d1b = jax.block_until_ready(kern_v1b(luts, ct, cl, cb))
    a1b = np.sort(np.asarray(d1b), axis=1)[:, :MAX_CODES]
    print(f"v1b match: {np.allclose(a1, a1b, atol=1e-3)}")
    ms5 = marginal_ms(kern_v1b, luts, ct, cl, cb)
    print(f"v1b batched-waits: {ms5:.2f} ms ({ms5*1e3/B:.2f} us/q, "
          f"{ms5*1e6/B/real:.0f} ns/chunk)")

    # quad layout
    qt_np, ids_q, qoff, sizes_np = build_quad_layout(store)
    nquad = (MAX_CODES + mx) // RCHUNK + NPROBE + 1
    qtiles = jnp.asarray(qt_np)
    qoff_d = jnp.asarray(qoff)
    print(f"quad tiles: {qt_np.shape} nquad={nquad}", file=sys.stderr)

    @jax.jit
    def pre_quad(q):
        qc, probes = streaming_topk_l2(q, centroids, NPROBE, block=4096,
                                       point_sqnorms=centroid_norms,
                                       precision=jax.lax.Precision.HIGHEST)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids,
                                 precision=jax.lax.Precision.HIGHEST)
        lq = build_luts_quad(luts)
        qt_, ql_, qb_ = quad_metadata(probes, qc, centroid_norms,
                                      qoff_d, list_sizes, mc, nquad)
        return lq, qt_, ql_, qb_

    lq, qt_, ql_, qb_ = jax.block_until_ready(pre_quad(q))

    @jax.jit
    def kern_quad(lq, qt_, ql_, qb_):
        return adc_scan_quad(lq, qt_, ql_, qb_, qtiles)

    dq = jax.block_until_ready(kern_quad(lq, qt_, ql_, qb_))
    aq = np.sort(np.asarray(dq), axis=1)[:, :MAX_CODES]
    print(f"quad match: {np.allclose(a1, aq, atol=1e-3)}")
    msq = marginal_ms(kern_quad, lq, qt_, ql_, qb_)
    realq = float(np.asarray(((ql_ + CHUNK - 1) // CHUNK)
                             .sum(axis=1)).mean())
    print(f"quad kernel: {msq:.2f} ms ({msq*1e3/B:.2f} us/q, "
          f"{msq*1e6/B/realq:.0f} ns/real-chunk, "
          f"{realq:.0f} real chunks)")
    ms_pre_q = marginal_ms(pre_quad, q)
    print(f"pre_quad: {ms_pre_q:.2f} ms ({ms_pre_q*1e3/B:.2f} us/q)")

    for cpsq, depth, arith, nb_ in ((8, 32, False, False),
                                    (8, 32, False, True),
                                    (16, 64, False, False),
                                    (16, 64, False, True),
                                    (16, 48, False, True),
                                    (8, 64, False, True),
                                    (32, 128, False, True),
                                    (8, 32, False, True)):
        @functools.partial(jax.jit, static_argnames=())
        def kq(lq, qt_, ql_, qb_, _c=cpsq, _d=depth, _a=arith, _n=nb_):
            return adc_scan_quad(lq, qt_, ql_, qb_, qtiles,
                                 cpsq=_c, depth=_d, arith=_a,
                                 branchless=_n)
        dv = jax.block_until_ready(kq(lq, qt_, ql_, qb_))
        av = np.sort(np.asarray(dv), axis=1)[:, :MAX_CODES]
        okv = np.allclose(a1, av, atol=1e-3)
        msv = marginal_ms(kq, lq, qt_, ql_, qb_)
        print(f"quad cpsq={cpsq} depth={depth} arith={arith} "
              f"branchless={nb_}: {msv:.2f} ms ({msv*1e3/B:.2f} us/q, "
              f"{msv*1e6/B/realq:.0f} ns/chunk) match={okv}", flush=True)

    # chunk layout: (cps, depth, batched_wait) sweep of the production
    # kernel shape — the per-unit-floor lever for chunk-layout geometries
    # (scale3: 212 profiled chunk slots at nc=2^20).
    for cps_, dep_, bw_ in ((8, 32, False), (16, 64, False),
                            (16, 128, False), (8, 64, False),
                            (32, 128, False), (16, 64, False)):
        @functools.partial(jax.jit, static_argnames=())
        def kc(luts, ct, cl, cb, _c=cps_, _d=dep_, _b=bw_):
            return adc_scan_tiles_cps(luts, ct, cl, cb, tiles,
                                      cps=_c, depth=_d, batched_wait=_b)
        dv = jax.block_until_ready(kc(luts, ct, cl, cb))
        av = np.sort(np.asarray(dv), axis=1)[:, :MAX_CODES]
        okv = np.allclose(a1, av, atol=1e-3)
        msv = marginal_ms(kc, luts, ct, cl, cb)
        print(f"chunk cps={cps_} depth={dep_} bw={bw_}: "
              f"{msv:.2f} ms ({msv*1e3/B:.2f} us/q, "
              f"{msv*1e6/B/real:.0f} ns/chunk) match={okv}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
