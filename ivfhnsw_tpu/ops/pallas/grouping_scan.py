"""Pallas fused scan for the Grouping(+Pruning) index.

Same tiled-DMA + dynamic_gather structure as adc_scan.py, with the grouping
twists (IndexIVF_HNSW_Grouping.cpp:188-363):

- tiles are **group-aligned** (subgroups average only tens of codes, so
  aligning each subgroup would waste ~16x; instead a chunk spans subgroups
  within one group, and tile row SUBC_ROW carries each position's
  subcentroid index — storage.PostingListStore.tiled_grouped);
- term1 = (1-a)(||q-c||^2 - ||c||^2) is the per-chunk scalar bias;
- term2 = a(||q-n||^2 - ||n||^2) differs per subcentroid: each query's FULL
  per-probe term2 table ([P, 256] f32, +inf on pruned/empty lanes) sits in
  a VMEM block revisited across that query's chunks; each chunk dynamically
  slices its probe's row (seg from SMEM) and gathers it by the tile's
  subcentroid row. **Pruning and empty subgroups are folded into the table
  as +inf**, so the masked-compute semantics of the XLA engine are
  preserved bit-for-bit while the scan stays branch-free;
- the max_codes budget is probe-granular over *unpruned* sizes, matching
  the reference's ncode accounting (:302-353);
- like adc_scan, each grid step processes CPS chunks with a DEPTH-slot
  rolling DMA pipeline (the round-1 kernel ran one chunk per step and paid
  ~3x the per-chunk fixed cost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ivfhnsw_tpu.ops.pallas.adc_scan import (CHUNK, CPS, CPSQ, DEPTH,
                                             DEPTH_Q, LUT_ROWS, QROWS, RCHUNK,
                                             RTL_PACK, TL_PACK, build_luts_ext,
                                             build_luts_quad)
from ivfhnsw_tpu.ops.topk import binned_topk_smallest

SUBC_ROW = 17
HIGHEST = jax.lax.Precision.HIGHEST


def _grouping_schedule(probes, term1, eff_sizes, scan_sizes, tile_offsets,
                       max_codes, n: int, gran: int, pack: int):
    """Shared slot-schedule builder at group granularity (gran=CHUNK for
    the per-chunk layout, gran=RCHUNK for the quad layout).

    probes [B, P] (ascending distance); term1 [B, P]; eff_sizes [B, P] =
    unpruned code counts (budget accounting); scan_sizes [B, P] = full group
    window lengths. Returns (tl packed [B, n], bias [B, n], seg [B, n])."""
    B, P = probes.shape
    cum_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.cumsum(eff_sizes, axis=1)[:, :-1]], axis=1)
    included = jnp.logical_or(max_codes <= 0, cum_before < max_codes)
    # FULLY-pruned (or empty) groups contribute only masked +inf lanes and
    # zero budget — skip their whole window at schedule time. Far probes
    # often have every subgroup above the pruning threshold, so this cuts
    # real scan traffic with bit-identical results (flagship point,
    # tools/grouping_lab.py layout, v5e: quad 23.8 -> 17.6 us/q sustained,
    # chunk 31.4 -> 21.4).
    included = jnp.logical_and(included, eff_sizes > 0)
    tcnt = jnp.where(included, (scan_sizes + gran - 1) // gran, 0)
    bounds = jnp.cumsum(tcnt, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, :-1]], axis=1)
    j = jnp.arange(n, dtype=jnp.int32)

    # 8-lane packed row gather + one-hot einsum selection — see
    # adc_scan.chunk_metadata for why (1-lane gathers and take_along_axis
    # on [B, P] rows are ~ms-scale on TPU; this form is ~5-20x faster).
    packed = jnp.pad(tile_offsets.astype(jnp.float32)[:, None],
                     ((0, 0), (0, 7)))
    tile_off = jnp.take(packed, probes, axis=0)[..., 0]         # [B, P]
    oh = jnp.logical_and(starts[:, None, :] <= j[None, :, None],
                         bounds[:, None, :] > j[None, :, None])  # [B, n, P]
    vals = jnp.stack([starts.astype(jnp.float32),
                      scan_sizes.astype(jnp.float32), term1, tile_off,
                      jnp.broadcast_to(
                          jnp.arange(P, dtype=jnp.float32)[None, :], (B, P))],
                     axis=-1)                                   # [B, P, 5]
    sel = jnp.einsum("bjp,bpv->bjv", oh.astype(jnp.float32), vals,
                     precision=jax.lax.Precision.HIGHEST)       # [B, n, 5]
    valid = j[None, :] < bounds[:, -1:]
    within = j[None, :] - jnp.round(sel[..., 0]).astype(jnp.int32)
    tile = jnp.round(sel[..., 3]).astype(jnp.int32) + within
    ln = jnp.clip(jnp.round(sel[..., 1]).astype(jnp.int32) - within * gran,
                  0, gran)
    seg_c = jnp.round(sel[..., 4]).astype(jnp.int32)
    tl = jnp.where(valid, tile, 0) * pack + jnp.where(valid, ln, 0)
    bias = jnp.where(valid, sel[..., 2], 0.0)
    return tl, bias, jnp.where(valid, seg_c, 0)


@functools.partial(jax.jit, static_argnames=("nch",))
def grouping_chunk_metadata(probes, term1, eff_sizes, scan_sizes,
                            tile_offsets, max_codes, nch: int):
    """Chunk-granular schedule (per-chunk tile layout)."""
    return _grouping_schedule(probes, term1, eff_sizes, scan_sizes,
                              tile_offsets, max_codes, nch, CHUNK, TL_PACK)


@functools.partial(jax.jit, static_argnames=("nquad",))
def grouping_quad_metadata(probes, term1, eff_sizes, scan_sizes,
                           qtile_offsets, max_codes, nquad: int):
    """RCHUNK-granular schedule against QUAD grouped tile indices."""
    return _grouping_schedule(probes, term1, eff_sizes, scan_sizes,
                              qtile_offsets, max_codes, nquad, RCHUNK,
                              RTL_PACK)


def _grouping_kernel(tl_smem, seg_smem, luts_ref, t2_ref, tiles_hbm,
                     out_ref, scratch, tab_scratch, sems):
    """CPS chunks per grid step; t2_ref holds the query's whole per-probe
    term2 table [1, P_pad, 256] (revisited), sliced per chunk by seg.

    The chunk body does ONE gather pass, like the IVFADC kernel: the query's
    LUT is copied once into a scratch table whose SUBC_ROW is overwritten
    per chunk with the probe's term2 row. Tile row SUBC_ROW carries each
    position's subcentroid id, so the 24-row gather-sum picks up
    term2[subc[lane]] along with term3 and the norm decode — +inf on pruned
    subcentroid lanes propagates through the sum, preserving the masked
    semantics. (The previous version gathered term2 in a second full pass
    against a row-replicated table — ~2x the per-chunk VPU work.)"""
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

    @pl.when(j == 0)
    def _():
        tab_scratch[:] = luts_ref[0]                   # [24, 256]

    def half(tab0, tab1, idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(tab0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(tab1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPS):
        c = j * CPS + i
        g = g0 + i
        tl = tl_smem[b, c]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH), tl // TL_PACK).wait()
            idx = scratch[jax.lax.rem(g, DEPTH)].astype(jnp.int32)  # [24,256]
            tab_scratch[SUBC_ROW:SUBC_ROW + 1, :] = (
                t2_ref[0, pl.ds(seg_smem[b, c], 1), :])
            tab = tab_scratch[:]
            gsum = jnp.concatenate(
                [half(tab[:, :128], tab[:, 128:], idx[:, :128]),
                 half(tab[:, :128], tab[:, 128:], idx[:, 128:])], axis=1)
            # Raw sums stored; the caller masks tail lanes (>= ln) outside
            # the kernel where the mask fuses into one elementwise pass.
            out_ref[0, i, :] = jnp.sum(gsum, axis=0)       # [256]
        # ln == 0 (padding slot): no store — masked +inf by the caller.


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouping_scan_tiles(luts_ext, tl, seg, term2_tab, tiles,
                        interpret: bool = False):
    """term2_tab [B, P, 256] f32 (+inf on pruned/empty/invalid lanes).
    Returns dists [B, nch*CHUNK]."""
    B, nch_orig = tl.shape
    nch = nch_orig
    P = term2_tab.shape[1]
    P_pad = -(-P // 8) * 8   # sublane-aligned VMEM block
    if P_pad != P:
        term2_tab = jnp.pad(term2_tab, ((0, 0), (0, P_pad - P), (0, 0)),
                            constant_values=jnp.inf)
    if nch % CPS:
        pad = CPS - nch % CPS
        tl = jnp.pad(tl, ((0, 0), (0, pad)))
        seg = jnp.pad(seg, ((0, 0), (0, pad)))
        nch += pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nch // CPS),
        in_specs=[
            pl.BlockSpec((1, LUT_ROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # Static per-chunk row stores into a [1, CPS, CHUNK] block — see
        # adc_scan.adc_scan_tiles for the layout rationale.
        out_specs=pl.BlockSpec((1, CPS, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.VMEM((LUT_ROWS, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        _grouping_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nch, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tl, seg, luts_ext, term2_tab, tiles)
    # Lane-level tail mask + padding-slot mask in one elementwise pass
    # (unwritten/tail lanes can be NaN, which would poison the bias add).
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(
        lane[None, None, :] < jax.lax.rem(tl, TL_PACK)[:, :, None],
        out, jnp.inf)
    return out.reshape(B, nch * CHUNK)[:, :nch_orig * CHUNK]


def _grouping_kernel_quad(qtl_smem, seg_smem, luts_ref, t2_ref, qtiles_hbm,
                          out_ref, scratch, tab_scratch, sems):
    """QUAD grouping step: the adc_scan quad pipeline (CPSQ tiles per step,
    DEPTH_Q rolling DMA slots, batched waits) over GROUP-aligned quad tiles.

    Tile rows 68..71 carry each chunk's per-position subcentroid ids
    (storage.PostingListStore.quad_grouped). The query's quad LUT is copied
    once into tab_scratch, whose rows 68..71 are overwritten per quad tile
    with the probe's term2 row (same store-then-gather pattern as the chunk
    kernel's SUBC_ROW rewrite — an in-register broadcast of the dynamic
    t2_ref slice is not a layout Mosaic accepts). One 18-group gather-sum
    then yields all four chunk rows with term2 folded in: the same number
    of (1, 256) table stores per code as the chunk kernel, but 4x fewer
    DMA descriptors and 18 vs 24 fetched B/code. +inf on pruned/empty term2
    lanes propagates through the sum, preserving the masked-compute
    semantics bit-for-bit."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nq = nsteps * CPSQ

    def dma(slot, t):
        return pltpu.make_async_copy(qtiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        bb = gg // nq
        cc = jax.lax.rem(gg, nq)
        tl = qtl_smem[bb, cc]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(gg, DEPTH_Q), tl // RTL_PACK).start()

    g0 = b * nq + j * CPSQ

    @pl.when(g0 == 0)
    def _():
        for w in range(DEPTH_Q - CPSQ):
            @pl.when(w < nb * nq)
            def _():
                start_for(jnp.int32(w))

    for i in range(CPSQ):
        @pl.when(g0 + DEPTH_Q - CPSQ + i < nb * nq)
        def _():
            start_for(g0 + DEPTH_Q - CPSQ + i)

    for i in range(CPSQ):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ + i]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH_Q), tl // RTL_PACK).wait()

    @pl.when(j == 0)
    def _():
        tab_scratch[:] = luts_ref[0]                       # [72, 256]

    def gather_half(tab0, tab1, idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(tab0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(tab1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPSQ):
        g = g0 + i
        c = j * CPSQ + i
        tl = qtl_smem[b, c]
        ln = jax.lax.rem(tl, RTL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[jax.lax.rem(g, DEPTH_Q)].astype(jnp.int32)
            # Rows 68..71 <- the probe's term2 row (one per chunk of this
            # tile: all four chunks share the tile's group, hence probe).
            t2row = t2_ref[0, pl.ds(seg_smem[b, c], 1), :]        # [1, 256]
            for r in range(4):
                tab_scratch[68 + r:69 + r, :] = t2row
            tab = tab_scratch[:]
            gg = jnp.concatenate(
                [gather_half(tab[:, :128], tab[:, 128:], idx[:, :128]),
                 gather_half(tab[:, :128], tab[:, 128:], idx[:, 128:])],
                axis=1)                                           # [72, 256]
            # 18-group sublane-strided sum -> all four chunk rows; group 17
            # contributes term2[subc[lane]] per chunk.
            out_ref[0, i * 4:(i + 1) * 4, :] = jnp.sum(
                gg.reshape(18, 4, 256), axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouping_scan_quad(luts_quad, qtl, seg, term2_tab, qtiles,
                       interpret: bool = False):
    """Quad grouping scan. term2_tab [B, P, 256] f32 (+inf on pruned/empty
    lanes); qtl/seg [B, nquad] (grouping_quad_metadata); qtiles
    [NQT, 72, 256] u8. Returns dists [B, nquad*RCHUNK] (masked +inf)."""
    B, nquad_orig = qtl.shape
    nquad = nquad_orig
    P = term2_tab.shape[1]
    P_pad = -(-P // 8) * 8
    if P_pad != P:
        term2_tab = jnp.pad(term2_tab, ((0, 0), (0, P_pad - P), (0, 0)),
                            constant_values=jnp.inf)
    if nquad % CPSQ:
        pad = CPSQ - nquad % CPSQ
        qtl = jnp.pad(qtl, ((0, 0), (0, pad)))
        seg = jnp.pad(seg, ((0, 0), (0, pad)))
        nquad += pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nquad // CPSQ),
        in_specs=[
            pl.BlockSpec((1, QROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CPSQ * 4, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH_Q, QROWS, CHUNK), jnp.uint8),
            pltpu.VMEM((QROWS, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH_Q,)),
        ],
    )
    out = pl.pallas_call(
        _grouping_kernel_quad,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nquad * 4, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qtl, seg, luts_quad, term2_tab, qtiles)
    # Quad-slot lengths -> chunk-granular tail mask (see adc_scan_quad).
    qlen = jax.lax.rem(qtl, RTL_PACK)
    rr = jnp.arange(4, dtype=jnp.int32)
    chunk_len = jnp.clip(qlen[:, :, None] - rr[None, None, :] * CHUNK,
                         0, CHUNK).reshape(B, nquad * 4)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out, jnp.inf)
    return out.reshape(B, nquad * 4 * CHUNK)[:, :nquad_orig * RCHUNK]


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "nch", "nsubc", "coarse_block",
                     "use_opq", "do_pruning", "interpret", "precision",
                     "coarse_approx", "coarse_recall", "layout"))
def grouping_pallas_search_many(queries, *args, nprobe, k, nch, nsubc,
                                coarse_block, use_opq, do_pruning,
                                interpret=False, precision=HIGHEST,
                                coarse_approx=False, coarse_recall=0.95,
                                layout="chunk"):
    """Whole query set [G, B, d] in one launch (lax.map over sub-batches;
    see adc_scan.pallas_search_many for why)."""
    def one(q):
        return grouping_pallas_search_core(
            q, *args, nprobe=nprobe, k=k, nch=nch, nsubc=nsubc,
            coarse_block=coarse_block, use_opq=use_opq,
            do_pruning=do_pruning, interpret=interpret, precision=precision,
            coarse_approx=coarse_approx, coarse_recall=coarse_recall,
            layout=layout)

    return jax.lax.map(one, queries)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "nch", "nsubc", "coarse_block",
                     "use_opq", "do_pruning", "interpret", "precision",
                     "coarse_approx", "coarse_recall", "layout"))
def grouping_pallas_search_core(
        queries, centroids, centroid_norms, codebooks, norm_centroids, R,
        tiles, ids_aligned, tile_offsets, nn_idxs, alphas, inter_dists,
        sub_sizes, max_codes, *, nprobe: int, k: int, nch: int, nsubc: int,
        coarse_block: int, use_opq: bool, do_pruning: bool,
        interpret: bool = False, precision=HIGHEST,
        coarse_approx: bool = False, coarse_recall: float = 0.95,
        layout: str = "chunk"):
    """Fused grouping search. sub_sizes [nc, nsubc] i32 subgroup sizes;
    tile_offsets [nc+1] group tile starts (layout='chunk': 256-granular
    tiles; layout='quad': 1024-granular quad tiles, nch counts QUAD slots)."""
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    B = queries.shape[0]

    qc_dists, probes = streaming_topk_l2(
        queries, centroids, nprobe, block=coarse_block,
        point_sqnorms=centroid_norms, precision=precision,
        approx=coarse_approx, recall_target=coarse_recall)

    p_nn = nn_idxs[probes]                                # [B, P, S]
    q_sq = jnp.sum(queries ** 2, axis=1)

    # Neighbor-centroid distances: gather centroid rows EXTENDED with their
    # norm as a trailing lane — a separate centroid_norms[nn_p] would be a
    # 1-lane gather of B*P*S elements, which XLA lowers to a ~ms-scale
    # element loop (see adc_scan.chunk_metadata).
    cent_ext = jnp.concatenate([centroids, centroid_norms[:, None]], axis=1)

    def nn_dist_one_probe(nn_p):
        cn = cent_ext[nn_p]                               # [B, S, d+1]
        ip = jnp.einsum("bsd,bd->bs", cn[..., :-1], queries,
                        precision=precision,
                        preferred_element_type=jnp.float32)
        # (query-to-neighbor dist, neighbor norm) stacked on a new axis.
        return jnp.stack([q_sq[:, None] - 2.0 * ip + cn[..., -1],
                          cn[..., -1]], axis=0)

    qn = jnp.moveaxis(
        jax.lax.map(nn_dist_one_probe, jnp.moveaxis(p_nn, 1, 0)), 0, 2)
    qn_dists, nn_norms = qn[0], qn[1]                     # [B, P, S]

    # alpha + centroid norm at the probes: one packed 8-lane row gather.
    apack = jnp.pad(jnp.stack([alphas, centroid_norms], axis=1),
                    ((0, 0), (0, 6)))
    ag = jnp.take(apack, probes, axis=0)                  # [B, P, 8]
    a, probe_norms = ag[..., 0], ag[..., 1]               # [B, P]
    one_m_a = (1.0 - a)[:, :, None]
    a_b = a[:, :, None]
    ssz = sub_sizes[probes].astype(jnp.int32)             # [B, P, S]
    nonempty = ssz > 0

    i_dists = inter_dists[probes]
    qsd = (one_m_a * qc_dists[:, :, None] + a_b * qn_dists
           - a_b * one_m_a * i_dists)
    if do_pruning:
        g_sizes = jnp.sum(ssz, axis=2)
        g_cum_before = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.cumsum(g_sizes, axis=1)[:, :-1]], axis=1)
        thr_probe = jnp.logical_or(max_codes <= 0,
                                   g_cum_before < 2 * max_codes)
        thr_mask = nonempty & thr_probe[:, :, None]
        n_slots = jnp.maximum(jnp.sum(thr_mask, axis=(1, 2)), 1)
        threshold = (jnp.sum(jnp.where(thr_mask, qsd, 0.0), axis=(1, 2))
                     / n_slots)
        scan_slot = nonempty & (qsd < threshold[:, None, None])
    else:
        scan_slot = nonempty

    term1 = one_m_a[:, :, 0] * (qc_dists - probe_norms)   # [B, P]
    term2 = a_b * (qn_dists - nn_norms)                   # [B, P, S]
    # Per-(query, probe) lane table: term2 where scanned, +inf where pruned
    # or empty; lanes >= nsubc unreachable (subc row is always < nsubc).
    t2_tab = jnp.full((B, nprobe, 256), jnp.inf, jnp.float32)
    t2_tab = t2_tab.at[:, :, :nsubc].set(
        jnp.where(scan_slot, term2, jnp.inf))

    eff_sizes = jnp.sum(jnp.where(scan_slot, ssz, 0), axis=2)  # [B, P]
    scan_sizes = jnp.sum(ssz, axis=2)                          # [B, P]

    q_rot = queries @ R.T if use_opq else queries
    luts_ext = build_luts_ext(q_rot, codebooks, norm_centroids,
                              precision=precision)

    if layout == "quad":
        qtl, bias, seg = grouping_quad_metadata(
            probes, term1, eff_sizes, scan_sizes, tile_offsets, max_codes,
            nch)
        dists = grouping_scan_quad(build_luts_quad(luts_ext), qtl, seg,
                                   t2_tab, tiles, interpret=interpret)
        bias4 = jnp.broadcast_to(bias[:, :, None],
                                 (B, nch, 4)).reshape(B, nch * 4)
        dists = (dists.reshape(B, nch * 4, CHUNK)
                 + bias4[:, :, None]).reshape(B, nch * RCHUNK)
        best, sel = binned_topk_smallest(dists, k, bin_size=32)
        quad_of = sel // RCHUNK
        within = sel % RCHUNK
        qtile_sel = jnp.take_along_axis((qtl // RTL_PACK), quad_of, axis=1)
        labels = ids_aligned[qtile_sel * RCHUNK + within]
        labels = jnp.where(jnp.isfinite(best), labels, -1)
        return best, labels

    tl, bias, seg = grouping_chunk_metadata(
        probes, term1, eff_sizes, scan_sizes, tile_offsets, max_codes, nch)
    dists = grouping_scan_tiles(luts_ext, tl, seg, t2_tab, tiles,
                                interpret=interpret)
    dists = (dists.reshape(B, nch, CHUNK)
             + bias[:, :, None]).reshape(B, nch * CHUNK)

    # bin32 top-k over the wide masked output — flat lax.top_k is
    # sort-bound linear in width (see adc_scan.adc_search_tiles note).
    best, sel = binned_topk_smallest(dists, k, bin_size=32)
    chunk_of = sel // CHUNK
    within = sel % CHUNK
    tile_sel = jnp.take_along_axis((tl // TL_PACK), chunk_of, axis=1)
    labels = ids_aligned[tile_sel * CHUNK + within]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    return best, labels
