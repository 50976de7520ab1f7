"""Pallas TPU kernel for the fused ADC posting-list scan.

THE kernel of the framework (SURVEY.md §7 "hard parts" #2): replaces the
reference's pq_L2sqr LUT loop (IndexIVF_HNSW.cpp:262, 802-814) and, more
importantly, the XLA gathers that dominate the portable implementation
(measured: 317 us/query code-row gather + 2763 us/query LUT take_along_axis
on a v5e at nprobe=32/max_codes=10k — 60x the total budget).

Design:

- **Tiled code layout**: posting lists are stored 256-code-aligned; one scan
  chunk = one HBM tile ``[24, 256] u8`` = rows 0..15 the *transposed* PQ
  codes, row 16 the 1-byte norm codes, rows 17..23 zero padding (DMA slice
  rows must be 8-aligned). A chunk is a single contiguous DMA —
  no gather, because probe segments are contiguous runs by construction.
- **VMEM LUTs with folded terms**: per query a ``[24, 256] f32`` table whose
  rows 0..15 are ``-2 * <q_m, codebook_m[k]>`` (term3 with its sign/factor
  folded in) and row 16 is the norm-PQ decode table (term2). The ADC
  distance is then ``bias + sum_rows(table[row, code[row]])`` — one
  ``tpu.dynamic_gather`` per 128-lane half (the gather dimension must fit a
  single vreg, so the 256-entry tables are split into two halves + select).
- **Double-buffered DMA**: chunk j+1 streams in while chunk j computes.
- Output is the full masked distance array ``[B, NCH*256]``; top-k and the
  tiny k-element id gather stay in XLA.

The kernel is grid-(B, NCH) with scalar-prefetched per-chunk metadata
(tile index, valid length, term1 bias) computed by
:func:`chunk_metadata` — which also reproduces the reference's max_codes
budget semantics (IndexIVF_HNSW.cpp:290-292) at probe granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ivfhnsw_tpu.ops.topk import binned_topk_smallest, topk_smallest

CHUNK = 256
LUT_ROWS = 24  # 16 PQ subquantizers + 1 norm row + 7 pad rows
NORM_ROW = 16  # row index of the norm-decode table
CPS = 16       # chunks processed per grid step (amortizes fixed step costs);
               # also the out-block sublane count — a multiple of 8 keeps
               # the (8,128) tile rule, so chunk stores are static row
               # writes. Swept round 3 (tools/kernel_lab.py, v5e): 16/64
               # measured 218 vs 235 ns/chunk for the round-2 8/32.
DEPTH = 64     # DMA pipeline slots; must exceed 2*CPS for safe slot reuse;
               # power of 2 so the slot modulo is a mask, not a division.
               # 128 slots measured WORSE (243 ns/chunk) — too much VMEM
               # pressure for no extra latency hiding.
TL_PACK = 512  # packed metadata: value = tile_idx * TL_PACK + chunk_len;
               # bounds per-shard tiles to 2^31/512 = 4.2M (1.07B codes)

# --- quad-tile engine (the default IVFADC scan since round 2) -------------
# Four 256-code chunks per HBM tile, code rows interleaved 4m+c so that
#   - gathers waste 4/72 rows instead of 7/24 (the 8-row DMA alignment pad),
#   - the per-chunk accumulation is a cheap 18-group sublane-strided sum
#     yielding all four chunk rows at once (vs a 24-row cross-sublane tree),
#   - one DMA descriptor + semaphore covers 1024 codes (17.2 B/code fetched
#     vs 24), and
#   - schedule metadata shrinks 4x, which relaxes the SMEM batch cap.
# Measured on v5e at the primary bench point (B=1024): kernel 9.3 vs
# 10.1 us/q — but the coarser slot granularity pads the masked output ~2.2x
# wider (45k vs 20k lanes at nprobe=32/mc=10k), costing ~0.4 us/q more
# top-k, so END-TO-END the two layouts are within noise of each other
# (tools/quad_probe.py). Quad stays the default for its 25% smaller HBM
# store (18 vs 24 fetched B/code). Posting lists are 1024-aligned in this
# layout (<= RCHUNK-1 pad codes per list).
QROWS = 72       # 64 interleaved code rows + 4 norm rows + 4 pad rows
QNORM_ROW = 64   # rows 64..67 hold chunk 0..3 norm codes
RCHUNK = 4 * CHUNK
CPSQ = 8         # quad tiles per grid step -> 32 chunk rows out per step.
                 # Swept round 3 (tools/kernel_lab.py, v5e): cpsq/depth
                 # 8/32 measured 173-174 ns/chunk vs 233 for the round-2
                 # 2/8 (4/16 was 174-188) — the per-STEP scalar fixed cost
                 # is the scan's floor, so amortizing it over 4x the DMAs
                 # is a ~25% kernel cut at every geometry.
DEPTH_Q = 32     # quad DMA pipeline slots (> 2*CPSQ)
RTL_PACK = 2048  # packed schedule: qtile * RTL_PACK + len (len <= RCHUNK);
                 # bounds per-shard quad tiles to 2^31/2048 = 1.05M (1.07B
                 # codes — same corpus bound as the chunk layout)

# A third, RUN-granular engine (RUN=4 consecutive chunk tiles per DMA over
# the per-chunk store — quad's descriptor economics without its 1024-code
# list alignment) was built and measured round 3 (tools/layout_probe.py)
# and DELETED: it was dominated at every geometry — 152 codes/list: chunk
# 37.7 < run 45.3 < quad 57.5 us/q; 325/list: 12.6 < 15.0 < 16.8;
# 488/list: quad 9.3 < run 10.9 < chunk 11.8. At equal slot granularity
# quad fetches 18 B/code vs run's 24 (interleaved rows), and below the
# quad crossover chunk's exact 256-code slots beat both; the run engine
# is structurally sandwiched. See git history for the implementation.


def build_luts_ext(q_rot, codebooks, norm_centroids, precision=None):
    """[B, d] queries -> [B, LUT_ROWS, 256] f32 fused tables.

    rows 0..M-1: -2 * inner-product LUT (term3 folded); row NORM_ROW: the
    norm decode table (term2); remaining rows zero (match zero code rows).
    """
    from ivfhnsw_tpu.ops.pq import _pq_ip_luts
    B = q_rot.shape[0]
    M, ksub, _ = codebooks.shape
    luts = _pq_ip_luts(q_rot, codebooks, precision=precision)  # [B, M, ksub]
    out = jnp.zeros((B, LUT_ROWS, 256), jnp.float32)
    out = out.at[:, :M, :ksub].set(-2.0 * luts)
    out = out.at[:, NORM_ROW, :norm_centroids.shape[0]].set(
        jnp.broadcast_to(norm_centroids, (B, norm_centroids.shape[0])))
    return out


def _probe_schedule(probes, qc_dists, centroid_norms, tile_offsets,
                    list_sizes, max_codes, n: int, gran: int):
    """Shared schedule builder: expand per-probe posting lists into ``n``
    fixed slots of ``gran`` codes each (gran=CHUNK for the per-chunk layout,
    gran=RCHUNK for the quad layout).

    Returns (slot_tile [B, n] i32, slot_len [B, n] i32 (<= gran),
             slot_bias [B, n] f32)."""
    B, P = probes.shape
    nc = list_sizes.shape[0]

    # Packed per-centroid row gather: XLA lowers 1-lane gathers from [nc]
    # tables into ~0.7 ms/batch element loops, while one 8-lane row gather
    # of the same indices is ~5x faster — so pack (size, tile_offset,
    # centroid_norm) as rows of a [nc, 8] table and gather once. f32 holds
    # both ints exactly (tile indices are bounded by TL_PACK to 4.2M < 2^24).
    pack = jnp.stack([list_sizes.astype(jnp.float32),
                      tile_offsets[:nc].astype(jnp.float32),
                      centroid_norms], axis=1)                  # [nc, 3]
    pack = jnp.pad(pack, ((0, 0), (0, 5)))
    g = jnp.take(pack, probes, axis=0)                          # [B, P, 8]
    return _probe_schedule_fields(g[..., 0], g[..., 1],
                                  qc_dists - g[..., 2], max_codes, n, gran)


def _probe_schedule_fields(sizes_f, tile_off_f, term1, max_codes, n: int,
                           gran: int):
    """Schedule expansion from PRE-GATHERED per-probe fields (f32; the
    routed path serves them from the same row gather as probe selection —
    separate gathers measured ~25 us/q at nc=2^17)."""
    B, P = term1.shape
    sizes = sizes_f.astype(jnp.int32)
    tile_off = tile_off_f

    cum_before = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(sizes, axis=1)[:, :-1]],
        axis=1)
    included = jnp.logical_or(max_codes <= 0, cum_before < max_codes)
    tcnt = jnp.where(included, (sizes + gran - 1) // gran, 0)   # [B, P]
    bounds = jnp.cumsum(tcnt, axis=1)                           # [B, P]
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bounds[:, :-1]], axis=1)
    j = jnp.arange(n, dtype=jnp.int32)

    # One-hot probe->slot expansion: oh[b, j, p] = (slot j belongs to
    # probe p), then ONE einsum selects all per-slot fields at once.
    # (take_along_axis on [B, P] rows costs ~0.8 ms per field on TPU; the
    # einsum does all four in ~0.2 ms.) HIGHEST precision keeps the f32
    # products exact; values are integers < 2^24, so round() is exact too.
    oh = jnp.logical_and(starts[:, None, :] <= j[None, :, None],
                         bounds[:, None, :] > j[None, :, None])  # [B, n, P]
    vals = jnp.stack([starts.astype(jnp.float32), sizes.astype(jnp.float32),
                      term1, tile_off], axis=-1)                # [B, P, 4]
    sel = jnp.einsum("bjp,bpv->bjv", oh.astype(jnp.float32), vals,
                     precision=jax.lax.Precision.HIGHEST)       # [B, n, 4]
    valid = j[None, :] < bounds[:, -1:]
    within = j[None, :] - jnp.round(sel[..., 0]).astype(jnp.int32)
    tile = jnp.round(sel[..., 3]).astype(jnp.int32) + within
    ln = jnp.clip(jnp.round(sel[..., 1]).astype(jnp.int32) - within * gran,
                  0, gran)
    return (jnp.where(valid, tile, 0),
            jnp.where(valid, ln, 0),
            jnp.where(valid, sel[..., 2], 0.0))


@functools.partial(jax.jit, static_argnames=("nch",))
def chunk_metadata(probes, qc_dists, centroid_norms, tile_offsets, list_sizes,
                   max_codes, nch: int):
    """Per-query chunk schedule (per-chunk tile layout).

    probes [B, P] ascending-distance centroid ids; tile_offsets [nc+1] —
    tile index where each list's aligned storage starts; list_sizes [nc].
    Returns (chunk_tile [B, nch] i32, chunk_len [B, nch] i32,
             chunk_bias [B, nch] f32).
    """
    return _probe_schedule(probes, qc_dists, centroid_norms, tile_offsets,
                           list_sizes, max_codes, nch, CHUNK)


@functools.partial(jax.jit, static_argnames=("nquad",))
def quad_metadata(probes, qc_dists, centroid_norms, qtile_offsets,
                  list_sizes, max_codes, nquad: int):
    """Per-query RCHUNK-granular schedule against QUAD tile indices.

    Returns (qtile [B, nquad] i32, qlen [B, nquad] i32 (<= RCHUNK),
             qbias [B, nquad] f32)."""
    return _probe_schedule(probes, qc_dists, centroid_norms, qtile_offsets,
                           list_sizes, max_codes, nquad, RCHUNK)


def build_luts_quad(luts_ext):
    """[B, 24, 256] ext LUTs -> [B, 72, 256] quad LUTs: PQ table m is
    replicated into rows 4m..4m+3 (matching the 4m+c code-row interleave),
    the norm table into rows 64..67; rows 68..71 zero (match pad rows)."""
    B = luts_ext.shape[0]
    pq = jnp.repeat(luts_ext[:, :16, :], 4, axis=1)        # rows 4m+c
    nrm = jnp.repeat(luts_ext[:, NORM_ROW:NORM_ROW + 1, :], 4, axis=1)
    pad = jnp.zeros((B, QROWS - 68, 256), jnp.float32)
    return jnp.concatenate([pq, nrm, pad], axis=1)


def _adc_kernel(tl_smem,   # scalar prefetch: packed tile*TL_PACK + len
                luts_ref, tiles_hbm, out_ref, scratch, sems):
    """Each grid step processes CPS chunks (amortizing per-step fixed costs)
    with a DEPTH-slot rolling DMA pipeline: warm-up issues the first
    DEPTH-CPS chunk DMAs; each step issues the CPS chunks that keep the
    window full, then waits/computes its own CPS chunks. Slot reuse distance
    is DEPTH > 2*CPS, so a newly issued DMA never lands in a slot that is
    still in flight. Zero-length (padding) chunks issue no DMA and write
    +inf lanes, so only real chunks consume bandwidth."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    nch = nsteps * CPS

    def dma(slot, t):
        return pltpu.make_async_copy(tiles_hbm.at[t], scratch.at[slot],
                                     sems.at[slot])

    def start_for(gg):
        # gg = global chunk index (b * nch + c).
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

    lut = luts_ref[0]                                      # [24, 256]
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
        g = g0 + i
        tl = tl_smem[b, c]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH), tl // TL_PACK).wait()
            idx = scratch[jax.lax.rem(g, DEPTH)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)
            # Raw sums stored; the caller masks tail lanes (>= ln) outside
            # the kernel, where the mask fuses into the bias-add pass.
            out_ref[0, i, :] = jnp.sum(gg, axis=0)         # [256]
        # ln == 0 (padding slot): no store — the caller masks those chunks
        # to +inf outside the kernel, so the garbage rows are never read.


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_tiles(luts_ext, chunk_tile, chunk_len, chunk_bias, tiles,
                   interpret: bool = False):
    """Run the fused scan. Returns dists [B, nch*CHUNK] f32 (masked +inf).

    luts_ext [B, 24, 256] f32; chunk_* [B, nch]; tiles [NT, 24, 256] u8.
    The per-chunk term1 bias is added outside the kernel (broadcast add is
    free in XLA and keeps SMEM usage to one packed i32 array — SMEM is 1 MB).
    """
    B, nch = chunk_tile.shape
    if nch % CPS:
        pad = CPS - nch % CPS
        chunk_tile = jnp.pad(chunk_tile, ((0, 0), (0, pad)))
        chunk_len = jnp.pad(chunk_len, ((0, 0), (0, pad)))
        chunk_bias = jnp.pad(chunk_bias, ((0, 0), (0, pad)))
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
        # One [1, CPS, CHUNK] block per grid step: CPS=8 sublanes x 256
        # lanes meets the (8,128) tile rule, and each chunk's result is a
        # STATIC row write (dynamic lane-offset stores into one big
        # revisited block cost a lane rotation per chunk).
        out_specs=pl.BlockSpec((1, CPS, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        _adc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nch, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tl, luts_ext, tiles)
    # Lane-level tail mask + padding-slot mask, fused with the bias add (one
    # elementwise pass either way; garbage in unwritten/tail lanes can be
    # NaN, so a plain +inf bias add would not be enough). Masking out here
    # lets the kernel store raw sums with no per-chunk iota/select.
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out + chunk_bias[:, :, None], jnp.inf)
    return out.reshape(B, nch * CHUNK)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def adc_search_tiles(luts_ext, chunk_tile, chunk_len, chunk_bias, tiles,
                     ids_aligned, k: int, interpret: bool = False):
    """Full scan + top-k + id resolution.

    Returns (dists [B, k], labels [B, k] int32)."""
    dists = adc_scan_tiles(luts_ext, chunk_tile, chunk_len, chunk_bias,
                           tiles, interpret=interpret)
    # Binned top-k: flat lax.top_k is sort-bound LINEAR in width (robustly
    # re-measured round 3 with distinct buffers + scalar-pull sync,
    # tools/topk_probe.py: at k=10 flat/bin32 = 1.45/1.07 us/q at 20k
    # lanes, 2.05/0.88 at 54k, 9.37/3.52 at 170k; k=100: 59/12 at 170k).
    # bin_size=32 won or tied at every production width; binned_topk
    # falls back to flat when k > n/32.
    best, sel = binned_topk_smallest(dists, k, bin_size=32)
    chunk_of = sel // CHUNK
    within = sel % CHUNK
    tile_sel = jnp.take_along_axis(chunk_tile, chunk_of, axis=1)
    flat_pos = tile_sel * CHUNK + within
    labels = ids_aligned[flat_pos]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    return best, labels


def _adc_kernel_quad(qtl_smem,  # scalar prefetch: qtile*RTL_PACK + len
                     luts_ref, qtiles_hbm, out_ref, scratch, sems):
    """Quad-tile scan step: same DEPTH_Q-slot rolling DMA pipeline as
    :func:`_adc_kernel`, but each slot moves one [72, 256] quad tile
    (4 chunks / 1024 codes) and each compute emits FOUR chunk rows via an
    18-group sublane-strided sum (rows 4m+c + norm rows 64+c + zero pads)."""
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

    # Batched waits: all CPSQ semaphores cleared before any compute, so the
    # vector pipeline streams through 8 chunk rows without scalar stalls.
    for i in range(CPSQ):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ + i]

        @pl.when(jax.lax.rem(tl, RTL_PACK) > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH_Q), tl // RTL_PACK).wait()

    lut = luts_ref[0]                                      # [72, 256]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    for i in range(CPSQ):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ + i]
        ln = jax.lax.rem(tl, RTL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[jax.lax.rem(g, DEPTH_Q)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)                   # [72, 256]
            # Rows 4m+c: summing the 18 4-row sublane groups yields all four
            # chunk rows at once (chunk c = sum over m of row 4m+c + norm
            # row 64+c; pad rows gather lut zeros).
            out_ref[0, i * 4:(i + 1) * 4, :] = jnp.sum(
                gg.reshape(18, 4, 256), axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_quad(luts_quad, qtile, qlen, qbias, qtiles,
                  interpret: bool = False):
    """Quad-tile scan. Returns dists [B, nquad*RCHUNK] f32 (masked +inf).

    luts_quad [B, 72, 256] f32 (see build_luts_quad); qtile/qlen/qbias
    [B, nquad] (see quad_metadata); qtiles [NQT, 72, 256] u8."""
    B, nquad = qtile.shape
    if nquad % CPSQ:
        pad = CPSQ - nquad % CPSQ
        qtile = jnp.pad(qtile, ((0, 0), (0, pad)))
        qlen = jnp.pad(qlen, ((0, 0), (0, pad)))
        qbias = jnp.pad(qbias, ((0, 0), (0, pad)))
        nquad += pad
    qtl = qtile * RTL_PACK + qlen
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nquad // CPSQ),
        in_specs=[
            pl.BlockSpec((1, QROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, CPSQ * 4, CHUNK),
                               lambda b, j, *_: (b, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH_Q, QROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH_Q,)),
        ],
    )
    out = pl.pallas_call(
        _adc_kernel_quad,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nquad * 4, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qtl, luts_quad, qtiles)
    # Expand quad metadata to chunk granularity for the fused mask+bias pass
    # (see adc_scan_tiles for why masking lives outside the kernel).
    rr = jnp.arange(4, dtype=jnp.int32)
    chunk_len = jnp.clip(qlen[:, :, None] - rr[None, None, :] * CHUNK,
                         0, CHUNK).reshape(B, nquad * 4)
    chunk_bias = jnp.broadcast_to(qbias[:, :, None],
                                  (B, nquad, 4)).reshape(B, nquad * 4)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    out = jnp.where(lane[None, None, :] < chunk_len[:, :, None],
                    out + chunk_bias[:, :, None], jnp.inf)
    return out.reshape(B, nquad * 4 * CHUNK)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def adc_search_quad(luts_ext, qtile, qlen, qbias, qtiles, ids_aligned,
                    k: int, interpret: bool = False):
    """Quad scan + top-k + id resolution. Returns (dists, labels) [B, k]."""
    luts_quad = build_luts_quad(luts_ext)
    dists = adc_scan_quad(luts_quad, qtile, qlen, qbias, qtiles,
                          interpret=interpret)
    # bin32 top-k — see the adc_search_tiles note for the measurements.
    best, sel = binned_topk_smallest(dists, k, bin_size=32)
    quad_of = sel // RCHUNK
    within = sel % RCHUNK
    qtile_sel = jnp.take_along_axis(qtile, quad_of, axis=1)
    labels = ids_aligned[qtile_sel * RCHUNK + within]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    return best, labels


# ---------------------------------------------------------------------------
# Two-phase (min-reduce) top-k engine
#
# The wide engines above store EVERY scanned lane ([B, nch*CHUNK] f32), then
# mask+bias+top-k outside the kernel. At canonical geometry (scale2: ~320
# quad slots/query) that is ~1.3 MB of f32 per query stored, re-read, and
# pushed through a 327k-lane lax.top_k — it dominates end-to-end latency.
#
# Phase 1 here reduces each scan unit (chunk or quad) to its masked MINIMUM
# inside the kernel (the term1+norm bias is constant within a unit, so
# min(bias + x) = bias + min(x) and the bias still applies outside on the
# [B, n_units] minima). Phase 2 selects the k smallest-minimum units and
# rescans ONLY those k units' full lanes with the wide kernel, then top-ks
# k*unit lanes.
#
# Exactness: let S be the set of units containing at least one of the true
# top-k lanes (|S| <= k). If some u in S were NOT among the k units with
# smallest minima, then k units would each hold a lane strictly smaller
# than min(u) <= (u's top-k lane) — i.e. that lane has >= k strictly
# smaller lanes, contradicting its top-k membership. Equal-distance ties at
# the k-th boundary may swap labels, matching the wide engine's existing
# tie semantics. Selection over per-UNIT minima returns k DISTINCT units,
# so phase 2 never double-counts a lane.
# ---------------------------------------------------------------------------

SPB_C = 128             # chunk-min kernel: grid steps per out tile
                        # ([CPS, 128] = CPS*128 chunk minima per tile)
SPB_Q = 1024 // CPSQ    # quad-min kernel: grid steps per [8, 128] out tile
                        # (CPSQ quad minima per step, 1024 per tile)


def _adc_kernel_min(tl_smem, luts_ref, tiles_hbm, out_ref, rows, acc,
                    scratch, sems):
    """Chunk-layout phase-1 kernel: same DEPTH-slot DMA pipeline as
    :func:`_adc_kernel`, but each step reduces its CPS chunks to CPS masked
    minima and stores CPS lanes (vs CPS*CHUNK) — output traffic drops 256x
    and the downstream top-k runs over n_units instead of n_units*256."""
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

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    for i in range(CPS):
        c = j * CPS + i
        g = g0 + i
        tl = tl_smem[b, c]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(jax.lax.rem(g, DEPTH), tl // TL_PACK).wait()
            idx = scratch[jax.lax.rem(g, DEPTH)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)
            s = jnp.sum(gg, axis=0, keepdims=True)             # [1, 256]
            rows[i:i + 1, :] = jnp.where(lane < ln, s, jnp.inf)

        @pl.when(ln == 0)
        def _():
            rows[i:i + 1, :] = jnp.full((1, CHUNK), jnp.inf)

    minima = jnp.min(rows[:, :], axis=1)                       # [CPS]
    # Accumulate into the [8, 128] minima tile at (sublane=i, lane=j%128):
    # Mosaic rejects dynamic-lane-offset stores, so the placement is a
    # static masked select + running minimum; the revisited out block stays
    # in VMEM for its whole 128-step window and is written back once.
    @pl.when(jax.lax.rem(j, SPB_C) == 0)
    def _():
        acc[:, :] = jnp.full((CPS, 128), jnp.inf)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (CPS, 128), 1)
    tile_j = jnp.where(lane_ids == jax.lax.rem(j, SPB_C),
                       minima[:, None], jnp.inf)
    acc[:, :] = jnp.minimum(acc[:, :], tile_j)

    # Flush once per window (or at the grid tail) — a per-step 4 KB store
    # would cost more than the wide engine's output it replaces.
    @pl.when(jnp.logical_or(jax.lax.rem(j, SPB_C) == SPB_C - 1,
                            j == nsteps - 1))
    def _():
        out_ref[0, 0] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_tiles_min(luts_ext, chunk_tile, chunk_len, tiles,
                       interpret: bool = False):
    """Phase-1 chunk scan: per-chunk masked minima [B, nch] (raw — caller
    adds chunk_bias and masks padding slots)."""
    B, nch = chunk_tile.shape
    # Schedule pads only to CPS (SMEM is 1 MB; padding to whole out tiles
    # would 18x the prefetched schedule at small nch). The FINAL out tile
    # may cover fewer than SPB_C steps — its untouched lanes stay at the
    # +inf the window reset wrote.
    if nch % CPS:
        pad = CPS - nch % CPS
        chunk_tile = jnp.pad(chunk_tile, ((0, 0), (0, pad)))
        chunk_len = jnp.pad(chunk_len, ((0, 0), (0, pad)))
    nch_p = chunk_tile.shape[1]
    nblk = -(-(nch_p // CPS) // SPB_C)
    tl = chunk_tile * TL_PACK + chunk_len
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nch_p // CPS),
        in_specs=[
            pl.BlockSpec((1, LUT_ROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, CPS, 128),
                               lambda b, j, *_: (b, j // SPB_C, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CPS, CHUNK), jnp.float32),
            pltpu.VMEM((CPS, 128), jnp.float32),
            pltpu.VMEM((DEPTH, LUT_ROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        _adc_kernel_min,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nblk, CPS, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tl, luts_ext, tiles)
    # chunk c sits at (block c//1024, sublane c%8, lane (c//8)%128):
    # invert with a transpose.
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(B, nblk * SPB_C * CPS)
    return out[:, :nch]


def _adc_kernel_quad_min(qtl_smem, luts_ref, qtiles_hbm, out_ref, rows,
                         acc, scratch, sems):
    """Quad-layout phase-1 kernel: per-QUAD masked minima (CPSQ lanes per
    step instead of CPSQ*4*256)."""
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

    lut = luts_ref[0]
    lut0, lut1 = lut[:, :128], lut[:, 128:]

    def half(idx_h):
        idxm = jnp.where(idx_h < 128, idx_h, idx_h - 128)
        ga = jnp.take_along_axis(lut0, idxm, axis=1,
                                 mode="promise_in_bounds")
        gb = jnp.take_along_axis(lut1, idxm, axis=1,
                                 mode="promise_in_bounds")
        return jnp.where(idx_h < 128, ga, gb)

    # Code position of chunk-row r, lane l within the quad is r*256 + l.
    pos = (jax.lax.broadcasted_iota(jnp.int32, (4, CHUNK), 0) * CHUNK
           + jax.lax.broadcasted_iota(jnp.int32, (4, CHUNK), 1))
    for i in range(CPSQ):
        g = g0 + i
        tl = qtl_smem[b, j * CPSQ + i]
        ln = jax.lax.rem(tl, RTL_PACK)

        @pl.when(ln > 0)
        def _():
            idx = scratch[jax.lax.rem(g, DEPTH_Q)].astype(jnp.int32)
            gg = jnp.concatenate([half(idx[:, :128]), half(idx[:, 128:])],
                                 axis=1)                       # [72, 256]
            sums4 = jnp.sum(gg.reshape(18, 4, 256), axis=0)    # [4, 256]
            rows[i * 4:(i + 1) * 4, :] = jnp.where(pos < ln, sums4, jnp.inf)

        @pl.when(ln == 0)
        def _():
            rows[i * 4:(i + 1) * 4, :] = jnp.full((4, CHUNK), jnp.inf)

    minima = jnp.min(rows[:, :], axis=1)                       # [CPSQ*4]
    qmin = jnp.min(minima.reshape(CPSQ, 4), axis=1)            # [CPSQ]
    # Place quad q = j*CPSQ + i at (sublane q%8, lane (q//8)%128) of the
    # [8, 128] minima tile (1024 quads per out tile). This step's CPSQ
    # quads occupy sublanes s0..s0+CPSQ-1 (s0 = (j*CPSQ)%8; CPSQ <= 8
    # divides 8, so a step never straddles lanes) at lane (j*CPSQ//8)%128
    # — static masked selects, no dynamic stores.
    @pl.when(jax.lax.rem(j, SPB_Q) == 0)
    def _():
        acc[:, :] = jnp.full((8, 128), jnp.inf)
    s0 = jax.lax.rem(j * CPSQ, 8)
    ln_q = jax.lax.rem((j * CPSQ) // 8, 128)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    col = jnp.full((8, 128), jnp.inf)
    for t in range(CPSQ):
        col = jnp.where(sub_ids == s0 + t, qmin[t], col)
    tile_j = jnp.where(lane_ids == ln_q, col, jnp.inf)
    acc[:, :] = jnp.minimum(acc[:, :], tile_j)

    @pl.when(jnp.logical_or(jax.lax.rem(j, SPB_Q) == SPB_Q - 1,
                            j == nsteps - 1))
    def _():
        out_ref[0, 0] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_quad_min(luts_quad, qtile, qlen, qtiles,
                      interpret: bool = False):
    """Phase-1 quad scan: per-quad masked minima [B, nquad] (raw)."""
    B, nquad = qtile.shape
    if nquad % CPSQ:
        pad = CPSQ - nquad % CPSQ
        qtile = jnp.pad(qtile, ((0, 0), (0, pad)))
        qlen = jnp.pad(qlen, ((0, 0), (0, pad)))
    nq_p = qtile.shape[1]
    nblk = -(-(nq_p // CPSQ) // SPB_Q)
    qtl = qtile * RTL_PACK + qlen
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq_p // CPSQ),
        in_specs=[
            pl.BlockSpec((1, QROWS, 256), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128),
                               lambda b, j, *_: (b, j // SPB_Q, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CPSQ * 4, CHUNK), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((DEPTH_Q, QROWS, CHUNK), jnp.uint8),
            pltpu.SemaphoreType.DMA((DEPTH_Q,)),
        ],
    )
    out = pl.pallas_call(
        _adc_kernel_quad_min,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nblk, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qtl, luts_quad, qtiles)
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(B, nblk * SPB_Q * CPSQ)
    return out[:, :nquad]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def adc_search_tiles_2p(luts_ext, chunk_tile, chunk_len, chunk_bias, tiles,
                        ids_aligned, k: int, interpret: bool = False):
    """Two-phase chunk search: minima -> top-k chunks -> rescan k chunks."""
    B, nch = chunk_tile.shape
    mins = adc_scan_tiles_min(luts_ext, chunk_tile, chunk_len, tiles,
                              interpret=interpret)
    biased = jnp.where(chunk_len > 0, mins + chunk_bias, jnp.inf)
    ksel = min(k, nch)
    _, csel = topk_smallest(biased, ksel)                      # [B, ksel]
    st = jnp.take_along_axis(chunk_tile, csel, axis=1)
    sl = jnp.take_along_axis(chunk_len, csel, axis=1)
    sb = jnp.take_along_axis(chunk_bias, csel, axis=1)
    dists = adc_scan_tiles(luts_ext, st, sl, sb, tiles,
                           interpret=interpret)                # [B, ksel*256]
    best, sel2 = topk_smallest(dists, k)
    tile_sel = jnp.take_along_axis(st, sel2 // CHUNK, axis=1)
    labels = ids_aligned[tile_sel * CHUNK + sel2 % CHUNK]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    return best, labels


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def adc_search_quad_2p(luts_ext, qtile, qlen, qbias, qtiles, ids_aligned,
                       k: int, interpret: bool = False):
    """Two-phase quad search: per-quad minima -> top-k quads -> rescan."""
    B, nquad = qtile.shape
    luts_quad = build_luts_quad(luts_ext)
    mins = adc_scan_quad_min(luts_quad, qtile, qlen, qtiles,
                             interpret=interpret)
    biased = jnp.where(qlen > 0, mins + qbias, jnp.inf)
    ksel = min(k, nquad)
    _, qsel = topk_smallest(biased, ksel)
    st = jnp.take_along_axis(qtile, qsel, axis=1)
    sl = jnp.take_along_axis(qlen, qsel, axis=1)
    sb = jnp.take_along_axis(qbias, qsel, axis=1)
    dists = adc_scan_quad(luts_quad, st, sl, sb, qtiles,
                          interpret=interpret)                 # [B, ksel*1024]
    best, sel2 = topk_smallest(dists, k)
    qtile_sel = jnp.take_along_axis(st, sel2 // RCHUNK, axis=1)
    labels = ids_aligned[qtile_sel * RCHUNK + sel2 % RCHUNK]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    return best, labels


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "nch", "coarse_block", "use_opq",
                     "interpret", "precision", "coarse_approx",
                     "coarse_recall", "layout", "two_phase", "routed_w"))
def pallas_search_many(queries, centroids, centroid_norms, codebooks,
                       norm_centroids, R, tiles, ids_aligned, tile_offsets,
                       list_sizes, max_codes, *, nprobe: int, k: int,
                       nch: int, coarse_block: int, use_opq: bool,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST,
                       coarse_approx: bool = False,
                       coarse_recall: float = 0.95,
                       layout: str = "chunk",
                       two_phase: bool = False,
                       routed=None, routed_w: int = 0):
    """Whole-query-set search in ONE launch: queries [G, B, d] are processed
    by lax.map over G sub-batches of the fused core. Remote-tunnel dispatch
    costs ~ms per launch, so one mega-launch at 8k+ queries is worth
    ~2x end-to-end QPS over per-sub-batch launches."""
    def one(q):
        return pallas_search_core(
            q, centroids, centroid_norms, codebooks, norm_centroids, R,
            tiles, ids_aligned, tile_offsets, list_sizes, max_codes,
            nprobe=nprobe, k=k, nch=nch, coarse_block=coarse_block,
            use_opq=use_opq, interpret=interpret, precision=precision,
            coarse_approx=coarse_approx, coarse_recall=coarse_recall,
            layout=layout, two_phase=two_phase,
            routed=routed, routed_w=routed_w)

    return jax.lax.map(one, queries)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "nch", "coarse_block", "use_opq",
                     "interpret", "precision", "coarse_approx",
                     "coarse_recall", "layout", "two_phase", "routed_w"))
def pallas_search_core(queries, centroids, centroid_norms, codebooks,
                       norm_centroids, R, tiles, ids_aligned, tile_offsets,
                       list_sizes, max_codes, *, nprobe: int, k: int,
                       nch: int, coarse_block: int, use_opq: bool,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST,
                       coarse_approx: bool = False,
                       coarse_recall: float = 0.95,
                       layout: str = "chunk",
                       two_phase: bool = False,
                       routed=None, routed_w: int = 0):
    """End-to-end IVFADC search step on the Pallas engine, fused into ONE
    XLA program (per-op dispatch through the remote-TPU tunnel costs ~ms, so
    the whole coarse -> LUT -> schedule -> scan -> top-k chain must be a
    single launch).

    layout selects the HBM tile format (must match the ``tiles`` /
    ``tile_offsets`` arrays): "chunk" = [NT, 24, 256] per-chunk tiles,
    "quad" = [NQT, 72, 256] quad tiles (nch counts RCHUNK slots).

    routed = (supers, super_sqn, block_table) + routed_w > 0 selects the
    two-level ROUTED coarse path (ops.routed_coarse): probe selection and
    all schedule metadata come from w gathered super blocks — no full-nc
    reduction and no per-probe pack gather at all."""
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    gran = RCHUNK if layout == "quad" else CHUNK
    # Coarse selection: plain streaming approx_min_k, or the routed
    # two-level path when a routing structure is supplied. Two further
    # measured alternatives LOST end-to-end at nc=2^17/B=1024/nprobe=128
    # and were deleted (round 3; see git history for the implementations):
    #   - coarse_select_rerank (bf16 cut + exact rerank): approx_min_k's
    #     REDUCTION, not matmul precision, is the 28 us/q cost (HIGHEST
    #     29.8 vs default-precision 28.4), and the [B, P, d] centroid
    #     gather adds ~28 us/q (TPU gathers cost ~220 ns/row regardless
    #     of width).
    #   - ext_table fusion (one [nc, d+3] gather serving rerank +
    #     schedule): a 131-lane row gather is SLOWER than the schedule
    #     builder's existing 8-lane pack gather; end-to-end 109 vs
    #     102 us/q.
    if routed is not None and routed_w > 0:
        from ivfhnsw_tpu.ops.routed_coarse import routed_select_ext
        qc_dists, probes, term1, sz_f, toff_f = routed_select_ext(
            queries, *routed, nprobe=nprobe, w=routed_w)
        st, sl, sb = _probe_schedule_fields(sz_f, toff_f, term1,
                                            max_codes, nch, gran)
    else:
        # coarse_approx is a tri-state static: False = exact lax.top_k,
        # True = approx_min_k, "binned" = the EXACT 3-pass bin-min
        # reduction (ops.topk.binned_topk_smallest) whose wide pass is
        # bandwidth-bound instead of sort-bound.
        qc_dists, probes = streaming_topk_l2(
            queries, centroids, nprobe, block=coarse_block,
            point_sqnorms=centroid_norms, precision=precision,
            approx=coarse_approx is True, recall_target=coarse_recall,
            exact_reduce="binned" if coarse_approx == "binned" else "topk")
        st, sl, sb = _probe_schedule(probes, qc_dists, centroid_norms,
                                     tile_offsets, list_sizes, max_codes,
                                     nch, gran)
    q_rot = queries @ R.T if use_opq else queries
    luts_ext = build_luts_ext(q_rot, codebooks, norm_centroids,
                              precision=precision)
    if layout == "quad":
        if two_phase:
            return adc_search_quad_2p(luts_ext, st, sl, sb, tiles,
                                      ids_aligned, k, interpret=interpret)
        return adc_search_quad(luts_ext, st, sl, sb, tiles, ids_aligned, k,
                               interpret=interpret)
    if two_phase:
        return adc_search_tiles_2p(luts_ext, st, sl, sb, tiles, ids_aligned,
                                   k, interpret=interpret)
    return adc_search_tiles(luts_ext, st, sl, sb, tiles, ids_aligned, k,
                            interpret=interpret)
