"""Query-blocked shared-scan ADC engine (the MXU path).

The per-query scan kernel (adc_scan.py) is bound by per-chunk fixed costs
(~0.2-0.3 us per 256-code chunk per query). This engine amortizes the chunk
work across a *block* of QB queries:

1. Queries are sorted by their nearest coarse centroid, so consecutive
   queries probe nearly identical lists, and grouped into blocks of QB.
2. Each block scans the deduplicated UNION of its members' probed lists.
   Per (query, list) masks preserve the reference's exact per-query
   semantics — a query's distance set is exactly its own included probes
   (IndexIVF_HNSW.cpp:268-293); union rows it didn't probe are masked +inf.
3. Per chunk, codes are decoded via tpu.dynamic_gather into a
   [136, 256] f32 matrix (128 decode rows = codebook dims, row 128 = norm
   decode, rest zero) and ONE MXU matmul against the block's query matrix
   [QB, 136] (queries pre-scaled by -2, with a 1.0 column picking up the
   norm row) produces all QB queries' partial distances at once:

       dist[q, l] = bias[q, list] + (-2 q_rot | 1) . (decoded_l | norm_l)

So decode-gather cost is paid once per chunk instead of once per
(query, chunk), and the heavy lifting rides the MXU.

Capacity knobs (static): U = union-list capacity per block, nch = chunk
capacity per block. Overflow (a block whose union exceeds U, or whose
chunks exceed nch) drops lists in *arbitrary* order — the union is built
from an id-sort, so the lists with the highest centroid IDS are dropped,
NOT the farthest ones. Size U/nch so overflow never fires (it is counted
per block in the returned stats; raise U when it does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ivfhnsw_tpu.ops.topk import topk_smallest

CHUNK = 256
TL_PACK = 512
DEC_ROWS = 136   # 128 codebook-dim rows + norm row (128) + 7 pad
NORM_DEC_ROW = 128
DEPTH = 4
GROUP_CHUNKS = 16  # chunks per revisited out block (flush every 16 steps —
                   # per-step out-block flushing is the prime suspect in the
                   # at-scale device wedge; this matches the proven
                   # adc_scan revisit pattern with a bounded VMEM block)


def decode_tables(codebooks, norm_centroids):
    """[M, ksub, dsub] codebooks -> [DEC_ROWS, 256] decode tables.

    Row r = j*M + m holds codebook[m, :, j] (indexed by code value along
    lanes) — this layout matches ``pltpu.repeat``'s TILING semantics in the
    kernel (idx row r = codes row r % M). Row NORM_DEC_ROW holds the norm-PQ
    decode table. Requires M * dsub == 128 and ksub <= 256."""
    M, ksub, dsub = codebooks.shape
    if M * dsub != 128:
        raise ValueError("batch engine requires d_rot == 128 decode rows")
    t = jnp.zeros((DEC_ROWS, 256), jnp.float32)
    rows = jnp.transpose(codebooks, (2, 0, 1)).reshape(dsub * M, ksub)
    t = t.at[:M * dsub, :ksub].set(rows)
    t = t.at[NORM_DEC_ROW, :norm_centroids.shape[0]].set(norm_centroids)
    return t


def query_row_perm(M: int, dsub: int) -> np.ndarray:
    """Permutation p with p[r] = original query dim feeding decode row r
    (row r = j*M + m corresponds to dim m*dsub + j)."""
    r = np.arange(M * dsub)
    m, j = r % M, r // M
    return (m * dsub + j).astype(np.int32)


def _make_batch_kernel(dsub: int):
    """Kernel factory: dsub = 128 // M is the decode-row repeat factor."""

    def _batch_kernel(tl_smem, q_ref, tab_ref, tiles_hbm, out_ref, scratch,
                      dec_scratch, sems):
        blk = pl.program_id(0)
        j = pl.program_id(1)
        nblk = pl.num_programs(0)
        nch = pl.num_programs(1)

        def dma(slot, t):
            return pltpu.make_async_copy(tiles_hbm.at[t], scratch.at[slot],
                                         sems.at[slot])

        g = blk * nch + j
        slot = jax.lax.rem(g, DEPTH)

        def start_for(gg):
            bb = gg // nch
            jj = jax.lax.rem(gg, nch)
            tl = tl_smem[bb, jj]

            @pl.when(jax.lax.rem(tl, TL_PACK) > 0)
            def _():
                dma(jax.lax.rem(gg, DEPTH), tl // TL_PACK).start()

        @pl.when(g == 0)
        def _():
            for w in range(DEPTH - 1):
                @pl.when(w < nblk * nch)
                def _():
                    start_for(jnp.int32(w))

        @pl.when(g + DEPTH - 1 < nblk * nch)
        def _():
            start_for(g + DEPTH - 1)

        tl = tl_smem[blk, j]
        ln = jax.lax.rem(tl, TL_PACK)

        @pl.when(ln > 0)
        def _():
            dma(slot, tl // TL_PACK).wait()
            tile = scratch[slot]                               # [24, 256] u8
            codes = tile[:16].astype(jnp.int32)                # [16, 256]
            # pltpu.repeat TILES its input ([c0..cM, c0..cM, ...]), so decode
            # row r = j*M + m picks code row r % M — matching decode_tables.
            idx = pltpu.repeat(codes[:128 // dsub], dsub, axis=0)  # [128, 256]
            nidx = pltpu.repeat(tile[16:17].astype(jnp.int32), 8, axis=0)
            idx_all = jnp.concatenate([idx, nidx], axis=0)     # [136, 256]
            tab = tab_ref[:]                                   # [136, 256]
            t0, t1 = tab[:, :128], tab[:, 128:]

            def half(idx_h):
                im = jnp.where(idx_h < 128, idx_h, idx_h - 128)
                g0 = jnp.take_along_axis(t0, im, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(t1, im, axis=1,
                                         mode="promise_in_bounds")
                return jnp.where(idx_h < 128, g0, g1)

            dec = jnp.concatenate([half(idx_all[:, :128]), half(idx_all[:, 128:])],
                                  axis=1)                      # [136, 256]
            dec_scratch[:] = dec
            q = q_ref[0]                                       # [QB, 136]
            partial = jnp.dot(q, dec_scratch[:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            lane = jax.lax.broadcasted_iota(jnp.int32, partial.shape, 1)
            jg = jax.lax.rem(j, GROUP_CHUNKS)
            out_ref[0, :, pl.ds(jg * CHUNK, CHUNK)] = jnp.where(
                lane < ln, partial, jnp.inf)

        @pl.when(ln == 0)
        def _():
            jg = jax.lax.rem(j, GROUP_CHUNKS)
            out_ref[0, :, pl.ds(jg * CHUNK, CHUNK)] = jnp.full(
                (out_ref.shape[1], CHUNK), jnp.inf, jnp.float32)

    return _batch_kernel


@functools.partial(jax.jit, static_argnames=("dsub", "interpret"))
def batch_scan(q_ext, chunk_tl, tables, tiles, dsub: int = 8,
               interpret: bool = False):
    """q_ext [NBLK, QB, DEC_ROWS]; chunk_tl [NBLK, nch] packed tile/len;
    tables [DEC_ROWS, 256]; tiles [NT, 24, 256] u8.
    Returns partial dists [NBLK, QB, nch, CHUNK] (no bias, +inf masked)."""
    NBLK, QB, _ = q_ext.shape
    _, nch = chunk_tl.shape
    if nch % GROUP_CHUNKS != 0:
        raise ValueError(f"nch={nch} must be a multiple of {GROUP_CHUNKS}")
    ngroups = nch // GROUP_CHUNKS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NBLK, nch),
        in_specs=[
            pl.BlockSpec((1, QB, DEC_ROWS), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tables, whole
            pl.BlockSpec(memory_space=pl.ANY),      # tiles in HBM
        ],
        # Revisited block spanning GROUP_CHUNKS chunks: flushed only when
        # the group index advances.
        out_specs=pl.BlockSpec(
            (1, QB, GROUP_CHUNKS * CHUNK),
            lambda b, j, *_: (b * (nch // GROUP_CHUNKS) + j // GROUP_CHUNKS,
                              0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 24, CHUNK), jnp.uint8),
            pltpu.VMEM((DEC_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        _make_batch_kernel(dsub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (NBLK * ngroups, QB, GROUP_CHUNKS * CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(chunk_tl, q_ext, tables, tiles)
    out = out.reshape(NBLK, ngroups, QB, GROUP_CHUNKS * CHUNK)
    return jnp.moveaxis(out, 2, 1).reshape(NBLK, QB, nch, CHUNK)


@functools.partial(jax.jit, static_argnames=("U", "nch"))
def block_metadata(probes, qc_dists, centroid_norms, tile_offsets,
                   list_sizes, max_codes, U: int, nch: int):
    """Per-block union schedule + per-query masks/biases.

    probes/qc_dists [NBLK, QB, P] (already grouped into blocks).
    Returns (chunk_tl [NBLK, nch] i32,
             bias [NBLK, QB, nch] f32 (+inf where masked),
             chunk_tile [NBLK, nch] i32,
             overflow [NBLK] i32 — dropped union lists per block).
    """
    NBLK, QB, P = probes.shape

    sizes_q = list_sizes[probes].astype(jnp.int32)          # [NBLK, QB, P]
    cum_before = jnp.concatenate(
        [jnp.zeros((NBLK, QB, 1), jnp.int32),
         jnp.cumsum(sizes_q, axis=2)[:, :, :-1]], axis=2)
    included = jnp.logical_or(max_codes <= 0, cum_before < max_codes)
    term1 = qc_dists - centroid_norms[probes]               # [NBLK, QB, P]

    # Union of probed lists per block (sorted ids, first-occurrence dedup).
    flat = probes.reshape(NBLK, QB * P)
    s = jnp.sort(flat, axis=1)
    first = jnp.concatenate(
        [jnp.ones((NBLK, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    rank = jnp.cumsum(first, axis=1) - 1                    # [NBLK, QB*P]
    n_unique = rank[:, -1] + 1
    overflow = jnp.maximum(n_unique - U, 0)
    rank_c = jnp.minimum(rank, U - 1)
    union = jnp.full((NBLK, U), -1, jnp.int32)
    w_idx = jnp.where(first & (rank < U), rank_c, U)        # U -> dropped
    union = jax.vmap(lambda u, i, v: u.at[i].set(v, mode="drop"))(
        union, w_idx, s)
    u_valid = union >= 0
    union_c = jnp.maximum(union, 0)

    # Per (q, u): does query q scan union list u (probed AND included)?
    eq = probes[:, :, :, None] == union_c[:, None, None, :]  # [NBLK,QB,P,U]
    eq = eq & u_valid[:, None, None, :]
    scan_qu = jnp.any(eq & included[:, :, :, None], axis=2)  # [NBLK, QB, U]
    term1_u = jnp.sum(jnp.where(eq, term1[:, :, :, None], 0.0), axis=2)

    # Chunk schedule over union lists.
    su = jnp.where(u_valid, list_sizes[union_c].astype(jnp.int32), 0)
    tcnt = (su + CHUNK - 1) // CHUNK                        # [NBLK, U]
    bounds = jnp.cumsum(tcnt, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((NBLK, 1), jnp.int32), bounds[:, :-1]], axis=1)
    j = jnp.arange(nch, dtype=jnp.int32)
    seg = jnp.sum((bounds[:, None, :] <= j[None, :, None]).astype(jnp.int32),
                  axis=2)                                   # [NBLK, nch]
    seg_c = jnp.minimum(seg, U - 1)
    within = j[None, :] - jnp.take_along_axis(starts, seg_c, axis=1)
    u_list = jnp.take_along_axis(union_c, seg_c, axis=1)
    tile = tile_offsets[u_list].astype(jnp.int32) + within
    ln = jnp.clip(jnp.take_along_axis(su, seg_c, axis=1) - within * CHUNK,
                  0, CHUNK)
    cvalid = j[None, :] < bounds[:, -1:]
    ln = jnp.where(cvalid, ln, 0)
    tile = jnp.where(cvalid, tile, 0)
    chunk_tl = tile * TL_PACK + ln

    # Per-query per-chunk bias: term1 if scanned, else +inf.
    scan_qc = jnp.take_along_axis(
        scan_qu, seg_c[:, None, :].repeat(QB, 1), axis=2)   # [NBLK, QB, nch]
    bias_qc = jnp.take_along_axis(
        term1_u, seg_c[:, None, :].repeat(QB, 1), axis=2)
    bias = jnp.where(scan_qc & cvalid[:, None, :], bias_qc, jnp.inf)
    return chunk_tl, bias, tile, overflow


def spatial_rank(centroids, n_super: int | None = None, seed: int = 0):
    """Spatial ordering of centroid ids: centroid ids are arbitrary, so
    sorting queries by raw top-1 id would NOT cluster them. Rank centroids
    by (super-cluster id, first-PC projection) so nearby centroids get
    nearby ranks. One-time per index; returns rank [nc] int32 (numpy)."""
    import jax as _jax
    from ivfhnsw_tpu.ops.kmeans import kmeans

    cents = np.asarray(centroids)
    nc = cents.shape[0]
    n_super = n_super or max(1, nc // 64)
    if n_super > 1:
        sup, _ = kmeans(_jax.random.PRNGKey(seed), cents,
                        min(n_super, nc // 2), niter=10)
        from ivfhnsw_tpu.ops.distances import assign_top1
        _, sid = assign_top1(jnp.asarray(cents), sup)
        sid = np.asarray(sid)
    else:
        sid = np.zeros(nc, np.int64)
    mean = cents.mean(0)
    u, s, vt = np.linalg.svd(cents[:: max(1, nc // 2048)] - mean,
                             full_matrices=False)
    proj = (cents - mean) @ vt[0]
    order = np.lexsort((proj, sid))
    rank = np.empty(nc, np.int32)
    rank[order] = np.arange(nc, dtype=np.int32)
    return rank


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "QB", "U", "nch", "coarse_block",
                     "use_opq", "interpret", "precision"))
def batch_search_core(queries, centroids, centroid_norms, codebooks,
                      norm_centroids, R, tiles, ids_aligned, tile_offsets,
                      list_sizes, c_rank, max_codes, *, nprobe: int, k: int,
                      QB: int, U: int, nch: int, coarse_block: int,
                      use_opq: bool, interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST):
    """Full shared-scan search: sort -> block -> union scan -> top-k.

    queries [B, d] with B % QB == 0; c_rank [nc] spatial centroid rank.
    Returns (dists [B, k], labels [B, k], overflow [B // QB])."""
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    B, d = queries.shape
    NBLK = B // QB
    nch = -(-nch // GROUP_CHUNKS) * GROUP_CHUNKS

    qc_dists, probes = streaming_topk_l2(
        queries, centroids, nprobe, block=coarse_block,
        point_sqnorms=centroid_norms, precision=precision)

    # Sort queries by the spatial rank of their nearest centroid so blocks
    # share probes.
    order = jnp.argsort(c_rank[probes[:, 0]])
    inv = jnp.argsort(order)
    qs = queries[order]
    probes_b = probes[order].reshape(NBLK, QB, nprobe)
    qc_b = qc_dists[order].reshape(NBLK, QB, nprobe)

    chunk_tl, bias, chunk_tile, overflow = block_metadata(
        probes_b, qc_b, centroid_norms, tile_offsets, list_sizes,
        max_codes, U, nch)

    q_rot = qs @ R.T if use_opq else qs
    M = codebooks.shape[0]
    perm = jnp.asarray(query_row_perm(M, d // M))
    q_ext = jnp.zeros((B, DEC_ROWS), jnp.float32)
    q_ext = q_ext.at[:, :d].set(-2.0 * q_rot[:, perm])
    q_ext = q_ext.at[:, NORM_DEC_ROW].set(1.0)
    q_ext = q_ext.reshape(NBLK, QB, DEC_ROWS)

    tables = decode_tables(codebooks, norm_centroids)
    dsub = 128 // codebooks.shape[0]
    partial = batch_scan(q_ext, chunk_tl, tables, tiles, dsub=dsub,
                         interpret=interpret)               # [NBLK,QB,nch,256]
    dist = partial + bias[:, :, :, None]
    dist = dist.reshape(NBLK, QB, nch * CHUNK)

    best, sel = topk_smallest(dist.reshape(B, -1), k)
    chunk_of = sel // CHUNK
    within = sel % CHUNK
    tile_rep = jnp.repeat(chunk_tile, QB, axis=0).reshape(B, nch)
    tile_sel = jnp.take_along_axis(tile_rep, chunk_of, axis=1)
    labels = ids_aligned[tile_sel * CHUNK + within]
    labels = jnp.where(jnp.isfinite(best), labels, -1)
    # Undo the sort.
    return best[inv], labels[inv], overflow
