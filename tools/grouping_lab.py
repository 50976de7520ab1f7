"""Grouping-search component lab (VERDICT r3 item 3).

Flagship grouping search runs 31.9 us/q sustained vs 7.9 for plain
IVFADC on the same 2M corpus — a 4x gap the reference does not have
(its grouping loop is same-order as IVFADC,
IndexIVF_HNSW_Grouping.cpp:188-363). This rig splits the fused path
(ops.pallas.grouping_scan.grouping_pallas_search_core) into separately
jitted components against the CACHED bench grouping index and times
each, then measures candidate fixes. Verdicts land in PARITY.md.

Components:
  coarse — streaming top-nprobe centroid selection (shared with IVFADC)
  prep   — qn distances (lax.map of per-probe einsums), pruning
           threshold, term tables, chunk schedule, LUT build
  scan   — the Pallas group-tiled DMA scan + bias + bin32 top-k

Run: python tools/grouping_lab.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

import bench                                                 # noqa: E402
from ivfhnsw_tpu import SearchParams                         # noqa: E402
from ivfhnsw_tpu.ops.distances import streaming_topk_l2     # noqa: E402
from ivfhnsw_tpu.ops.pallas import grouping_scan as gs      # noqa: E402
from ivfhnsw_tpu.ops.pallas.adc_scan import build_luts_ext  # noqa: E402
from ivfhnsw_tpu.ops.topk import binned_topk_smallest       # noqa: E402

HIGHEST = jax.lax.Precision.HIGHEST


def marginal_ms(fn, *args, n=6):
    fn(*args)  # compile + warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    gidx = bench.build_grouping(key)
    # The component split below unpacks CHUNK-layout internals
    # (grouping_chunk_metadata / grouping_scan_tiles); force it unless
    # overridden — the quad-vs-chunk decision lives in layout_compare().
    gidx.scan_layout = os.environ.get("GLAB_LAYOUT", "chunk")
    queries = np.load(os.path.join(bench.CACHE, "queries.npy"))
    gp = SearchParams(k=10, nprobe=32, max_codes=10_000, do_pruning=True)
    g_dem = int(gidx.scan_slot_demand(queries[:2048], gp).max())
    gp = SearchParams(k=10, nprobe=32, max_codes=10_000, do_pruning=True,
                      scan_budget=g_dem * 256)
    args, kw = gidx._grouping_pallas_setup(gp, 32)
    nch = kw["nch"]
    cap = gidx._smem_batch_cap(nch, kw["layout"])
    B = 1 << (cap.bit_length() - 1)
    print(f"nch={nch} B(sub-batch)={B}", flush=True)

    (centroids, centroid_norms, codebooks, norm_centroids, R,
     tiles, ids_aligned, tile_offsets, nn_idxs, alphas,
     inter_dists, sub_sizes) = args
    q = jnp.asarray(queries[:B])
    mc = jnp.int32(gp.max_codes)
    nprobe, k, nsubc = 32, 10, int(sub_sizes.shape[1])
    cb = kw["coarse_block"]
    use_opq, do_pruning = kw["use_opq"], kw["do_pruning"]

    # --- full fused core (reference point)
    def full(qq):
        return gs.grouping_pallas_search_core(
            qq, *args, mc, **kw)

    ms_full = marginal_ms(full, q)
    print(f"full core: {ms_full:.2f} ms ({ms_full*1e3/B:.2f} us/q)",
          flush=True)

    # --- coarse
    def f_coarse(qq):
        return streaming_topk_l2(qq, centroids, nprobe, block=cb,
                                 point_sqnorms=centroid_norms,
                                 precision=HIGHEST)

    ms_coarse = marginal_ms(f_coarse, q)
    print(f"coarse: {ms_coarse:.2f} ms ({ms_coarse*1e3/B:.2f} us/q)",
          flush=True)
    qc_dists, probes = jax.block_until_ready(f_coarse(q))

    # --- prep (everything between coarse and the Pallas call)
    @jax.jit
    def f_prep(qq, qc, pr):
        p_nn = nn_idxs[pr]
        q_sq = jnp.sum(qq ** 2, axis=1)
        cent_ext = jnp.concatenate([centroids, centroid_norms[:, None]],
                                   axis=1)

        def nn_dist_one_probe(nn_p):
            cn = cent_ext[nn_p]
            ip = jnp.einsum("bsd,bd->bs", cn[..., :-1], qq,
                            precision=HIGHEST,
                            preferred_element_type=jnp.float32)
            return jnp.stack([q_sq[:, None] - 2.0 * ip + cn[..., -1],
                              cn[..., -1]], axis=0)

        qn = jnp.moveaxis(
            jax.lax.map(nn_dist_one_probe, jnp.moveaxis(p_nn, 1, 0)), 0, 2)
        qn_dists, nn_norms = qn[0], qn[1]
        apack = jnp.pad(jnp.stack([alphas, centroid_norms], axis=1),
                        ((0, 0), (0, 6)))
        ag = jnp.take(apack, pr, axis=0)
        a, probe_norms = ag[..., 0], ag[..., 1]
        one_m_a = (1.0 - a)[:, :, None]
        a_b = a[:, :, None]
        ssz = sub_sizes[pr].astype(jnp.int32)
        nonempty = ssz > 0
        i_dists = inter_dists[pr]
        qsd = (one_m_a * qc[:, :, None] + a_b * qn_dists
               - a_b * one_m_a * i_dists)
        g_sizes = jnp.sum(ssz, axis=2)
        g_cum_before = jnp.concatenate(
            [jnp.zeros((qq.shape[0], 1), jnp.int32),
             jnp.cumsum(g_sizes, axis=1)[:, :-1]], axis=1)
        thr_probe = jnp.logical_or(mc <= 0, g_cum_before < 2 * mc)
        thr_mask = nonempty & thr_probe[:, :, None]
        n_slots = jnp.maximum(jnp.sum(thr_mask, axis=(1, 2)), 1)
        threshold = (jnp.sum(jnp.where(thr_mask, qsd, 0.0), axis=(1, 2))
                     / n_slots)
        scan_slot = nonempty & (qsd < threshold[:, None, None])
        term1 = one_m_a[:, :, 0] * (qc - probe_norms)
        term2 = a_b * (qn_dists - nn_norms)
        t2_tab = jnp.full((qq.shape[0], nprobe, 256), jnp.inf, jnp.float32)
        t2_tab = t2_tab.at[:, :, :nsubc].set(
            jnp.where(scan_slot, term2, jnp.inf))
        eff_sizes = jnp.sum(jnp.where(scan_slot, ssz, 0), axis=2)
        scan_sizes = jnp.sum(ssz, axis=2)
        tl, bias, seg = gs.grouping_chunk_metadata(
            pr, term1, eff_sizes, scan_sizes, tile_offsets, mc, nch)
        q_rot = qq @ R.T if use_opq else qq
        luts_ext = build_luts_ext(q_rot, codebooks, norm_centroids,
                                  precision=HIGHEST)
        return tl, bias, seg, t2_tab, luts_ext

    ms_prep = marginal_ms(f_prep, q, qc_dists, probes)
    print(f"prep: {ms_prep:.2f} ms ({ms_prep*1e3/B:.2f} us/q)", flush=True)
    tl, bias, seg, t2_tab, luts_ext = jax.block_until_ready(
        f_prep(q, qc_dists, probes))

    # --- scan + topk
    @jax.jit
    def f_scan(luts, tl_, seg_, t2_, bias_):
        dists = gs.grouping_scan_tiles(luts, tl_, seg_, t2_, tiles)
        dists = (dists.reshape(B, nch, 256)
                 + bias_[:, :, None]).reshape(B, nch * 256)
        best, sel = binned_topk_smallest(dists, k, bin_size=32)
        chunk_of = sel // 256
        within = sel % 256
        tile_sel = jnp.take_along_axis((tl_ // gs.TL_PACK), chunk_of, axis=1)
        labels = ids_aligned[tile_sel * 256 + within]
        return best, jnp.where(jnp.isfinite(best), labels, -1)

    ms_scan = marginal_ms(f_scan, luts_ext, tl, seg, t2_tab, bias)
    print(f"scan+topk: {ms_scan:.2f} ms ({ms_scan*1e3/B:.2f} us/q)",
          flush=True)
    nch_real = float(np.mean(np.sum(np.asarray(tl) % gs.TL_PACK > 0,
                                    axis=1)))
    print(f"  real chunks/query (mean): {nch_real:.1f}; provisioned {nch}",
          flush=True)
    print(f"components sum: {ms_coarse+ms_prep+ms_scan:.2f} ms vs full "
          f"{ms_full:.2f} ms", flush=True)

    # --- prep variant: qn via one [B, nc] distance matmul + row gather
    # (nc=4096 here makes dist2all trivial; the lax.map over P probes is
    # P sequential small kernels).
    @jax.jit
    def f_prep_matmul(qq, qc, pr):
        q_sq = jnp.sum(qq ** 2, axis=1)
        ip_all = jnp.einsum("bd,cd->bc", qq, centroids, precision=HIGHEST,
                            preferred_element_type=jnp.float32)
        d_all = q_sq[:, None] - 2.0 * ip_all + centroid_norms[None, :]
        p_nn = nn_idxs[pr]                                 # [B, P, S]
        Bq = qq.shape[0]
        qn_dists = jnp.take_along_axis(
            d_all, p_nn.reshape(Bq, -1), axis=1).reshape(p_nn.shape)
        nn_norms = centroid_norms[p_nn]
        return qn_dists, nn_norms

    try:
        ms_prep2 = marginal_ms(f_prep_matmul, q, qc_dists, probes)
        print(f"prep-variant qn matmul+gather: {ms_prep2:.2f} ms "
              f"({ms_prep2*1e3/B:.2f} us/q) [qn part only]", flush=True)
        # correctness vs the map version
        qn_a, nn_a = jax.block_until_ready(f_prep_matmul(q, qc_dists, probes))
    except Exception as e:
        print(f"prep-variant failed: {type(e).__name__}: {e}", flush=True)

    # --- qn part alone in the map formulation, for comparison
    @jax.jit
    def f_qn_map(qq, pr):
        p_nn = nn_idxs[pr]
        q_sq = jnp.sum(qq ** 2, axis=1)
        cent_ext = jnp.concatenate([centroids, centroid_norms[:, None]],
                                   axis=1)

        def one(nn_p):
            cn = cent_ext[nn_p]
            ip = jnp.einsum("bsd,bd->bs", cn[..., :-1], qq,
                            precision=HIGHEST,
                            preferred_element_type=jnp.float32)
            return jnp.stack([q_sq[:, None] - 2.0 * ip + cn[..., -1],
                              cn[..., -1]], axis=0)

        qn = jnp.moveaxis(jax.lax.map(one, jnp.moveaxis(p_nn, 1, 0)), 0, 2)
        return qn[0], qn[1]

    ms_qn = marginal_ms(f_qn_map, q, probes)
    print(f"qn via lax.map: {ms_qn:.2f} ms ({ms_qn*1e3/B:.2f} us/q)",
          flush=True)
    qn_b, nn_b = jax.block_until_ready(f_qn_map(q, probes))
    print(f"qn variants match: "
          f"{np.allclose(np.asarray(qn_a), np.asarray(qn_b), atol=1e-2)}",
          flush=True)

    # --- sustained depth sweep on the production device path
    qdev = jnp.asarray(queries[:8192 // B * B].reshape(-1, B, 128))
    for depth in (2, 4, 8):
        def run_once():
            outs = []
            for i in range(depth):
                outs.append(gidx.search_device(qdev, gp))
            for o in outs:
                jax.block_until_ready(o)
        run_once()
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            run_once()
        us = (time.perf_counter() - t0) / n / depth / qdev.shape[0] \
            / qdev.shape[1] * 1e6
        print(f"sustained depth={depth}: {us:.2f} us/q", flush=True)


def layout_compare():
    """Chunk vs QUAD grouping layout on the cached 2M flagship index:
    agreement check + single-launch and sustained timings per layout
    (the quad-vs-chunk adoption decision for GroupingIndex
    _resolve_layout's crossover)."""
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    gidx = bench.build_grouping(key)
    queries = np.load(os.path.join(bench.CACHE, "queries.npy"))
    results = {}
    for layout in ("chunk", "quad"):
        gidx.scan_layout = layout
        gidx.store.release_device()   # drop the other layout's HBM tiles
        gp0 = SearchParams(k=10, nprobe=32, max_codes=10_000,
                           do_pruning=True)
        dem = int(gidx.scan_slot_demand(queries[:2048], gp0).max())
        gran = gidx.scan_unit()
        gp = SearchParams(k=10, nprobe=32, max_codes=10_000,
                          do_pruning=True, scan_budget=dem * gran)
        print(f"[{layout}] slots={dem} unit={gran}", flush=True)
        d_, l_ = gidx.search(queries, gp)      # compile + warm + labels
        results[layout] = (np.asarray(d_), np.asarray(l_))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(
                gidx.search_device(jnp.asarray(queries), gp))
        sl_us = (time.perf_counter() - t0) / 3 / queries.shape[0] * 1e6
        # Sub-batch at the SMEM cap (a hardcoded 1024 overflowed SMEM at
        # nch=128 padded: 2 prefetch arrays x 1024 x 128 x 4B = 1.00 MB).
        args_, kw_ = gidx._grouping_pallas_setup(gp, 32)
        cb = gidx._smem_batch_cap(kw_["nch"], kw_["layout"])
        B_ = 1 << (cb.bit_length() - 1)
        while queries.shape[0] % B_:
            B_ //= 2
        qdev = jnp.asarray(queries.reshape(-1, B_, 128))
        for _ in range(2):
            jax.block_until_ready(gidx.search_device(qdev, gp))
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            outs = [gidx.search_device(qdev, gp) for _ in range(8)]
            for o in outs:
                jax.block_until_ready(o)
        sus_us = (time.perf_counter() - t0) / n / 8 / queries.shape[0] * 1e6
        print(f"[{layout}] single-launch {sl_us:.2f} us/q, "
              f"sustained x8 {sus_us:.2f} us/q", flush=True)
    dc, lc = results["chunk"]
    dq, lq = results["quad"]
    dist_ok = np.allclose(dc, dq, rtol=1e-4, atol=1e-2)
    lbl = float((lc == lq).mean())
    print(f"layouts agree: dists={dist_ok} labels={lbl:.4f}", flush=True)
    gidx.scan_layout = "auto"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "layout":
        layout_compare()
    else:
        main()
