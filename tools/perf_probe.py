"""Component-level perf probe for the Pallas search engines on the real TPU.

Times, separately: coarse+LUT+metadata, the scan kernel, top-k variants, the
full fused path, and the grouping engine — at the bench operating point, so
optimization work targets the measured bottleneck instead of a guess.

Dispatch through the remote-TPU tunnel costs ~10-20 ms per launch, which
swamps single-launch timings. Every stage is therefore timed MARGINALLY:
dispatch R launches back-to-back (async), block once, and report
(t_R - t_1) / (R - 1) — the steady-state device time per launch.

Run AFTER bench.py has populated .bench_cache (it reuses the cached index).
Wedge discipline: health-probe first; run stages under timeout externally.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")


def marginal_ms(fn, *args, repeat=5):
    """Steady-state device ms per launch: (t_R - t_1)/(R-1) with async
    dispatch and a single block at the end of each bundle."""
    import jax

    def bundle(r):
        outs = [fn(*args) for _ in range(r)]
        jax.block_until_ready(outs)

    bundle(1)  # compile + warm
    best1 = min((lambda: (lambda t0: (bundle(1), time.perf_counter() - t0)[1])(
        time.perf_counter()))() for _ in range(2))
    bestR = min((lambda: (lambda t0: (bundle(repeat),
                                      time.perf_counter() - t0)[1])(
        time.perf_counter()))() for _ in range(2))
    return (bestR - best1) / (repeat - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
    from ivfhnsw_tpu.ops.pallas import adc_scan as pk
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    from ivfhnsw_tpu.ops.topk import topk_smallest

    NB, NQ, D, NC = 2_000_000, 8192, 128, 4096
    NPROBE, MAX_CODES, K = 32, 10_000, 10
    B = 1024

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
    idx.load_quantizers(os.path.join(CACHE, "bench.pq"),
                        os.path.join(CACHE, "bench.norm_pq"))
    idx.read(os.path.join(CACHE, "bench.index"))
    queries = np.load(os.path.join(CACHE, "queries.npy"))[:B]
    q = jnp.asarray(queries)

    nch = idx._pallas_nch(SearchParams(k=K, nprobe=NPROBE,
                                       max_codes=MAX_CODES), NPROBE)
    args = idx._pallas_args()
    (centroids, centroid_norms, codebooks, norm_centroids, R,
     tiles, ids_aligned, tile_offsets, list_sizes) = args
    mc = jnp.int32(MAX_CODES)
    print(f"nch={nch} ntiles={tiles.shape[0]}", file=sys.stderr)

    # 1. full fused core at B=1024
    @jax.jit
    def full(q):
        return pk.pallas_search_core(
            q, *args, mc, nprobe=NPROBE, k=K, nch=nch,
            coarse_block=4096, use_opq=False)
    ms = marginal_ms(full, q)
    print(f"full_core_B{B}: {ms:.2f} ms  ({ms*1e3/B:.2f} us/q)")

    # 2. coarse + lut + metadata only
    @jax.jit
    def pre(q):
        qc, probes = streaming_topk_l2(q, centroids, NPROBE, block=4096,
                                       point_sqnorms=centroid_norms,
                                       precision=jax.lax.Precision.HIGHEST)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids,
                                 precision=jax.lax.Precision.HIGHEST)
        ct, cl, cb = pk.chunk_metadata(probes, qc, centroid_norms,
                                       tile_offsets, list_sizes, mc, nch)
        return luts, ct, cl, cb
    ms_pre = marginal_ms(pre, q)
    luts, ct, cl, cb = jax.block_until_ready(pre(q))
    print(f"pre(coarse+lut+meta): {ms_pre:.2f} ms ({ms_pre*1e3/B:.2f} us/q)")
    real_chunks = float(np.asarray((cl > 0).sum(axis=1)).mean())
    print(f"mean real chunks/query: {real_chunks:.1f} of {nch}")

    # 3. kernel only
    @jax.jit
    def kern(luts, ct, cl, cb):
        return pk.adc_scan_tiles(luts, ct, cl, cb, tiles)
    ms_k = marginal_ms(kern, luts, ct, cl, cb)
    dists = jax.block_until_ready(kern(luts, ct, cl, cb))
    print(f"scan kernel: {ms_k:.2f} ms ({ms_k*1e3/B:.2f} us/q; "
          f"{ms_k*1e6/B/real_chunks:.0f} ns/real-chunk)")

    # 3b. kernel at half the chunks — fixed-vs-length split
    ct2, cl2, cb2 = ct[:, ::2], cl[:, ::2], cb[:, ::2]
    ms_h = marginal_ms(kern, luts, ct2, cl2, cb2)
    print(f"scan kernel (half chunks): {ms_h:.2f} ms "
          f"(chunk-linear {2*(ms_k-ms_h)*1e3/B:.2f} us/q of "
          f"{ms_k*1e3/B:.2f})")

    # 4. top-k variants over the dists array [B, nch*256]
    @jax.jit
    def tk_flat(d):
        return topk_smallest(d, K)
    ms_t = marginal_ms(tk_flat, dists)
    d_ref, i_ref = jax.block_until_ready(tk_flat(dists))
    print(f"topk flat [B,{dists.shape[1]}]: {ms_t:.2f} ms "
          f"({ms_t*1e3/B:.2f} us/q)")

    @jax.jit
    def tk_2stage(d):
        d3 = d.reshape(B, -1, 256)
        dd, ii = jax.lax.top_k(-d3, K)           # [B, nch, K] per chunk
        base = (jnp.arange(d3.shape[1], dtype=jnp.int32) * 256)[None, :, None]
        flat_i = (ii + base).reshape(B, -1)
        dd2, sel = jax.lax.top_k(dd.reshape(B, -1), K)
        return -dd2, jnp.take_along_axis(flat_i, sel, axis=1)
    ms_t2 = marginal_ms(tk_2stage, dists)
    d2_, i2_ = jax.block_until_ready(tk_2stage(dists))
    ok2 = bool(jnp.all(d2_ == d_ref))
    print(f"topk 2-stage(256): {ms_t2:.2f} ms ({ms_t2*1e3/B:.2f} us/q) "
          f"exact={ok2}")

    @jax.jit
    def tk_approx(d):
        return jax.lax.approx_min_k(d, K, recall_target=0.99)
    ms_ta = marginal_ms(tk_approx, dists)
    da_, ia_ = jax.block_until_ready(tk_approx(dists))
    agree = float(jnp.mean((da_ == d_ref).astype(jnp.float32)))
    print(f"topk approx(0.99): {ms_ta:.2f} ms ({ms_ta*1e3/B:.2f} us/q) "
          f"value-agreement={agree:.4f}")

    # 5. grouping engine at the bench operating point (if cached)
    p_gidx = os.path.join(CACHE, "bench_grouping.index")
    if os.path.exists(p_gidx):
        from ivfhnsw_tpu import IVFADCGroupingIndex
        gcfg = IndexConfig(d=D, nc=NC, code_size=16, nsubc=64, do_opq=True)
        gidx = IVFADCGroupingIndex(gcfg)
        gidx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
        gidx.compute_neighbor_centroids()
        gidx.load_quantizers(os.path.join(CACHE, "bench_grouping.pq"),
                             os.path.join(CACHE, "bench_grouping.norm_pq"),
                             os.path.join(CACHE, "bench_grouping.opq"))
        gidx.alphas = None
        gidx.read(p_gidx)
        gp = SearchParams(k=K, nprobe=NPROBE, max_codes=MAX_CODES,
                          do_pruning=True)
        _, kw = gidx._grouping_pallas_setup(gp, NPROBE)
        print(f"grouping nch={kw['nch']}", file=sys.stderr)

        def gfull(qd):
            return gidx.search_device(qd, gp)
        ms_g = marginal_ms(gfull, q)
        print(f"grouping full B{B}: {ms_g:.2f} ms ({ms_g*1e3/B:.2f} us/q)")


# Stage registry for the big-geometry decompositions: where the cached
# index/quantizer/query artifacts live (written by the matching bench.py
# build_* stage) and the stage's centroid count. scale4 shares scale3sl's
# centroids/quantizers/queries by construction (bench.build_scale4).
STAGES = {
    "scale2": dict(idx_dir="scale2", idx_prefix="scale2",
                   aux_dir="scale2", aux_prefix="scale2", nc=131072),
    "scale3": dict(idx_dir="scale3", idx_prefix="scale3",
                   aux_dir="scale3", aux_prefix="scale3", nc=1048576),
    "scale3sl": dict(idx_dir="scale3sl", idx_prefix="sl",
                     aux_dir="scale3sl", aux_prefix="sl", nc=1048576),
    "scale4": dict(idx_dir="scale4", idx_prefix="s4",
                   aux_dir="scale3sl", aux_prefix="sl", nc=1048576),
}


def main_stage(stage: str):
    """Component breakdown at a cached big-geometry bench stage (the
    reference's canonical operating point: nprobe=128, max_codes=100k) —
    times the SAME resolved configuration the bench serves (layout,
    coarse mode, profiled scan budget), so optimization work targets the
    measured bottleneck of the real path, not a proxy."""
    import jax
    import jax.numpy as jnp
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
    from ivfhnsw_tpu.ops.pallas import adc_scan as pk
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    from ivfhnsw_tpu.ops.topk import topk_smallest

    scfg = STAGES[stage]
    sdir = os.path.join(CACHE, scfg["idx_dir"])
    adir = os.path.join(CACHE, scfg["aux_dir"])
    ap = scfg["aux_prefix"]
    D, NC, NPROBE, MAX_CODES, K = 128, scfg["nc"], 128, 100_000, 10

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(adir, "centroids.npy")))
    idx.load_quantizers(os.path.join(adir, f"{ap}.pq"),
                        os.path.join(adir, f"{ap}.norm_pq"))
    idx.read(os.path.join(sdir, f"{scfg['idx_prefix']}.index"))
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MAX_CODES)

    queries_all = np.load(os.path.join(adir, "queries.npy"))
    # The bench's profiled scan budget (scan_slot_demand docstring):
    # identical slot allocation to the serving config.
    dem = int(idx.scan_slot_demand(queries_all, params).max())
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MAX_CODES,
                          scan_budget=dem * idx.scan_unit())
    nch = idx._pallas_nch(params, NPROBE)
    bcap = idx._pallas_batch_cap(nch)
    B = min(1 << (bcap.bit_length() - 1), queries_all.shape[0])
    q = jnp.asarray(queries_all[:B])

    layout = idx._resolve_layout()
    two_phase = idx._resolve_two_phase(params, NPROBE)
    args = idx._pallas_args()
    (centroids, centroid_norms, codebooks, norm_centroids, R,
     tiles, ids_aligned, tile_offsets, list_sizes) = args
    mc = jnp.int32(MAX_CODES)
    cblock = idx._coarse_block_for(B)
    approx = idx._coarse_approx(params)
    gran = idx.scan_unit()
    print(f"{stage}: layout={layout} two_phase={two_phase} nch={nch} "
          f"(profiled demand {dem}) B={B} ntiles={tiles.shape[0]} "
          f"coarse_block={cblock} approx={approx}", file=sys.stderr)

    @jax.jit
    def full(q):
        return pk.pallas_search_core(
            q, *args, mc, nprobe=NPROBE, k=K, nch=nch,
            coarse_block=cblock, use_opq=False, coarse_approx=approx,
            layout=layout, two_phase=two_phase)
    ms = marginal_ms(full, q, repeat=3)
    print(f"full_core_B{B}: {ms:.2f} ms  ({ms*1e3/B:.2f} us/q)")

    @jax.jit
    def coarse(q):
        return streaming_topk_l2(q, centroids, NPROBE, block=cblock,
                                 point_sqnorms=centroid_norms,
                                 precision=jax.lax.Precision.HIGHEST,
                                 approx=approx, recall_target=0.95)
    ms_c = marginal_ms(coarse, q, repeat=3)
    print(f"coarse only: {ms_c:.2f} ms ({ms_c*1e3/B:.2f} us/q)")

    # Coarse REDUCTION A/B: approx_min_k (current) vs a binned-exact
    # streaming sweep vs the matmul+block-min lower bound. The matmul is
    # ~1 us/q — whatever the reduction costs above that is the coarse
    # lever's headroom at this nc.
    from ivfhnsw_tpu.ops.topk import binned_topk_smallest

    def _coarse_binned(q, bin_size):
        n = centroids.shape[0]
        nblk = -(-n // cblock)
        qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        best_d = jnp.full((q.shape[0], NPROBE), jnp.inf, jnp.float32)
        best_i = jnp.zeros((q.shape[0], NPROBE), jnp.int32)
        for bi in range(nblk):
            blk = jax.lax.dynamic_slice_in_dim(
                centroids, bi * cblock, min(cblock, n - bi * cblock), 0)
            sqn = jax.lax.dynamic_slice_in_dim(
                centroid_norms, bi * cblock, blk.shape[0], 0)
            ip = jax.lax.dot_general(
                q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dist = qsq[:, None] - 2.0 * ip + sqn[None, :]
            if dist.shape[1] % bin_size:
                dist = jnp.pad(dist, ((0, 0), (0, -dist.shape[1] % bin_size)),
                               constant_values=jnp.inf)
            d_, i_ = binned_topk_smallest(dist, NPROBE, bin_size=bin_size)
            i_ = i_ + bi * cblock
            md = jnp.concatenate([best_d, d_], axis=1)
            mi = jnp.concatenate([best_i, i_], axis=1)
            best_d, sel = jax.lax.top_k(-md, NPROBE)
            best_d = -best_d
            best_i = jnp.take_along_axis(mi, sel, axis=1)
        return best_d, best_i

    for bs in (32, 128):
        f = jax.jit(functools.partial(_coarse_binned, bin_size=bs))
        ms_b = marginal_ms(f, q, repeat=3)
        d_b, i_b = jax.block_until_ready(f(q))
        d_a, i_a = jax.block_until_ready(coarse(q))
        ov = float(np.mean([np.intersect1d(np.asarray(i_b)[i],
                                           np.asarray(i_a)[i]).size / NPROBE
                            for i in range(min(B, 128))]))
        print(f"coarse binned(bin={bs}, exact): {ms_b:.2f} ms "
              f"({ms_b*1e3/B:.2f} us/q; overlap-vs-current {ov:.4f})")

    @jax.jit
    def coarse_lb(q):
        # matmul + 128-lane block-min only (no selection): the reduction's
        # bandwidth lower bound.
        ip = jax.lax.dot_general(
            q, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dist = -2.0 * ip + centroid_norms[None, :]
        return dist.reshape(q.shape[0], -1, 128).min(axis=-1)
    ms_lb = marginal_ms(coarse_lb, q, repeat=3)
    print(f"coarse matmul+blockmin lower bound: {ms_lb:.2f} ms "
          f"({ms_lb*1e3/B:.2f} us/q)")

    meta_fn = pk.quad_metadata if layout == "quad" else pk.chunk_metadata

    @jax.jit
    def pre(q):
        qc, probes = coarse(q)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids,
                                 precision=jax.lax.Precision.HIGHEST)
        st, sl, sb = meta_fn(probes, qc, centroid_norms,
                             tile_offsets, list_sizes, mc, nch)
        return luts, st, sl, sb
    ms_pre = marginal_ms(pre, q, repeat=3)
    luts, st, sl, sb = jax.block_until_ready(pre(q))
    print(f"pre(coarse+lut+meta): {ms_pre:.2f} ms ({ms_pre*1e3/B:.2f} us/q;"
          f" meta+lut alone {max(ms_pre-ms_c, 0)*1e3/B:.2f} us/q)")
    real_units = float(np.asarray((sl > 0).sum(axis=1)).mean())
    print(f"mean real {gran}-code slots/query: {real_units:.1f} of {nch}")

    if layout == "quad":
        @jax.jit
        def kern(luts, st, sl, sb):
            return pk.adc_scan_quad(pk.build_luts_quad(luts), st, sl, sb,
                                    tiles)
    else:
        @jax.jit
        def kern(luts, st, sl, sb):
            return pk.adc_scan_tiles(luts, st, sl, sb, tiles)
    ms_k = marginal_ms(kern, luts, st, sl, sb, repeat=3)
    dists = jax.block_until_ready(kern(luts, st, sl, sb))
    print(f"scan kernel: {ms_k:.2f} ms ({ms_k*1e3/B:.2f} us/q; "
          f"{ms_k*1e6/B/real_units:.0f} ns/real-slot; lanes/q "
          f"{dists.shape[1]})")

    @jax.jit
    def tk(d):
        return topk_smallest(d, K)
    ms_t = marginal_ms(tk, dists, repeat=3)
    print(f"topk [{B},{dists.shape[1]}]: {ms_t:.2f} ms "
          f"({ms_t*1e3/B:.2f} us/q)")
    acc = ms_c + (ms_pre - ms_c) + ms_k + ms_t
    print(f"sum(components): {acc:.2f} ms ({acc*1e3/B:.2f} us/q) vs "
          f"full {ms:.2f} ms — residual {(ms-acc)*1e3/B:.2f} us/q "
          "(id gather + fusion delta)")


if __name__ == "__main__":
    if "--stage" in sys.argv:
        main_stage(sys.argv[sys.argv.index("--stage") + 1])
    elif "--scale2" in sys.argv:
        main_stage("scale2")
    else:
        main()
