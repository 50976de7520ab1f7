"""Component-level perf probe for the Pallas search engines on the real TPU.

Times, separately: coarse+LUT+metadata, the scan kernel, and top-k — plus
the full fused path — at the bench operating point, so optimization work
targets the measured bottleneck instead of a guess.

Run AFTER bench.py has populated .bench_cache (it reuses the cached index).
Wedge discipline: health-probe first; run stages under timeout externally.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")


def t_ms(fn, *args, runs=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


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

    tiled = idx._ensure_store().tiled()
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
    ms, _ = t_ms(full, q)
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
    ms_pre, (luts, ct, cl, cb) = t_ms(pre, q)
    print(f"pre(coarse+lut+meta): {ms_pre:.2f} ms ({ms_pre*1e3/B:.2f} us/q)")
    real_chunks = float(np.asarray((cl > 0).sum(axis=1)).mean())
    print(f"mean real chunks/query: {real_chunks:.1f} of {nch}")

    # 3. kernel only
    @jax.jit
    def kern(luts, ct, cl, cb):
        return pk.adc_scan_tiles(luts, ct, cl, cb, tiles)
    ms_k, dists = t_ms(kern, luts, ct, cl, cb)
    print(f"scan kernel: {ms_k:.2f} ms ({ms_k*1e3/B:.2f} us/q; "
          f"{ms_k*1e6/B/real_chunks:.0f} ns/chunk)")

    # 4. topk only
    @jax.jit
    def tk(dists):
        return topk_smallest(dists, K)
    ms_t, _ = t_ms(tk, dists)
    print(f"topk over [B,{dists.shape[1]}]: {ms_t:.2f} ms "
          f"({ms_t*1e3/B:.2f} us/q)")

    # 5. DMA-floor variant: kernel with all lens forced to full chunks but
    #    computing nothing... approximated by gather-free body is a code
    #    change; instead time the kernel at half the chunks to estimate the
    #    fixed-vs-len split.
    ct2, cl2, cb2 = ct[:, ::2], cl[:, ::2], cb[:, ::2]
    @jax.jit
    def kern2(luts, ct, cl, cb):
        return pk.adc_scan_tiles(luts, ct, cl, cb, tiles)
    ms_h, _ = t_ms(kern2, luts, ct2, cl2, cb2)
    print(f"scan kernel (half chunks): {ms_h:.2f} ms")


if __name__ == "__main__":
    main()
