"""Component breakdown of the QUAD scan path at the primary bench point
(B=1024 sub-batch) — identifies where the quad kernel's 1.2x win goes in
the fused program. Reuses perf_probe.marginal_ms."""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))
CACHE = os.path.join(ROOT, ".bench_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams  # noqa: E402
from ivfhnsw_tpu.ops.distances import streaming_topk_l2  # noqa: E402
from ivfhnsw_tpu.ops.pallas import adc_scan as pk  # noqa: E402
from ivfhnsw_tpu.ops.topk import binned_topk_smallest, topk_smallest  # noqa: E402
from perf_probe import marginal_ms  # noqa: E402


def main():
    D, NC = 128, 4096
    NPROBE, MAX_CODES, K = 32, 10_000, 10
    B = 1024
    HI = jax.lax.Precision.HIGHEST

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
    idx.load_quantizers(os.path.join(CACHE, "bench.pq"),
                        os.path.join(CACHE, "bench.norm_pq"))
    idx.read(os.path.join(CACHE, "bench.index"))
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MAX_CODES)
    queries = np.load(os.path.join(CACHE, "queries.npy"))[:B]
    q = jnp.asarray(queries)

    store = idx._ensure_store()
    centroids, centroid_norms = idx.centroids, idx.centroid_norms
    codebooks, norm_centroids = idx.pq.codebooks, idx.norm_pq.centroids
    mc = jnp.int32(MAX_CODES)

    idx.scan_layout = "quad"
    nquad = idx._pallas_nch(params, NPROBE)
    quad = store.quad()
    idx.scan_layout = "chunk"
    nch = idx._pallas_nch(params, NPROBE)
    tiled = store.tiled()
    print(f"nch={nch} ({nch * 256} lanes)  nquad={nquad} "
          f"({nquad * 1024} lanes)")

    @jax.jit
    def coarse(q):
        return streaming_topk_l2(q, centroids, NPROBE, block=4096,
                                 point_sqnorms=centroid_norms, precision=HI)

    @jax.jit
    def pre_q(q):
        qc, probes = coarse(q)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids, precision=HI)
        qt, ql, qb = pk.quad_metadata(probes, qc, centroid_norms,
                                      quad.tile_offsets, quad.list_sizes,
                                      mc, nquad)
        return luts, qt, ql, qb

    @jax.jit
    def pre_c(q):
        qc, probes = coarse(q)
        luts = pk.build_luts_ext(q, codebooks, norm_centroids, precision=HI)
        ct, cl, cb = pk.chunk_metadata(probes, qc, centroid_norms,
                                       tiled.tile_offsets, tiled.list_sizes,
                                       mc, nch)
        return luts, ct, cl, cb

    luts, qt, ql, qb = jax.block_until_ready(pre_q(q))
    _, ct, cl, cb = jax.block_until_ready(pre_c(q))

    @jax.jit
    def kern_q(luts, qt, ql, qb):
        return pk.adc_scan_quad(pk.build_luts_quad(luts), qt, ql, qb,
                                quad.tiles)

    @jax.jit
    def kern_c(luts, ct, cl, cb):
        return pk.adc_scan_tiles(luts, ct, cl, cb, tiled.tiles)

    dq = jax.block_until_ready(kern_q(luts, qt, ql, qb))
    dc = jax.block_until_ready(kern_c(luts, ct, cl, cb))
    print(f"widths: chunk {dc.shape[1]}  quad {dq.shape[1]}")

    for name, fn, args in (
            ("coarse", coarse, (q,)),
            ("pre_chunk (coarse+lut+meta)", pre_c, (q,)),
            ("pre_quad  (coarse+lut+meta)", pre_q, (q,)),
            ("kern_chunk", kern_c, (luts, ct, cl, cb)),
            ("kern_quad", kern_q, (luts, qt, ql, qb)),
    ):
        ms = marginal_ms(fn, *args)
        print(f"{name:30s} {ms:7.2f} ms  {ms * 1e3 / B:6.2f} us/q")

    for name, width, d in (("chunk", dc.shape[1], dc),
                           ("quad", dq.shape[1], dq)):
        for tk_name, tk in (("flat", topk_smallest),
                            ("binned", binned_topk_smallest)):
            f = jax.jit(functools.partial(tk, k=K))
            jax.block_until_ready(f(d))
            ms = marginal_ms(f, d)
            print(f"topk_{tk_name}[{name} {width}]{'':8s} {ms:7.2f} ms  "
                  f"{ms * 1e3 / B:6.2f} us/q")


if __name__ == "__main__":
    main()
