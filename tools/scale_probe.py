"""Component breakdown of the search path at CANONICAL geometry (the
cached scale2 / scale3 bench indexes): where do the ~100 us/q go, and what
does routed coarse selection (ops.routed_coarse) buy vs the flat
approx_min_k sweep + per-probe pack-table gather?

Measures, at B=1024 / nprobe=128 / max_codes=100k:
  - coarse selection: exact top-k, approx_min_k, routed (fused metadata)
  - LUT build
  - scan-schedule metadata (the per-probe pack gather the routed path folds
    into its block gather)
  - the Pallas scan kernel (layout picked by the index's auto rule)
  - the final top-k over the masked kernel output
  - full fused search_device under coarse_mode approx vs routed

Usage: python tools/scale_probe.py [--stage scale2|scale3] [-B 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ivfhnsw_tpu import SearchParams  # noqa: E402
from ivfhnsw_tpu.ops.distances import streaming_topk_l2  # noqa: E402
from ivfhnsw_tpu.ops.pallas import adc_scan as pk  # noqa: E402
from ivfhnsw_tpu.ops.routed_coarse import routed_select_ext  # noqa: E402
from ivfhnsw_tpu.ops.topk import topk_smallest  # noqa: E402
from perf_probe import marginal_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("scale2", "scale3"),
                    default="scale2")
    ap.add_argument("-B", type=int, default=1024)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    if args.stage == "scale2":
        idx, queries, _, _ = bench.build_scale2(key)
        NPROBE, MC = bench.S2_NPROBE, bench.S2_MC
    else:
        idx, queries, _, _ = bench.build_scale3(key)
        NPROBE, MC = bench.S3_NPROBE, bench.S3_MC
    sdir = os.path.join(bench.CACHE, args.stage)
    B = min(args.B, queries.shape[0])
    q = jnp.asarray(queries[:B])
    K = bench.K
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MC)
    HI = jax.lax.Precision.HIGHEST

    print(f"backend: {jax.default_backend()}  stage={args.stage} "
          f"nc={idx.nc} B={B} nprobe={NPROBE} mc={MC}", file=sys.stderr)

    # Big operands are passed as explicit jit ARGUMENTS (closing over
    # multi-GB arrays triggers jax's captured-constants lowering path,
    # which fingerprints gigabytes per compile — observed to stall this
    # probe for 20+ minutes at scale2).
    centroids, centroid_norms = idx.centroids, idx.centroid_norms
    codebooks, norm_centroids = idx.pq.codebooks, idx.norm_pq.centroids
    mc = jnp.int32(MC)
    layout = idx._resolve_layout()
    store = idx._ensure_store()
    tiled = store.quad() if layout == "quad" else store.tiled()
    tiles = tiled.tiles
    # Profiled slot budget, like the bench's timed stages — the worst-case
    # bound's [B, nch] SMEM schedule exceeds the 1 MB SMEM limit at
    # B=1024 x 319 slots.
    nch_worst = idx._pallas_nch(params, NPROBE)
    nch = int(idx.scan_slot_demand(queries[:B], params).max())
    gran = pk.RCHUNK if layout == "quad" else pk.CHUNK
    params = SearchParams(k=K, nprobe=NPROBE, max_codes=MC,
                          scan_budget=nch * gran)
    # SMEM cap: the [B, nch] scalar-prefetch schedule must fit 1 MB —
    # clamp the probe batch the same way search_device sub-batches.
    cap = idx._pallas_batch_cap(idx._pallas_nch(params, NPROBE))
    while B > cap:
        B //= 2
    q = jnp.asarray(queries[:B])
    print(f"layout={layout} nch={nch} (worst {nch_worst}; "
          f"{nch * gran} lanes) B={B}")

    cb = idx._coarse_block_for(B)

    @jax.jit
    def coarse_exact(q, centroids, centroid_norms):
        return streaming_topk_l2(q, centroids, NPROBE, block=cb,
                                 point_sqnorms=centroid_norms, precision=HI)

    @jax.jit
    def coarse_approx(q, centroids, centroid_norms):
        return streaming_topk_l2(q, centroids, NPROBE, block=cb,
                                 point_sqnorms=centroid_norms, precision=HI,
                                 approx=True, recall_target=0.95)

    # routed structure (cached by the bench's routed_setup when it ran)
    idx.enable_routed_coarse(key=jax.random.PRNGKey(90),
                             cache_path=os.path.join(sdir, "routed.npz"))
    p_json = os.path.join(sdir, "routed.json")
    if os.path.exists(p_json):
        with open(p_json) as f:
            idx.routed_w = max(json.load(f)["w"], 16)
    routed, rw = idx._routed_for(
        SearchParams(nprobe=NPROBE, coarse_mode="routed"), NPROBE)
    print(f"routed: w={rw} n_super={idx._routed_coarse.n_super} "
          f"cap={idx._routed_coarse.cap}")

    @functools.partial(jax.jit, static_argnames=("w",))
    def coarse_routed(q, supers, super_sqn, table, w):
        return routed_select_ext(q, supers, super_sqn, table,
                                 nprobe=NPROBE, w=w)

    @jax.jit
    def luts_fn(q):
        return pk.build_luts_ext(q, codebooks, norm_centroids, precision=HI)

    meta_fn = pk.quad_metadata if layout == "quad" else pk.chunk_metadata

    @jax.jit
    def schedule(q, centroids, centroid_norms, tile_offsets, list_sizes):
        qc, probes = coarse_approx(q, centroids, centroid_norms)
        return meta_fn(probes, qc, centroid_norms, tile_offsets,
                       list_sizes, mc, nch)

    luts = jax.block_until_ready(luts_fn(q))
    st, sl, sb = jax.block_until_ready(
        schedule(q, centroids, centroid_norms, tiled.tile_offsets,
                 tiled.list_sizes))

    if layout == "quad":
        @jax.jit
        def kern(luts, st, sl, sb, tiles):
            return pk.adc_scan_quad(pk.build_luts_quad(luts), st, sl, sb,
                                    tiles)
    else:
        @jax.jit
        def kern(luts, st, sl, sb, tiles):
            return pk.adc_scan_tiles(luts, st, sl, sb, tiles)

    d = jax.block_until_ready(kern(luts, st, sl, sb, tiles))
    print(f"kernel output width: {d.shape[1]} lanes")
    tk = jax.jit(functools.partial(topk_smallest, k=K))
    jax.block_until_ready(tk(d))

    routed_fn = functools.partial(coarse_routed, w=rw)
    for name, fn, a in (
            ("coarse_exact", coarse_exact, (q, centroids, centroid_norms)),
            ("coarse_approx", coarse_approx, (q, centroids, centroid_norms)),
            ("coarse_routed (+meta)", routed_fn, (q, *routed)),
            ("luts", luts_fn, (q,)),
            ("schedule (approx+meta)", schedule,
             (q, centroids, centroid_norms, tiled.tile_offsets,
              tiled.list_sizes)),
            ("kernel", kern, (luts, st, sl, sb, tiles)),
            ("topk", tk, (d,)),
    ):
        ms = marginal_ms(fn, *a)
        print(f"{name:26s} {ms:8.2f} ms  {ms * 1e3 / B:7.2f} us/q")

    # full fused path, approx vs routed
    for mode in ("approx", "routed"):
        p = SearchParams(k=K, nprobe=NPROBE, max_codes=MC, coarse_mode=mode,
                         scan_budget=nch * gran)
        f = lambda qq: idx.search_device(qq, p)[0]
        jax.block_until_ready(f(q))
        ms = marginal_ms(f, q)
        print(f"search_device[{mode}]{'':8s} {ms:8.2f} ms  "
              f"{ms * 1e3 / B:7.2f} us/q")


if __name__ == "__main__":
    main()
