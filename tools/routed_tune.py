"""Sweep the routed-coarse structure (n_super, cap_factor, w) on a cached
scale index: probe-set overlap vs the exact sweep, and the routed
selection's marginal device time vs approx_min_k + pack-gather.

The round-3 first measurement at scale2 (n_super=2048, cap=96) plateaued
at 0.905 overlap by w=64 — candidate coverage (w*cap=6144 of 131k) wasn't
the binding constraint; block granularity was. This sweep finds whether a
coarser routing partition (fewer, bigger blocks: each gathered row set
covers more of each probe neighborhood) reaches the 0.95/0.97 gates and
at what cost.

Usage: python tools/routed_tune.py [--stage scale2|scale3] [--quick]
"""

from __future__ import annotations

import argparse
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
from ivfhnsw_tpu.ops.routed_coarse import (RoutedCoarse,  # noqa: E402
                                           routed_select_ext)
from perf_probe import marginal_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("scale2", "scale3"),
                    default="scale2")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("-B", type=int, default=256)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    if args.stage == "scale2":
        idx, queries, _, _ = bench.build_scale2(key)
        NPROBE = bench.S2_NPROBE
    else:
        idx, queries, _, _ = bench.build_scale3(key)
        NPROBE = bench.S3_NPROBE
    B = min(args.B, queries.shape[0])
    q = jnp.asarray(queries[:B])

    print(f"stage={args.stage} nc={idx.nc} B={B} nprobe={NPROBE}",
          file=sys.stderr)

    _, exact = streaming_topk_l2(q, idx.centroids, NPROBE,
                                 block=idx._coarse_block_for(B),
                                 point_sqnorms=idx.centroid_norms,
                                 precision=jax.lax.Precision.HIGHEST)
    ex = np.asarray(exact)

    layout = idx._resolve_layout()
    store = idx._ensure_store()
    tiled = store.quad() if layout == "quad" else store.tiled()

    # Both directions from the failed default (2048, 1.5): COARSER blocks
    # (each gathered row set covers more of a probe neighborhood) and FINER
    # blocks (scale3's nc=2^20 structure reached 0.9964 overlap at w=16
    # with nc/64 supers — granularity, not candidate volume, was binding).
    configs = [(2048, 1.5), (4096, 1.5), (8192, 1.5), (2048, 2.5),
               (1024, 1.5), (512, 2.0)]
    if args.quick:
        configs = configs[:4]
    ws = (8, 16, 32, 64, 128)

    for n_super, capf in configs:
        rc = RoutedCoarse(np.asarray(idx.centroids), n_super=n_super,
                          cap_factor=capf, key=jax.random.PRNGKey(90))
        table = rc.build_table(idx.centroid_norms, tiled.list_sizes,
                               tiled.tile_offsets)
        print(f"--- n_super={n_super} cap={rc.cap} "
              f"(capf={capf}, block={rc.cap * (idx.d + 4) * 4 // 1024} KB)")
        for w in ws:
            if w > rc.n_super or w * rc.cap < NPROBE:
                continue
            _, probes, *_ = routed_select_ext(q, rc.supers, rc.super_sqn,
                                              table, nprobe=NPROBE, w=w)
            pr = np.asarray(probes)
            ov = float(np.mean([np.intersect1d(ex[i], pr[i]).size / NPROBE
                                for i in range(B)]))
            fn = jax.jit(lambda qq, _w=w: routed_select_ext(
                qq, rc.supers, rc.super_sqn, table, nprobe=NPROBE, w=_w)[0])
            jax.block_until_ready(fn(q))
            ms = marginal_ms(fn, q)
            print(f"  w={w:3d}  cand={w * rc.cap:6d}  overlap={ov:.4f}  "
                  f"{ms:7.2f} ms ({ms * 1e3 / B:6.2f} us/q)")
        del table, rc


if __name__ == "__main__":
    main()
