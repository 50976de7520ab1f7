"""Timed A/B: approx_min_k vs binned-exact coarse probe selection at
canonical geometry (VERDICT r4 item 6).

`coarse_mode='binned'` (ops.topk.binned_topk_smallest, wired through the
fused engine in models/ivfadc.py) gives EXACT probe sets at a
bandwidth-bound cost profile. This tool measures the full-path timed
delta on the WARM scale3sl index (134M codes, nc=2^20) at the flagship
operating point, plus the probe-set overlap of each mode against exact
lax.top_k — the adoption evidence SCALING.md's open item asks for
(replaces the reference's graph walk, hnswalg.cpp:48-109).

Usage: python tools/coarse_ab.py [--nprobe 128] [--max-codes 100000]
Writes .bench_cache/coarse_ab.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402

import bench  # noqa: E402
from ivfhnsw_tpu import SearchParams  # noqa: E402
from ivfhnsw_tpu.utils.recall import recall_at_k  # noqa: E402


def main():
    bench.force_cpu_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--max-codes", type=int, default=100_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    key = jr.PRNGKey(0)
    idx, q, gt, meta = bench.build_scale3sl(key)  # warm-cache load
    k = bench.K

    out = {"nb": int(bench.S3SL_NB), "nc": int(bench.S3SL_NC),
           "nprobe": args.nprobe, "max_codes": args.max_codes,
           "modes": {}}

    # Exact probe sets (the overlap denominator): block-streamed exact
    # lax.top_k coarse selection.
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    _, probes_exact = streaming_topk_l2(
        jnp.asarray(q), idx.centroids, args.nprobe, block=idx._cb(),
        point_sqnorms=idx.centroid_norms)
    probes_exact = np.asarray(probes_exact)

    for mode in ("auto", "binned"):
        sp = SearchParams(k=k, nprobe=args.nprobe,
                          max_codes=args.max_codes, coarse_mode=mode)
        dem = int(idx.scan_slot_demand(q, sp).max())
        sp = SearchParams(k=k, nprobe=args.nprobe,
                          max_codes=args.max_codes, coarse_mode=mode,
                          scan_budget=dem * idx.scan_unit())
        qps, labels, sl_us = bench.timed_qps(idx, q, sp, runs=args.runs,
                                             reshape=None, depth=8)
        rec = recall_at_k(labels, gt, ks=(1, 10))
        # Probe-set overlap vs exact: the same block reduction the fused
        # engine resolves for this mode, via the coarse primitive.
        n_ctl = min(64, q.shape[0])
        qc = jnp.asarray(q[:n_ctl])
        if mode == "binned":
            _, pr = streaming_topk_l2(
                qc, idx.centroids, args.nprobe,
                block=idx._coarse_block_for(n_ctl),
                point_sqnorms=idx.centroid_norms,
                exact_reduce="binned")
        else:
            _, pr = streaming_topk_l2(
                qc, idx.centroids, args.nprobe,
                block=idx._coarse_block_for(n_ctl),
                point_sqnorms=idx.centroid_norms,
                approx=True, recall_target=0.95)
        pr = np.asarray(pr)
        ovl = float(np.mean([
            len(np.intersect1d(pr[i], probes_exact[i]))
            / probes_exact.shape[1] for i in range(pr.shape[0])]))
        out["modes"][mode] = {
            "qps": round(qps, 1),
            "us_per_query": round(1e6 / qps, 2),
            "us_per_query_single_launch": round(sl_us, 2),
            "recall_at_1": round(rec[1], 4),
            "recall_at_10": round(rec[10], 4),
            "probe_overlap_vs_exact": (round(ovl, 4)
                                       if ovl is not None else None),
        }
        print(f"{mode}: {out['modes'][mode]}", flush=True)

    a, b = out["modes"]["auto"], out["modes"]["binned"]
    out["binned_minus_auto_us"] = round(
        b["us_per_query"] - a["us_per_query"], 2)
    print(json.dumps(out), flush=True)
    p = os.path.join(bench.CACHE, "coarse_ab.json")
    with open(p + ".tmp", "w") as f:
        json.dump(out, f)
    os.replace(p + ".tmp", p)


if __name__ == "__main__":
    main()
