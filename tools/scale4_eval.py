"""Standalone scale4 eval: finish the residency-ceiling stage off a cached
268M build (VERDICT r3 item 5).

The 2026-08-19 full bench run was OOM-killed by the host kernel after
writing scale4's index but before the timed runs + ceiling. This rig
replays exactly the bench stage's eval half against the cached artifacts:
exact-ADC ceiling FIRST (it is the cacheable piece — bench.py reuses
`.bench_cache/scale4/ceiling.json` on its next run), then the timed
sustained/single-launch runs + HBM occupancy, recorded to
`.bench_cache/scale4/eval.json`. Same functions, same parameters as the
bench stage (bench.py scale4 section) — no new protocol.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402
from ivfhnsw_tpu import SearchParams  # noqa: E402
from ivfhnsw_tpu.utils.recall import recall_at_k  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)  # cached branch ignores it
    t0 = time.time()
    s4x, s4q, s4gt, s4meta = bench.build_scale4(key)
    print(f"scale4_eval: loaded cached 268M build in {time.time()-t0:.0f}s",
          flush=True)

    p_ceil4 = os.path.join(bench.CACHE, "scale4", "ceiling.json")
    if os.path.exists(p_ceil4):
        with open(p_ceil4) as f:
            s4ceil = {int(k): v for k, v in json.load(f).items()}
        print(f"scale4_eval: ceiling cached: {s4ceil}", flush=True)
    else:
        t0 = time.time()
        s4ceil = bench.exact_adc_ceiling(
            s4x, s4q, s4gt, ks=(1, 10),
            precision=jax.lax.Precision.HIGH, blk=131_072)
        with open(p_ceil4 + ".tmp", "w") as f:
            json.dump({str(k): v for k, v in s4ceil.items()}, f)
        os.replace(p_ceil4 + ".tmp", p_ceil4)
        print(f"scale4_eval: ceiling in {time.time()-t0:.0f}s: {s4ceil}",
              flush=True)

    sp4 = SearchParams(k=bench.K, nprobe=bench.S3_NPROBE,
                       max_codes=bench.S3_MC)
    dem = int(s4x.scan_slot_demand(s4q, sp4).max())
    sp4 = SearchParams(k=bench.K, nprobe=bench.S3_NPROBE,
                       max_codes=bench.S3_MC,
                       scan_budget=dem * s4x.scan_unit())
    t0 = time.time()
    qps, labels, sl_us = bench.timed_qps(s4x, s4q, sp4, runs=2,
                                         reshape=None, depth=8)
    rec = recall_at_k(labels, s4gt, ks=(1, 10))
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        hbm_gb = round(stats.get("bytes_in_use", 0) / 2**30, 2)
        hbm_cap = round(stats.get("bytes_limit", 0) / 2**30, 2)
    except Exception:
        hbm_gb, hbm_cap = None, None
    out = {
        "scale4_qps_nprobe128_mc100k": round(qps, 1),
        "scale4_us_per_query": round(1e6 / qps, 2),
        "scale4_us_per_query_single_launch": round(sl_us, 2),
        "scale4_pipeline_depth": 8,
        "scale4_recall_at_1": round(rec[1], 4),
        "scale4_recall_at_10": round(rec[10], 4),
        "scale4_ceiling_at_1": round(s4ceil[1], 4),
        "scale4_ceiling_at_10": round(s4ceil[10], 4),
        "scale4_hbm_in_use_gb": hbm_gb,
        "scale4_hbm_limit_gb": hbm_cap,
        "scale4_extend_seconds": s4meta.get("extend_seconds"),
        "scale4_build_seconds": s4meta.get("build_seconds"),
        "timed_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    p_eval = os.path.join(bench.CACHE, "scale4", "eval.json")
    with open(p_eval + ".tmp", "w") as f:
        json.dump(out, f)
    os.replace(p_eval + ".tmp", p_eval)


if __name__ == "__main__":
    main()
