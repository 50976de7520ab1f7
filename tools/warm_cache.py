"""Warm the bench cache for the most expensive stages, in priority order.

The driver's end-of-round bench runs under a wall-clock budget
(bench.py skip_stage): a workspace re-checkout wipes .bench_cache, and a
fresh-cache full run is multi-hour by construction, so the budget would
skip exactly the flagship scale stages (scale3sl, scale4). This tool
rebuilds the cache for those stages ahead of time — the build artifacts
AND the cached ceiling files the stage probes check — so the driver's
run can measure them warm instead of skipping them.

Safe to kill at any point: every completed sub-artifact (centroids,
quantizers, index, groundtruth, ceiling) is persisted and reused on the
next invocation, so repeated runs converge on a fully warm cache.

Usage: python tools/warm_cache.py [stage ...]
  default stage order: scale3sl grouping_scale scale4 scale2 scale3
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _ceiling(idx, q, gt, path, ks=(1, 10, 100)):
    """Compute + cache the exact-ADC ceiling the stage block would."""
    import jax
    if os.path.exists(path):
        return
    bench.log(f"warm: ceiling -> {os.path.basename(os.path.dirname(path))}")
    c = bench.exact_adc_ceiling(idx, q, gt, ks=ks,
                                precision=jax.lax.Precision.HIGH,
                                blk=131_072)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in c.items()}, f)
    os.replace(tmp, path)


def warm(stage: str, key) -> None:
    t0 = time.time()
    bench.log(f"warm: {stage} build ...")
    build = getattr(bench, f"build_{stage}")
    out = build(key)
    idx, q, gt = out[0], out[1], out[2]
    ks = (1, 10) if stage == "scale4" else (1, 10, 100)
    _ceiling(idx, q, gt, os.path.join(bench.CACHE, stage, "ceiling.json"),
             ks=ks)
    idx.release_device()
    del idx, q, gt, out
    gc.collect()
    bench.log(f"warm: {stage} done ({time.time() - t0:.0f}s)")


def main():
    import jax
    stages = sys.argv[1:] or ["scale3sl", "grouping_scale", "scale4",
                              "scale2", "scale3"]
    # Stamp the corpus version like bench main would: without it, the next
    # bench.py run sees a version mismatch and WIPES the warmed cache.
    os.makedirs(bench.CACHE, exist_ok=True)
    pv = os.path.join(bench.CACHE, "corpus_version")
    if not os.path.exists(pv):
        with open(pv, "w") as f:
            f.write(str(bench.CORPUS_VERSION))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for stage in stages:
        warm(stage, key)
    bench.log(f"warm: all done ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
