"""Billion-vector assign+encode on ONE chip — the "hours, not days" run.

The reference needs 2-3 DAYS just to assign 1B base points to 2^20
centroids on CPU (/root/reference/README.md:65). This driver measures the
TPU-native replacement end-to-end at the reference's exact geometry
(nc=2^20, ~953 codes/list at 1B):

  device-side corpus generation (bench.make_scale3_gen — deterministic per
  batch, so a resumed run regenerates identical bytes)
    -> routed two-level assignment at nc=2^20 (ops.hierarchical, with the
       pre-build exact-match gate AND in-stream drift monitoring)
    -> device-resident PQ encode (IVFADCIndex._encode_batch)
    -> crash-safe spill via StreamedIndexBuild.add_precomputed (write-ahead
       spill files + atomic cursor; ~21 B/vector -> ~21 GB at 1B).

Kill it mid-run and rerun: it resumes from the committed cursor (the
resume event is recorded in the meta). On completion it writes
.bench_cache/build1b.json with {target, processed, build_seconds,
vectors_per_sec, resumes, drift_series, match_rate}; bench.py reports
those fields without ever re-running the build.

Usage:
    python tools/build_1b.py [--target 1000000000] [--batch 2097152]
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
from ivfhnsw_tpu import IVFADCIndex, IndexConfig  # noqa: E402
from ivfhnsw_tpu.parallel import make_mesh  # noqa: E402
from ivfhnsw_tpu.parallel.pipeline import StreamedIndexBuild  # noqa: E402

SEED_BASE = 5000   # disjoint from scale3's batch seeds (2000+)


def _publish(meta, processed: int, target: int, seconds: float,
             partial: bool) -> None:
    """Write the bench-visible artifact atomically with current totals."""
    out = dict(meta)
    out.update({
        "target": target,
        "processed": processed,
        "build_seconds": round(seconds, 1),
        "vectors_per_sec": round(processed / max(seconds, 1e-9), 1),
        "fraction_of_1b": round(processed / 1e9, 4),
        "partial": partial,
    })
    p = os.path.join(bench.CACHE, "build1b.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, p)
    # Mirror completed runs to the committed RESULTS_1B.json so the record
    # survives workspace re-checkouts that wipe .bench_cache (bench.py
    # falls back to it, labeled build_1b_source='committed-record').
    if not partial:
        p2 = os.path.join(bench.ROOT, "RESULTS_1B.json")
        with open(p2 + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(p2 + ".tmp", p2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=1_000_000_000)
    ap.add_argument("--batch", type=int, default=2_097_152)
    ap.add_argument("--workdir",
                    default=os.path.join(bench.CACHE, "build1b"))
    args = ap.parse_args()

    sdir = os.path.join(bench.CACHE, "scale3")
    p_cent = os.path.join(sdir, "centroids.npy")
    p_pq = os.path.join(sdir, "scale3.pq")
    p_npq = os.path.join(sdir, "scale3.norm_pq")
    for p in (p_cent, p_pq, p_npq):
        if not os.path.exists(p):
            sys.exit(f"missing scale3 artifact {p} — run the scale3 bench "
                     "stage first (its centroids/PQ are this build's model)")

    idx = IVFADCIndex(IndexConfig(d=bench.D, nc=bench.S3_NC,
                                  code_size=bench.CODE_SIZE))
    idx.set_centroids(np.load(p_cent))
    idx.load_quantizers(p_pq, p_npq)

    meta_p = os.path.join(args.workdir, "meta.json")
    meta = {"resumes": 0, "drift_series": [], "seconds_so_far": 0.0}
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)

    gen_dev, _release = bench.make_scale3_gen()
    print("routed assigner setup + match gate ...", flush=True)
    idx.enable_fast_assign(w=4, n_super=2048, key=jr.PRNGKey(95))
    sample = np.asarray(gen_dev(jr.PRNGKey(97), 8192))
    exact_keys = idx._assign_device_exact(jnp.asarray(sample))
    match = float((idx._fast_assigner.assign(sample) == exact_keys).mean())
    meta["match_rate"] = round(match, 4)
    print(f"routed exact-match rate = {match:.4f}", flush=True)
    if match < 0.98:
        sys.exit("match rate below gate; refusing routed 1B build")

    build = StreamedIndexBuild(idx, make_mesh(1), args.workdir)
    if build.processed > 0:
        meta["resumes"] += 1
        print(f"RESUME from committed cursor: {build.processed} vectors "
              f"(resume #{meta['resumes']})", flush=True)

    bs = args.batch
    if build.processed % bs:
        sys.exit("cursor not batch-aligned; was --batch changed?")
    t0 = time.time()
    base_s = meta.get("seconds_so_far", 0.0)
    done0 = build.processed
    last_log = t0
    use_routed = not meta.get("routed_abandoned", False)
    while build.processed < args.target:
        bi = build.processed // bs
        n = min(bs, args.target - build.processed)
        blk = gen_dev(jr.PRNGKey(SEED_BASE + bi), n)
        if use_routed:
            keys = idx._fast_assigner.assign_device(blk)
        else:
            keys = jnp.asarray(idx._assign_device_exact(blk))
        codes, ncodes = idx._encode_batch(blk, jnp.asarray(keys))
        xids = np.arange(build.processed, build.processed + n,
                         dtype=np.int32)
        build.add_precomputed(np.asarray(keys), xids, np.asarray(codes),
                              np.asarray(ncodes))
        if use_routed and bi % 32 == 0:
            samp = blk[:1024]
            ek = idx._assign_device_exact(samp)
            rk = idx._fast_assigner.assign_device(samp)
            rate = float((np.asarray(rk) == ek).mean())
            meta["drift_series"].append(
                {"batch": bi, "match_rate": round(rate, 4)})
            if rate < 0.98:
                # Same policy as the scale3 bench stage: a drifting router
                # must not misassign the rest of a multi-hour run — switch
                # to exact assignment and record the abandonment.
                use_routed = False
                meta["routed_abandoned"] = True
                meta["routed_abandoned_at_batch"] = bi
                print(f"drift {rate:.4f} < 0.98 gate at batch {bi}; "
                      "falling back to EXACT assignment", flush=True)
        if time.time() - last_log > 60:
            el = time.time() - t0
            rate_v = (build.processed - done0) / el
            eta = (args.target - build.processed) / max(rate_v, 1)
            print(f"{build.processed/1e6:.0f}M / {args.target/1e6:.0f}M  "
                  f"{rate_v/1e6:.2f}M vec/s  eta {eta/3600:.2f}h",
                  flush=True)
            last_log = time.time()
            meta["seconds_so_far"] = round(base_s + el, 1)
            with open(meta_p, "w") as f:
                json.dump(meta, f)
            # Publish the in-flight fraction so a run cut short by the
            # round boundary still reports honest partial progress
            # (bench.py only reads this artifact, never runs the build).
            _publish(meta, build.processed, args.target, base_s + el,
                     partial=True)

    el = time.time() - t0
    total_s = base_s + el
    meta["spill_bytes"] = sum(
        os.path.getsize(os.path.join(args.workdir, n))
        for n in os.listdir(args.workdir))
    _publish(meta, build.processed, args.target, total_s, partial=False)
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    build.close()
    print(f"DONE: {build.processed} vectors in {total_s:.0f}s "
          f"({build.processed/total_s:.0f} vec/s)", flush=True)


if __name__ == "__main__":
    main()
