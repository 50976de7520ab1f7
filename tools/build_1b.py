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
    # NEVER from smoke/CI runs: a tiny-target rehearsal must not clobber
    # the real 1B record (it did once — this guard is the fix).
    if not partial and not bench.SMOKE and target >= 100_000_000:
        p2 = os.path.join(bench.ROOT, "RESULTS_1B.json")
        # Monotone in processed: a bounded sub-1B run (e.g. a wall-clock
        # -bounded --target with a groundtruth catch-up rerun) must not
        # displace a fuller committed record (it did once — round-5
        # catch-up at 398M overwrote the round-3 full-1B record).
        prior = 0
        if os.path.exists(p2):
            try:
                with open(p2) as f:
                    prior = json.load(f).get("processed", 0)
            except (json.JSONDecodeError, OSError):
                pass
        if processed >= prior:
            with open(p2 + ".tmp", "w") as f:
                json.dump(out, f, indent=1)
            os.replace(p2 + ".tmp", p2)


def main():
    bench.force_cpu_backend()   # honor BENCH_FORCE_CPU (CI smoke runs
                                # must not block on a busy real chip)
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=1_000_000_000)
    ap.add_argument("--batch", type=int, default=2_097_152)
    ap.add_argument("--workdir",
                    default=os.path.join(bench.CACHE, "build1b"))
    args = ap.parse_args()

    sdir = os.path.join(bench.CACHE, "scale3")
    os.makedirs(sdir, exist_ok=True)
    p_cent = os.path.join(sdir, "centroids.npy")
    p_pq = os.path.join(sdir, "scale3.pq")
    p_npq = os.path.join(sdir, "scale3.norm_pq")

    idx = IVFADCIndex(IndexConfig(d=bench.D, nc=bench.S3_NC,
                                  code_size=bench.CODE_SIZE))
    gen_dev, _release = bench.make_scale3_gen()
    prereq_s = 0.0
    if not all(os.path.exists(p) for p in (p_cent, p_pq, p_npq)):
        # Self-build the model prerequisites with build_scale3's exact
        # recipe, PRNG keys, and artifact paths (bench.py build_scale3) —
        # a later scale3 bench stage resumes from these same checkpoints,
        # and a cache wipe (this round's case: only scale3sl survived)
        # no longer blocks the 1B build on running a full scale3 stage.
        t_pre = time.time()
        key = jax.random.PRNGKey(0)
        n_sup = min(2048, bench.S3_NC // 4)
        if os.path.exists(p_cent):
            idx.set_centroids(np.load(p_cent))
        else:
            from ivfhnsw_tpu.ops.kmeans import hierarchical_seed
            from ivfhnsw_tpu.ops.hierarchical import TwoLevelAssigner
            learn = np.asarray(gen_dev(jr.PRNGKey(85),
                                       min(8_388_608, bench.S3_NB)))
            p_seeds = os.path.join(sdir, "seeds.npy")
            if os.path.exists(p_seeds):
                seeds = np.load(p_seeds)
                print("resuming from checkpointed seeds", flush=True)
            else:
                print(f"hierarchical seeding k={bench.S3_NC} ...",
                      flush=True)
                seeds = hierarchical_seed(key, learn, bench.S3_NC)
                np.save(p_seeds, np.asarray(seeds))
            cents = seeds
            for it in range(2):
                assigner = TwoLevelAssigner(cents, n_super=n_sup, w=4,
                                            key=jr.PRNGKey(90 + it))
                keys_l = assigner.assign(learn)
                sums = np.zeros((bench.S3_NC, bench.D), np.float64)
                np.add.at(sums, keys_l, learn.astype(np.float64))
                counts = np.bincount(
                    keys_l, minlength=bench.S3_NC).astype(np.int64)
                nz = counts > 0
                cents = np.asarray(cents).copy()
                cents[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
                print(f"Lloyd iter {it} done ({int(nz.sum())} non-empty, "
                      f"{time.time()-t_pre:.0f}s)", flush=True)
            idx.set_centroids(cents)
            np.save(p_cent, cents)
            if os.path.exists(p_seeds):
                os.remove(p_seeds)
            with open(os.path.join(sdir, "build_progress.json"), "w") as f:
                json.dump({"centroid_seconds":
                           round(time.time() - t_pre, 1)}, f)
            del learn, seeds, cents
        if os.path.exists(p_pq):
            idx.load_quantizers(p_pq, p_npq)
        else:
            learn = np.asarray(gen_dev(jr.PRNGKey(86),
                                       min(262_144, bench.S3_NB)))
            print("training PQ ...", flush=True)
            idx.train_pq(key, learn)
            idx.save_quantizers(p_pq, p_npq)
            del learn
        prereq_s = time.time() - t_pre
        print(f"prerequisites ready in {prereq_s:.0f}s", flush=True)
    else:
        idx.set_centroids(np.load(p_cent))
        idx.load_quantizers(p_pq, p_npq)

    meta_p = os.path.join(args.workdir, "meta.json")
    meta = {"resumes": 0, "drift_series": [], "seconds_so_far": 0.0}
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
    if prereq_s:
        meta["prereq_seconds"] = round(
            meta.get("prereq_seconds", 0.0) + prereq_s, 1)
    print("routed assigner setup + match gate ...", flush=True)
    idx.enable_fast_assign(w=4, n_super=min(2048, bench.S3_NC // 4),
                           key=jr.PRNGKey(95))
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

    # --- In-stream exact groundtruth for the 1B SEARCH (VERDICT r4 item
    # 5): 1024 held-out queries (disjoint key domain, never inserted),
    # top-1 merged per batch exactly as build_scale3sl does. The gt state
    # checkpoints beside the cursor; a resumed run first catches up any
    # batches the spill committed but the gt merge didn't (regeneration
    # is deterministic per batch key).
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    NQ_GT = 1024
    hi = jax.lax.Precision.HIGH
    p_q = os.path.join(args.workdir, "queries.npy")
    p_gtl = os.path.join(args.workdir, "gt.npy")
    p_gtd = os.path.join(args.workdir, "gt_d.npy")
    p_gts = os.path.join(args.workdir, "gt_state.json")
    if os.path.exists(p_q):
        queries = np.load(p_q)
    else:
        queries = np.asarray(gen_dev(jr.PRNGKey(999_555), NQ_GT))
        np.save(p_q, queries)
    qj = jnp.asarray(queries)
    gt_done = 0
    best_d = np.full((NQ_GT, 1), np.inf, np.float32)
    best_l = np.full((NQ_GT, 1), -1, np.int64)
    if os.path.exists(p_gts):
        with open(p_gts) as f:
            gt_done = int(json.load(f)["batches"])
        best_d, best_l = np.load(p_gtd), np.load(p_gtl)

    def gt_merge(blk, off):
        d_, i_ = streaming_topk_l2(qj, blk, 1, block=131_072, precision=hi)
        d_, i_ = np.asarray(d_), np.asarray(i_) + off
        upd = d_[:, 0] < best_d[:, 0]
        best_d[upd] = d_[upd]
        best_l[upd] = i_[upd]

    def gt_checkpoint(batches):
        np.save(p_gtd, best_d)
        np.save(p_gtl, best_l)
        with open(p_gts + ".tmp", "w") as f:
            json.dump({"batches": batches, "nq": NQ_GT}, f)
        os.replace(p_gts + ".tmp", p_gts)

    committed_batches = build.processed // bs
    if gt_done < committed_batches:
        print(f"gt catch-up: merging batches {gt_done}..."
              f"{committed_batches - 1} (spill is ahead of gt)", flush=True)
        for bi in range(gt_done, committed_batches):
            off = bi * bs
            n = min(bs, args.target - off)
            gt_merge(gen_dev(jr.PRNGKey(SEED_BASE + bi), n), off)
        gt_checkpoint(committed_batches)
        gt_done = committed_batches

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
        gt_merge(blk, build.processed)
        build.add_precomputed(np.asarray(keys), xids, np.asarray(codes),
                              np.asarray(ncodes))
        gt_done = build.processed // bs
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
            gt_checkpoint(gt_done)
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
    gt_checkpoint(gt_done)
    # Persist the final elapsed: a later same-target rerun (the clean
    # "catch up groundtruth, republish" invocation) resumes with
    # base_s = the true build cost instead of 0 and publishes an honest
    # vectors_per_sec.
    meta["seconds_so_far"] = round(total_s, 1)
    meta["gt_nq"] = NQ_GT
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
