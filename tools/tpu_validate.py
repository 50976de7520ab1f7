"""Staged TPU validation runner.

Runs each validation stage in its OWN subprocess with a timeout, with a
device health check between stages — a bad Pallas kernel can wedge the
remote TPU runtime for ~20+ minutes, so stages escalate from known-good to
experimental and the runner stops at the first wedge instead of burning the
device repeatedly.

Usage: python tools/tpu_validate.py [stage ...]
Stages: health pallas grouping grouping_quad canonical bench
(default: health pallas grouping grouping_quad bench, in that order)
"""

from __future__ import annotations

import subprocess
import sys
import time

HEALTH = """
import jax, jax.numpy as jnp
print('health ok:', float(jnp.sum(jnp.ones((10,10)))))
"""

PALLAS_SMALL = """
import numpy as np, jax
from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
rng = np.random.RandomState(9)
base = rng.randn(9000, 32).astype(np.float32)
queries = rng.randn(24, 32).astype(np.float32)
idx = IVFADCIndex(IndexConfig(d=32, nc=64, code_size=8))
key = jax.random.PRNGKey(0)
idx.train_centroids(key, base[:4000], niter=8)
idx.train_pq(key, base[:4000], pq_niter=8)
idx.add_batch(base); idx.finalize()
p = SearchParams(k=10, nprobe=8, max_codes=0)
idx.engine = "xla"; d1, l1 = idx.search(queries, p)
idx.engine = "pallas"; d2, l2 = idx.search(queries, p)
assert np.allclose(d1, d2, rtol=1e-4, atol=1e-2), "pallas mismatch"
print("pallas per-query kernel OK, label agreement", float((l1==l2).mean()))
"""

GROUPING = """
import numpy as np, jax
from ivfhnsw_tpu import IVFADCGroupingIndex, IndexConfig, SearchParams
rng = np.random.RandomState(3)
nb, d = 20000, 32
centers = rng.randn(50, d).astype(np.float32) * 5
base = centers[rng.randint(0, 50, nb)] + rng.randn(nb, d).astype(np.float32)
queries = centers[rng.randint(0, 50, 64)] + rng.randn(64, d).astype(np.float32)
idx = IVFADCGroupingIndex(IndexConfig(d=d, nc=64, code_size=8, nsubc=16))
key = jax.random.PRNGKey(0)
idx.train_centroids(key, base[:6000], niter=8)
idx.compute_neighbor_centroids()
idx.train_pq(key, base[:4000])
idx.add(base); idx.finalize()
for prune in (False, True):
    p = SearchParams(k=10, nprobe=8, max_codes=2000, do_pruning=prune)
    idx.engine = "xla"; d1, l1 = idx.search(queries, p)
    idx.engine = "pallas"; d2, l2 = idx.search(queries, p)
    assert np.allclose(d1, d2, rtol=1e-4, atol=1e-2), f"grouping mismatch prune={prune}"
    print(f"grouping kernel OK (pruning={prune})")
"""

GROUPING_QUAD = """
import numpy as np, jax
from ivfhnsw_tpu import IVFADCGroupingIndex, IndexConfig, SearchParams
rng = np.random.RandomState(3)
nb, d = 40000, 32
centers = rng.randn(50, d).astype(np.float32) * 5
base = centers[rng.randint(0, 50, nb)] + rng.randn(nb, d).astype(np.float32)
queries = centers[rng.randint(0, 50, 64)] + rng.randn(64, d).astype(np.float32)
idx = IVFADCGroupingIndex(IndexConfig(d=d, nc=64, code_size=8, nsubc=16))
key = jax.random.PRNGKey(0)
idx.train_centroids(key, base[:6000], niter=8)
idx.compute_neighbor_centroids()
idx.train_pq(key, base[:4000])
idx.add(base); idx.finalize()
idx.scan_layout = "quad"
for prune in (False, True):
    p = SearchParams(k=10, nprobe=8, max_codes=2000, do_pruning=prune)
    idx.engine = "xla"; d1, l1 = idx.search(queries, p)
    idx.engine = "pallas"; d2, l2 = idx.search(queries, p)
    assert np.allclose(d1, d2, rtol=1e-4, atol=1e-2), f"grouping QUAD mismatch prune={prune}"
    print(f"grouping QUAD kernel OK (pruning={prune})")
"""


CANONICAL = """
# Canonical reference geometry (examples/run_sift1b_grouping_OPQ.sh:39-48):
# nc=2^20 centroids, nprobe=210, max_codes=100k, d=128, PQ16. Centroids are
# random (the search path does not care how they were trained) and the store
# holds 8M codes over 1M lists (~8/list, billion-scale list-length ratio is
# irrelevant here — what this validates is the 2^20-row coarse sweep, the
# [B, nch] SMEM schedule at nch~600, scan-window sizing, and the fused
# kernel end-to-end at the canonical operating point, vs the XLA oracle).
import time
import numpy as np, jax, jax.numpy as jnp
from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
rng = np.random.RandomState(11)
nc, d, n, M = 1 << 20, 128, 8_000_000, 16
idx = IVFADCIndex(IndexConfig(d=d, nc=nc, code_size=M))
idx.set_centroids(rng.randn(nc, d).astype(np.float32))
idx.pq.codebooks = jnp.asarray(rng.randn(M, 256, d // M).astype(np.float32))
idx.norm_pq.centroids = jnp.asarray(
    np.sort(rng.rand(256).astype(np.float32)) * 100)
# Populate every other list: each nonempty list costs one aligned tile
# (6 KB), so all-2^20 would need 6.3 GB of tiles on a 16 GB chip alongside
# the XLA oracle's arrays; half keeps HBM comfortable while queries still
# mix empty and nonempty probes.
keys = (rng.randint(0, nc // 2, n) * 2).astype(np.int32)
idx.builder.add(keys, np.arange(n, dtype=np.int32),
                rng.randint(0, 256, (n, M), dtype=np.uint8),
                rng.randint(0, 256, n, dtype=np.uint8))
idx.store = idx.builder.finalize()
B = 128
q = rng.randn(B, d).astype(np.float32)
p = SearchParams(k=10, nprobe=210, max_codes=100_000)
t0 = time.time()
idx.engine = "pallas"; d2, l2 = idx.search(q, p)
t_first = time.time() - t0
t0 = time.time()
d2, l2 = idx.search(q, p)
t_warm = time.time() - t0
idx.engine = "xla"; d1, l1 = idx.search(q, p)
assert np.allclose(d1, d2, rtol=1e-4, atol=1e-2), "canonical mismatch"
print(f"canonical nc=2^20 nprobe=210 mc=100k OK: label agreement "
      f"{float((l1==l2).mean()):.4f}, warm {t_warm*1e6/B:.0f} us/q "
      f"(compile+run {t_first:.0f}s)")
"""

STAGES = {
    "health": (HEALTH, 300),  # device-claim handover right after another
                              # process exits has exceeded 180s (r4)
    "pallas": (PALLAS_SMALL, 420),
    "grouping": (GROUPING, 420),
    "grouping_quad": (GROUPING_QUAD, 420),
    "canonical": (CANONICAL, 900),
}


def run_stage(name: str) -> bool:
    if name == "bench":
        cmd = [sys.executable, "bench.py"]
        timeout = 600
    else:
        code, timeout = STAGES[name]
        cmd = [sys.executable, "-c", code]
    print(f"===== stage: {name} =====", flush=True)
    try:
        r = subprocess.run(cmd, timeout=timeout, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        print(f"stage {name}: TIMEOUT (likely device wedge) — stopping")
        return False
    out = (r.stdout + r.stderr)
    for line in out.splitlines():
        if "WARNING" not in line:
            print(" ", line)
    if r.returncode != 0:
        print(f"stage {name}: FAILED rc={r.returncode} — stopping")
        return False
    # inter-stage health gate (device claim handover right after a heavy
    # process exits can take a while — retry once with a longer window).
    if name != "health":
        # Generous windows: a probe killed mid device-claim is itself a
        # wedge cause, and claim handover alone can take 60-120s.
        for attempt, t in ((0, 300), (1, 480)):
            try:
                h = subprocess.run([sys.executable, "-c", HEALTH],
                                   timeout=t, capture_output=True, text=True)
                if h.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            print(f"health gate attempt {attempt} failed after {name}; "
                  f"{'retrying' if attempt == 0 else 'stopping'}")
        print(f"DEVICE WEDGED after stage {name} — stopping")
        return False
    return True


def main():
    stages = sys.argv[1:] or ["health", "pallas", "grouping",
                              "grouping_quad", "bench"]
    t0 = time.time()
    for s in stages:
        if not run_stage(s):
            sys.exit(1)
    print(f"ALL STAGES PASSED in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
