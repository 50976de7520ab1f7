"""Measured engine crossover: per-query fused kernel vs shared-scan batch
engine on the cached bench index, across operating points.

The batch engine amortizes chunk decode over QB queries via one MXU matmul
(ops/pallas/batch_scan.py) but pays union-sized distance materialization and
top-k per query. This experiment decides, with marginal (dispatch-free)
timings, where — if anywhere — it beats the per-query kernel, so the `auto`
engine policy and the engine's fate rest on numbers instead of a hunch.

Run AFTER bench.py has populated .bench_cache. Stages are small enough for
the standard wedge discipline (health-probe first, outer timeout).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")


def marginal_ms(fn, repeat=4):
    import jax

    def bundle(r):
        outs = [fn() for _ in range(r)]
        jax.block_until_ready(outs)

    bundle(1)
    t0 = time.perf_counter(); bundle(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); bundle(repeat); tr = time.perf_counter() - t0
    return (tr - t1) / (repeat - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams

    D, NC, B = 128, 4096, 1024
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
    idx.load_quantizers(os.path.join(CACHE, "bench.pq"),
                        os.path.join(CACHE, "bench.norm_pq"))
    idx.read(os.path.join(CACHE, "bench.index"))
    queries = np.load(os.path.join(CACHE, "queries.npy"))[:B]
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    points = [
        ("bench point", SearchParams(k=10, nprobe=32, max_codes=10_000)),
        ("wide", SearchParams(k=10, nprobe=128, max_codes=100_000)),
        ("narrow", SearchParams(k=10, nprobe=8, max_codes=0)),
    ]
    for name, p in points:
        # Per-query fused engine, device-resident mega-launch.
        qdev = jnp.asarray(queries)

        def run_pallas():
            return idx.search_device(qdev, p)
        ms_p = marginal_ms(run_pallas)

        line = (f"{name}: nprobe={p.nprobe} mc={p.max_codes}  "
                f"pallas {ms_p*1e3/B:8.2f} us/q")

        for qb in (64, 128, 256):
            idx.engine = "batch"
            idx.batch_qb = qb
            idx.batch_u = None
            idx.batch_nch = None
            idx._c_rank = None

            def run_batch():
                return idx._search_batch(queries, p,
                                         min(p.nprobe, NC), False)
            try:
                ms_b = marginal_ms(run_batch)
                ov = idx.stats.get("batch_overflow", 0)
                line += f"  | batchQB{qb} {ms_b*1e3/B:8.2f} us/q ov={ov}"
            except Exception as e:
                line += f"  | batchQB{qb} FAIL {type(e).__name__}"
            idx.engine = "auto"
        print(line)


if __name__ == "__main__":
    main()
