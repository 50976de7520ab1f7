"""Integrated quad-engine validation on the real TPU: compare the full
fused search (search_device) under scan_layout = chunk vs quad on the cached
primary bench index — results must agree (up to exact-distance label ties)
and quad should be faster end-to-end."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams  # noqa: E402


def main():
    NQ, D, NC = 8192, 128, 4096
    B = 1024
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    idx = IVFADCIndex(IndexConfig(d=D, nc=NC, code_size=16))
    idx.set_centroids(np.load(os.path.join(CACHE, "centroids.npy")))
    idx.load_quantizers(os.path.join(CACHE, "bench.pq"),
                        os.path.join(CACHE, "bench.norm_pq"))
    idx.read(os.path.join(CACHE, "bench.index"))
    params = SearchParams(k=10, nprobe=32, max_codes=10_000)
    queries = np.load(os.path.join(CACHE, "queries.npy"))[:NQ]
    # Distinct buffers per launch: the dev tunnel reuses results for
    # byte-identical inputs, faking the timing (see bench.py).
    qdevs = [jnp.asarray(np.roll(queries, r, axis=0).reshape(-1, B, D))
             for r in range(4)]
    q = qdevs[0]

    out = {}
    for layout in ("chunk", "quad"):
        idx.scan_layout = layout
        d, l = jax.block_until_ready(idx.search_device(q, params))
        for r in range(1, 4):  # compile-warm every buffer
            jax.block_until_ready(idx.search_device(qdevs[r], params))
        ts = []
        for r in range(6):
            t0 = time.perf_counter()
            dr, _ = idx.search_device(qdevs[r % 4], params)
            np.asarray(dr)  # force full sync incl. transfer
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{layout}: {best * 1e6 / NQ:.2f} us/q  ({NQ / best:.0f} QPS)  "
              f"runs: {[f'{t * 1e6 / NQ:.1f}' for t in ts]}")
        # Sustained: fresh buffers every launch (defeats result reuse),
        # block once per depth-8 round.
        sus = float("inf")
        for round_ in range(2):
            qs = [jnp.asarray(np.roll(queries, 17 * round_ + r + 5, axis=0)
                              .reshape(-1, B, D)) for r in range(8)]
            for qq in qs:
                qq.block_until_ready()
            t0 = time.perf_counter()
            outs = [idx.search_device(qq, params) for qq in qs]
            last = np.asarray(outs[-1][0])
            jax.block_until_ready(outs)
            sus = min(sus, (time.perf_counter() - t0) / 8)
        print(f"{layout} sustained x8: {sus * 1e6 / NQ:.2f} us/q "
              f"({NQ / sus:.0f} QPS)")
        out[layout] = (np.asarray(d).reshape(NQ, -1),
                       np.asarray(l).reshape(NQ, -1))

    dc, lc = out["chunk"]
    dq, lq = out["quad"]
    ok = np.allclose(dc, dq, rtol=1e-4, atol=1e-3)
    mism = lc != lq
    ties = np.allclose(dc[mism], dq[mism], rtol=1e-4, atol=1e-3)
    print(f"dists match: {ok}; label mismatches {mism.sum()} "
          f"(all exact ties: {ties})")
    if not (ok and ties):
        sys.exit(1)


if __name__ == "__main__":
    main()
