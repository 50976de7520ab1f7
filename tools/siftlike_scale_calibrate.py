"""Calibrate SiftLikeDeviceGen's sigma at canonical-geometry ratios.

VERDICT r3 items 2 + 9: the scale3sl stage must land its exact-ADC
recall ceiling@1 INSIDE the paper's SIFT1B band (R@1 0.3-0.45 at the
run_sift1b.sh operating points) at its OWN corpus size — the 2M siftlike
stage's sigma=0.75 overshot to 0.48, and ceilings compress with corpus
density, so the knob must be re-picked at the target density ratios.

Probe geometry holds the density ratios of the full stage constant at
1/16 scale: nb=8M, nc=2^16; the sweep is over (sigma, n_classes, skew).

CONCLUSION (2026-08-19, full sweep): every generator knob is INSENSITIVE
at 128 codes/list — n_classes 2^18/2^20/2^21 -> ceiling@1
0.96/0.97/0.98; Zipf skew 3/5 -> 0.98/0.97; sigma 0.75/1.1/1.4 ->
0.97/0.96/0.95. The ceiling is set by nb/nc (the coarse residual
magnitude 16-byte PQ must encode): the same generator family measures
~0.48-0.50 at 256-488 codes/list (tools/siftlike_calibrate.py, the 2M
siftlike stage) and ~0.96 at 128/list. The paper's R@1 0.3-0.45 band is
therefore a 1B-density phenomenon (954 codes/list at nc=2^20), not a
descriptor-statistics one; scale3sl keeps SIFT-faithful defaults and
scale4 (256/list) measures the next density point toward the band.

Usage: python tools/siftlike_scale_calibrate.py [sigma:n_classes:skew ...]
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NB = 8 * 1024 * 1024
NC = 1 << 16
NQ = 256
D = 128
CODE_SIZE = 128  # 16-byte PQ codes, the reference's sift1b operating point


def probe(sigma: float, ncls: int, skew: float) -> float:
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    from ivfhnsw_tpu.utils.siftlike import SiftLikeDeviceGen
    import bench

    t0 = time.time()
    gen = SiftLikeDeviceGen(n_classes=ncls, sigma=sigma, seed=0,
                            skew=skew)
    cfg = IndexConfig(d=D, nc=NC, code_size=CODE_SIZE)
    idx = IVFADCIndex(cfg)

    learn = np.asarray(gen.batch_device(jr.PRNGKey(1), 2_097_152))
    idx.train_centroids(jr.PRNGKey(2), learn, niter=4)
    idx.train_pq(jr.PRNGKey(3), learn[:262_144])
    del learn
    print(f"  sigma={sigma} ncls={ncls} skew={skew}: trained ({time.time()-t0:.0f}s)", flush=True)

    # Queries HELD OUT via a disjoint key domain (same generative process,
    # never inserted).
    queries = np.asarray(gen.batch_device(jr.PRNGKey(999_999), NQ))
    qj = jnp.asarray(queries)
    hp = jax.lax.Precision.HIGH
    best_d = np.full((NQ, 1), np.inf, np.float32)
    best_l = np.full((NQ, 1), -1, np.int64)
    bs = 1_048_576
    for bi, off in enumerate(range(0, NB, bs)):
        blk = gen.batch_device(jr.PRNGKey(10_000 + bi), min(bs, NB - off))
        idx.add_batch_device(blk, np.arange(off, off + blk.shape[0],
                                            dtype=np.int32))
        d_, i_ = streaming_topk_l2(qj, blk, 1, block=131_072, precision=hp)
        d_, i_ = np.asarray(d_), np.asarray(i_) + off
        upd = d_[:, 0] < best_d[:, 0]
        best_d[upd] = d_[upd]
        best_l[upd] = i_[upd]
    idx.finalize()
    gen.release()
    print(f"  sigma={sigma} ncls={ncls} skew={skew}: built {NB} ({time.time()-t0:.0f}s)",
          flush=True)

    ceil = bench.exact_adc_ceiling(idx, queries, best_l, ks=(1, 10),
                                   precision=hp, blk=131_072)
    idx.release_device()
    print(f"  sigma={sigma} ncls={ncls} skew={skew}: ceiling@1={ceil[1]:.4f} ceiling@10="
          f"{ceil[10]:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return ceil[1]


def main():
    specs = []
    for a in (sys.argv[1:] or ["0.75:1048576:3"]):
        parts = a.split(":")
        specs.append((float(parts[0]), int(parts[1]),
                      float(parts[2]) if len(parts) > 2 else 1.0))
    print(f"probe: nb={NB} nc={NC} sweep={specs}", flush=True)
    for s, n, sk in specs:
        r = probe(s, n, sk)
        print(f"RESULT sigma={s} n_classes={n} skew={sk} "
              f"ceiling_at_1={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
