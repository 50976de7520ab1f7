"""Calibrate SiftLikeDeviceGen's sigma at canonical-geometry ratios.

VERDICT r3 items 2 + 9: the scale3sl stage must land its exact-ADC
recall ceiling@1 INSIDE the paper's SIFT1B band (R@1 0.3-0.45 at the
run_sift1b.sh operating points) at its OWN corpus size — the 2M siftlike
stage's sigma=0.75 overshot to 0.48, and ceilings compress with corpus
density, so the knob must be re-picked at the target density ratios.

Probe geometry holds the two density ratios of the full stage constant
(134M / nc=2^20 = 128 vectors per centroid; 32 vectors per appearance
class) at 1/16 scale: nb=8M, nc=2^16, n_classes=2^18. The winning sigma
feeds bench.py's scale3sl stage; a modest downward drift from probe to
full size is expected and is why the target band here is the UPPER half
of the paper band.

Usage: python tools/siftlike_scale_calibrate.py [sigma ...]
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NB = 8 * 1024 * 1024
NC = 1 << 16
NCLS = 1 << 18
NQ = 256
D = 128
CODE_SIZE = 128  # 16-byte PQ codes, the reference's sift1b operating point


def probe(sigma: float) -> float:
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    from ivfhnsw_tpu.utils.siftlike import SiftLikeDeviceGen
    import bench

    t0 = time.time()
    gen = SiftLikeDeviceGen(n_classes=NCLS, sigma=sigma, seed=0)
    cfg = IndexConfig(d=D, nc=NC, code_size=CODE_SIZE)
    idx = IVFADCIndex(cfg)

    learn = np.asarray(gen.batch_device(jr.PRNGKey(1), 2_097_152))
    idx.train_centroids(jr.PRNGKey(2), learn, niter=4)
    idx.train_pq(jr.PRNGKey(3), learn[:262_144])
    del learn
    print(f"  sigma={sigma}: trained ({time.time()-t0:.0f}s)", flush=True)

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
    print(f"  sigma={sigma}: built {NB} ({time.time()-t0:.0f}s)",
          flush=True)

    ceil = bench.exact_adc_ceiling(idx, queries, best_l, ks=(1, 10),
                                   precision=hp, blk=131_072)
    idx.release_device()
    print(f"  sigma={sigma}: ceiling@1={ceil[1]:.4f} ceiling@10="
          f"{ceil[10]:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return ceil[1]


def main():
    sigmas = ([float(a) for a in sys.argv[1:]]
              or [0.75, 0.95, 1.15])
    print(f"probe: nb={NB} nc={NC} n_classes={NCLS} "
          f"(ratios of the 134M/2^20/2^22 target)", flush=True)
    for s in sigmas:
        r = probe(s)
        print(f"RESULT sigma={s} ceiling_at_1={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
