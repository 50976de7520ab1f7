"""Calibrate the SIFT-like corpus's sigma so the exact-ADC recall ceiling
at 16-byte codes lands in the paper's SIFT1B band (R@1 = 0.3-0.45 —
reference operating points, examples/run_sift1b.sh:38-44).

For each sigma: build a small IVFADC index (geometry-scaled: 512k vectors,
nc=2048, PQ16), compute exact groundtruth for held-out queries, and report
the exact-ADC ceiling (bench.exact_adc_ceiling = brute force over all PQ
reconstructions). The chosen sigma is hard-coded in
ivfhnsw_tpu/utils/siftlike.py and used by the bench's `siftlike` stage.

Usage: python tools/siftlike_calibrate.py [sigma ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ivfhnsw_tpu import IVFADCIndex, IndexConfig  # noqa: E402
from ivfhnsw_tpu.ops.distances import streaming_topk_l2  # noqa: E402
from ivfhnsw_tpu.utils.siftlike import SiftLikeCorpus  # noqa: E402

NB, NQ, NC = 512_000, 1024, 2048


def ceiling_for(sigma: float) -> dict:
    corpus = SiftLikeCorpus(n_classes=16384, sigma=sigma, seed=1)
    base = np.concatenate([corpus.batch(64_000, seed=100 + i)
                           for i in range(NB // 64_000)])
    queries = corpus.batch(NQ, seed=999)          # held out
    key = jax.random.PRNGKey(0)
    idx = IVFADCIndex(IndexConfig(d=128, nc=NC, code_size=16))
    idx.train_centroids(key, base[:300_000], niter=8)
    idx.train_pq(key, base[:65_536])
    idx.add_batch(base, np.arange(NB, dtype=np.int32))
    idx.finalize()
    _, gt = streaming_topk_l2(jnp.asarray(queries), jnp.asarray(base), 1,
                              block=131_072,
                              precision=jax.lax.Precision.HIGHEST)
    gt = np.asarray(gt)
    return bench.exact_adc_ceiling(idx, queries, gt, ks=(1, 10))


def main():
    sigmas = [float(a) for a in sys.argv[1:]] or [0.35, 0.55, 0.75]
    for s in sigmas:
        c = ceiling_for(s)
        print(f"sigma={s}: ceiling@1={c[1]:.4f} ceiling@10={c[10]:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
