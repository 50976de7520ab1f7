"""Exact-NN self-test driver.

Equivalent of `test_ivfhnsw_sift1b_enn` / `test_ivfhnsw_sift1b_orca_enn`
(/root/reference/tests/test_ivfhnsw_sift1b_enn.cpp:27-44): queries are the
stored base vectors themselves, groundtruth is the identity, nprobe=1 —
a stored vector must find itself. Needs no groundtruth file.
"""

from __future__ import annotations

import jax
import numpy as np

from ivfhnsw_tpu import IVFADCIndex
from ivfhnsw_tpu.drivers import common as C


def main() -> float:
    cfg, extras = C.parse_driver_args(("synthetic",))
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)
    index = IVFADCIndex(cfg.index)
    key = jax.random.PRNGKey(0)
    C.setup_quantizer(index, cfg, ds, key)
    C.setup_pq(index, cfg, ds, key)
    idxs = C.load_or_assign(index, cfg, ds)
    C.build_or_read_index(index, cfg, ds, idxs)

    nq = min(cfg.nq or 10_000, ds.total_base)
    _, first = next(ds.base_batches())
    queries = first[:nq]
    w = C.StopW()
    dists, labels = index.search_enn(queries)
    dt = w.getElapsedTimeMicro()
    rate = float((labels == np.arange(labels.shape[0])).mean())
    C.log(f"Recall@1: {rate:.4f}")
    C.log(f"Time per query: {dt / nq:.1f} us")
    return rate


if __name__ == "__main__":
    main()
