"""Grouping(+Pruning) build + eval driver.

Equivalent of `test_ivfhnsw_grouping_sift1b` / `test_ivfhnsw_grouping_deep1b`
(/root/reference/tests/test_ivfhnsw_grouping_sift1b.cpp): group construction
with subcentroids + alphas, compute_inter_centroid_dists, then the timed
query loop with optional pruning (-do_pruning on).
"""

from __future__ import annotations

import jax

from ivfhnsw_tpu import IVFADCGroupingIndex
from ivfhnsw_tpu.drivers import common as C


def build(cfg, extras):
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)
    index = IVFADCGroupingIndex(cfg.index)
    key = jax.random.PRNGKey(0)
    C.setup_quantizer(index, cfg, ds, key)
    index.compute_neighbor_centroids()
    C.setup_pq(index, cfg, ds, key)
    idxs = C.load_or_assign(index, cfg, ds)
    C.build_or_read_index(index, cfg, ds, idxs, grouping=True)
    return index, ds


def main() -> dict:
    cfg, extras = C.parse_driver_args(("synthetic",))
    index, ds = build(cfg, extras)
    return C.eval_search(index, cfg, ds)


if __name__ == "__main__":
    main()
