"""Grouping + disk-rerank eval driver.

Equivalent of `test_ivfhnsw_grouping_sift1b_disk`
(/root/reference/tests/test_ivfhnsw_grouping_sift1b_disk.cpp:237): identical
to the grouping pipeline but the query loop calls searchDisk — ANN for 2k
candidates, exact L2 rerank against the raw base file, distance-then-label
tiebreak (utils.cpp:193-202).
"""

from __future__ import annotations


from ivfhnsw_tpu.drivers import common as C
from ivfhnsw_tpu.drivers.grouping_eval import build
from ivfhnsw_tpu.utils import io
from ivfhnsw_tpu.utils.config import SearchParams
from ivfhnsw_tpu.utils.recall import recall_at_k


def main() -> dict:
    cfg, extras = C.parse_driver_args(("synthetic",))
    index, ds = build(cfg, extras)
    p = cfg.search
    params = SearchParams(k=p.k, nprobe=p.nprobe, max_codes=p.max_codes,
                          do_pruning=p.do_pruning)
    if cfg.path_base:
        base_file = io.XvecFile(cfg.path_base, cfg.index.d)
    else:
        # Synthetic mode: materialize the base as an .fvecs tempfile so the
        # raw-file rerank path is exercised for real.
        import tempfile
        tmp = tempfile.NamedTemporaryFile(suffix=".fvecs", delete=False)
        io.write_xvec(tmp.name, ds.base)
        base_file = io.XvecFile(tmp.name, cfg.index.d)
    w = C.StopW()
    dists, labels = index.search_disk(ds.queries, params, base_file)
    dt = w.getElapsedTimeMicro()
    recalls = recall_at_k(labels, ds.gt, ks=(1, min(p.k, 10), p.k))
    for k, r in sorted(recalls.items()):
        C.log(f"Recall@{k}: {r:.4f}")
    C.log(f"Time per query: {dt / ds.nq:.1f} us")
    return {"recalls": recalls, "us_per_query": dt / ds.nq}


if __name__ == "__main__":
    main()
