"""Miss-diagnosis debug harness.

Equivalent of `test_ivfhnsw_sift1b_orca` and
`test_ivfhnsw_grouping_sift1b_orca`
(/root/reference/tests/test_ivfhnsw_sift1b_orca.cpp:281-296,
test_ivfhnsw_grouping_sift1b_orca.cpp:236-308): find the first query whose
true NN is missed, then report
  - which centroid the true answer is assigned to,
  - whether that centroid was probed (and at what rank/distance),
  - the ADC-estimated distance of the true answer vs its exact distance,
  - the ENN self-search result for the true answer vector,
and append per-query (centroid, distance) traces to centroids_hit.log /
centroids_miss.log (trace_centroids, IndexIVF_HNSW.cpp:298-326).
"""

from __future__ import annotations

import numpy as np

from ivfhnsw_tpu import IVFADCIndex
from ivfhnsw_tpu.drivers import common as C
from ivfhnsw_tpu.utils.config import SearchParams


def main() -> dict | None:
    import jax
    cfg, extras = C.parse_driver_args(("synthetic",))
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)
    grouping = cfg.index.nsubc > 0
    if grouping:
        # Grouping debug variant (test_ivfhnsw_grouping_sift1b_orca.cpp).
        from ivfhnsw_tpu import IVFADCGroupingIndex
        index = IVFADCGroupingIndex(cfg.index)
    else:
        index = IVFADCIndex(cfg.index)
    key = jax.random.PRNGKey(0)
    C.setup_quantizer(index, cfg, ds, key)
    if grouping:
        index.compute_neighbor_centroids()
    C.setup_pq(index, cfg, ds, key)
    idxs = C.load_or_assign(index, cfg, ds)
    C.build_or_read_index(index, cfg, ds, idxs, grouping=grouping)

    p = cfg.search
    params = SearchParams(k=p.k, nprobe=p.nprobe, max_codes=p.max_codes)
    dists, labels, trace = index.search(ds.queries, params, trace=True)
    true_nn = ds.gt[:, 0]
    hits = (labels == true_nn[:, None]).any(axis=1)

    # trace_centroids equivalent: per-query probe logs split by hit/miss.
    with open("centroids_hit.log", "a") as fh, \
         open("centroids_miss.log", "a") as fm:
        for qi in range(ds.nq):
            f = fh if hits[qi] else fm
            f.write(f"query {qi}:\n")
            for c, d in zip(trace["probes"][qi], trace["qc_dists"][qi]):
                f.write(f"c: {c} d: {d}\n")

    if hits.all():
        C.log("no missed queries — nothing to diagnose")
        return None
    qi = int(np.argmax(~hits))
    t = int(true_nn[qi])
    C.log(f"first miss: query {qi}, true NN id {t}")
    ans_centroid = int(idxs[t]) if idxs is not None else int(
        index.assign(ds.base[t:t + 1])[0])
    C.log(f"true answer assigned to centroid {ans_centroid}")
    probes = trace["probes"][qi]
    where = np.nonzero(probes == ans_centroid)[0]
    if where.size:
        r = int(where[0])
        C.log(f"centroid WAS probed at rank {r} "
              f"(dist {trace['qc_dists'][qi][r]:.3f}, "
              f"included={bool(trace['included'][qi][r])}) — "
              "ADC ranking dropped the answer")
    else:
        C.log(f"centroid NOT probed (nprobe={params.nprobe} too small or "
              "coarse ranking off)")
    if hasattr(ds, "base"):
        exact = float(((ds.base[t] - ds.queries[qi]) ** 2).sum())
        C.log(f"exact distance of true answer: {exact:.3f}; "
              f"returned top-1 ADC dist: {dists[qi, 0]:.3f}")
        ed, el = index.search_enn(ds.base[t:t + 1])
        C.log(f"ENN self-search of true answer: id {int(el[0])} "
              f"(self={'yes' if int(el[0]) == t else 'NO'})")
    return {"query": qi, "true_nn": t, "answer_centroid": ans_centroid}


if __name__ == "__main__":
    main()
