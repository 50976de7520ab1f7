"""Incremental vector-add driver.

Equivalent of `test_ivfhnsw_grouping_sift1b_vector_add`
(/root/reference/tests/test_ivfhnsw_grouping_sift1b_vector_add.cpp:97-127,
262-274): discover base/precomputed-idx segment pairs in a directory, add
one segment per iteration, write `index_NN.index` after each, and re-run the
full query/recall suite after every segment.

Segments come from tools/vector_split.py (or the reference's vector_split).
Synthetic mode (-synthetic SEED -segments N) splits the synthetic corpus
into N segments in a temp dir and runs the same loop.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ivfhnsw_tpu import IVFADCGroupingIndex
from ivfhnsw_tpu.drivers import common as C
from ivfhnsw_tpu.utils import io


def main() -> list:
    cfg, extras = C.parse_driver_args(("synthetic", "segments", "segment_dir"))
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)

    if "segment_dir" in extras:
        seg_dir = extras["segment_dir"]
    else:
        # Materialize synthetic segments.
        import tempfile
        nseg = int(extras.get("segments", 5))
        seg_dir = tempfile.mkdtemp(prefix="vector_add_")
        per = -(-ds.base.shape[0] // nseg)
        for i in range(nseg):
            blk = ds.base[i * per:(i + 1) * per]
            io.write_xvec(os.path.join(seg_dir, f"base_{i:02d}.fvecs"), blk)
    base_files = io.get_files(seg_dir, ".fvecs") or io.get_files(seg_dir,
                                                                 ".bvecs")
    idx_files = io.get_files(seg_dir, ".ivecs")
    C.log(f"found {len(base_files)} base segments in {seg_dir}")

    grouping = cfg.index.nsubc > 0
    if grouping:
        index = IVFADCGroupingIndex(cfg.index)
    else:
        from ivfhnsw_tpu import IVFADCIndex
        index = IVFADCIndex(cfg.index)
    key = jax.random.PRNGKey(0)
    C.setup_quantizer(index, cfg, ds, key)
    if grouping:
        index.compute_neighbor_centroids()
    C.setup_pq(index, cfg, ds, key)

    results = []
    next_id = 0
    seen = []
    for i, fname in enumerate(base_files):
        path = os.path.join(seg_dir, fname)
        seg = io.read_xvec_fvec(path, cfg.index.d)
        n = seg.shape[0]
        C.log(f"=== segment {i}: {fname} ({n} vectors) ===")
        if i < len(idx_files):
            idxs = None  # precomputed idx segments would load here
        seen.append(seg)
        if grouping:
            # Alphas depend on all data seen so far: recompute, then
            # re-encode everything (the flat store re-finalizes; the
            # reference re-reads and appends — same resulting index state).
            index._alpha_num[:] = 0
            index._alpha_den[:] = 0
            index.builder = type(index.builder)(index.nc * index.nsubc,
                                                index.config.pq_m)
            allv = np.concatenate(seen)
            keys = index.assign(allv)
            index.alpha_pass(allv, keys)
            index.finalize_alphas()
            index.add_batch(allv, np.arange(allv.shape[0], dtype=np.int32),
                            keys)
            index.finalize()
            index.compute_inter_centroid_dists()
        else:
            index.add_batch(seg, np.arange(next_id, next_id + n,
                                           dtype=np.int32))
            index.finalize()
        next_id += n
        out = io.get_index_name(cfg.path_index or
                                os.path.join(seg_dir, "index"), i)
        index.write(out, do_trunc=True)
        C.log(f"wrote {out}")
        res = C.eval_search(index, cfg, ds)
        res.pop("dists", None)
        res.pop("labels", None)
        results.append(res)
    return results


if __name__ == "__main__":
    main()
