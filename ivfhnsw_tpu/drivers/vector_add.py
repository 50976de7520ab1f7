"""Incremental vector-add driver.

Equivalent of `test_ivfhnsw_grouping_sift1b_vector_add`
(/root/reference/tests/test_ivfhnsw_grouping_sift1b_vector_add.cpp:97-127,
262-274): discover base/precomputed-idx segment pairs in a directory, add
one segment per iteration, write `index_NN.index` after each, and re-run the
full query/recall suite after every segment.

Incremental grouping policy: the reference's add_group overwrites the
group's alpha with the value learned from whichever segment last touched it,
while codes from earlier segments keep their old encodings
(IndexIVF_HNSW_Grouping.cpp:78-87). Here alpha statistics ACCUMULATE across
segments (the per-group numerator/denominator sums live on the index), the
group alphas are re-finalized after each segment, and only the NEW segment
is encoded — total work is linear in the corpus like the reference's
append, and the alphas converge to the full-corpus values instead of
reflecting only the last segment.

Segments come from tools/vector_split.py (or the reference's vector_split).
Synthetic mode (-synthetic SEED -segments N) splits the synthetic corpus
into N base + precomputed-idx segment pairs in a temp dir and runs the same
loop, exercising the idx-consumption path.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ivfhnsw_tpu import IVFADCGroupingIndex
from ivfhnsw_tpu.drivers import common as C
from ivfhnsw_tpu.utils import io


def read_idx_segment(path: str) -> np.ndarray:
    """Precomputed-idx segment: xvec framing with batch-sized records
    (the reference writes 1M-idx batches — readXvec<idx_t>(..., batch, 1),
    test_ivfhnsw_grouping_sift1b_vector_add.cpp:162)."""
    chunks = []
    with open(path, "rb") as f:
        while True:
            hdr = np.fromfile(f, "<u4", 1)
            if hdr.size == 0:
                break
            chunks.append(np.fromfile(f, "<u4", int(hdr[0])))
    return np.concatenate(chunks).astype(np.int32)


def main() -> list:
    cfg, extras = C.parse_driver_args(("synthetic", "segments", "segment_dir"))
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)

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

    if "segment_dir" in extras:
        seg_dir = extras["segment_dir"]
    else:
        # Materialize synthetic base + precomputed-idx segment pairs.
        import tempfile
        nseg = int(extras.get("segments", 5))
        seg_dir = tempfile.mkdtemp(prefix="vector_add_")
        per = -(-ds.base.shape[0] // nseg)
        for i in range(nseg):
            blk = ds.base[i * per:(i + 1) * per]
            io.write_xvec(os.path.join(seg_dir, f"base_{i:02d}.fvecs"), blk)
            idxs = index.assign(blk).astype("<u4")
            with open(os.path.join(seg_dir,
                                   f"precomputed_idxs_{i:02d}.ivecs"),
                      "wb") as f:
                np.asarray([idxs.size], "<u4").tofile(f)
                idxs.tofile(f)
    base_files = io.get_files(seg_dir, ".fvecs") or io.get_files(seg_dir,
                                                                 ".bvecs")
    idx_files = io.get_files(seg_dir, ".ivecs")
    C.log(f"found {len(base_files)} base segments in {seg_dir}")
    if idx_files and len(idx_files) != len(base_files):
        raise ValueError(
            f"base vector segments ({len(base_files)}) do not match idx "
            f"segments ({len(idx_files)})")  # reference asserts here too

    results = []
    next_id = 0
    for i, fname in enumerate(base_files):
        path = os.path.join(seg_dir, fname)
        seg = io.read_xvec_fvec(path, cfg.index.d)
        n = seg.shape[0]
        C.log(f"=== segment {i}: {fname} ({n} vectors) ===")
        if idx_files:
            keys = read_idx_segment(os.path.join(seg_dir, idx_files[i]))
            if keys.shape[0] != n:
                raise ValueError(
                    f"idx segment {idx_files[i]} has {keys.shape[0]} "
                    f"entries for {n} vectors")
        else:
            keys = index.assign(seg)
        ids = np.arange(next_id, next_id + n, dtype=np.int32)
        if grouping:
            # Accumulate alpha stats, re-finalize alphas, encode ONLY the
            # new segment (appends into the builder; earlier segments keep
            # their encodings, as in the reference's add_group appends).
            index.alpha_pass(seg, keys)
            index.finalize_alphas()
            index.add_batch(seg, ids, keys)
            index.finalize()
            index.compute_inter_centroid_dists()
        else:
            index.add_batch(seg, ids, keys)
            index.finalize()
        next_id += n
        out = io.get_index_name(cfg.path_index or
                                os.path.join(seg_dir, "index"), i)
        index.write(out, do_trunc=True)
        C.log(f"wrote {out}")
        res = C.eval_search(index, cfg, ds)
        res.pop("dists", None)
        res.pop("labels", None)
        res["ntotal"] = next_id
        results.append(res)
    return results


if __name__ == "__main__":
    main()
