"""End-to-end IVFADC tests: the implementation must match a numpy oracle of
the reference's ADC spec (3-term decomposition + max_codes budget +
probe-order semantics, IndexIVF_HNSW.cpp:206-296)."""

import jax
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
from ivfhnsw_tpu.utils.recall import recall_at_k


def make_dataset(rng, nb=8000, nq=16, d=32, nc_true=48):
    centers = rng.randn(nc_true, d).astype(np.float32) * 5
    base = centers[rng.randint(0, nc_true, nb)] + rng.randn(nb, d).astype(np.float32)
    queries = centers[rng.randint(0, nc_true, nq)] + rng.randn(nq, d).astype(np.float32)
    gt = np.argsort(((queries[:, None] - base[None]) ** 2).sum(-1), axis=1)
    return base, queries, gt


@pytest.fixture(scope="module")
def built_index():
    rng = np.random.RandomState(7)
    base, queries, gt = make_dataset(rng)
    cfg = IndexConfig(d=32, nc=64, code_size=8)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:4000], niter=15)
    idx.train_pq(key, base[:4000])
    idx.add_batch(base, np.arange(base.shape[0], dtype=np.int32))
    idx.finalize()
    return idx, base, queries, gt


def adc_oracle(idx, queries, nprobe, k, max_codes=0):
    """Exact numpy evaluation of the reference search semantics."""
    C = np.asarray(idx.centroids)
    cn = (C ** 2).sum(1)
    cb = np.asarray(idx.pq.codebooks)
    ncent = np.asarray(idx.norm_pq.centroids)
    store = idx.store
    codes = np.asarray(store.codes)
    ids = np.asarray(store.ids)
    ncodes = np.asarray(store.norm_codes)
    off = np.asarray(store.list_offsets)
    M, dsub = cb.shape[0], cb.shape[2]
    out_d, out_i = [], []
    for q in queries:
        qc = ((q[None] - C) ** 2).sum(1)
        probes = np.argsort(qc)[:nprobe]
        lut = np.einsum("md,mkd->mk", q.reshape(M, dsub), cb)
        cand_d, cand_i, ncode = [], [], 0
        for p in probes:
            if max_codes and ncode >= max_codes:
                break
            lo, hi = off[p], off[p + 1]
            if lo == hi:
                continue
            cc = codes[lo:hi].astype(np.int64)
            t3 = lut[np.arange(M)[None, :], cc].sum(1)
            dd = ((qc[p] - cn[p]) + ncent[ncodes[lo:hi].astype(np.int64)]
                  - 2 * t3)
            cand_d.append(dd)
            cand_i.append(ids[lo:hi])
            ncode += hi - lo
        cand_d = np.concatenate(cand_d)
        cand_i = np.concatenate(cand_i)
        order = np.argsort(cand_d, kind="stable")[:k]
        out_d.append(cand_d[order])
        out_i.append(cand_i[order])
    return np.stack(out_d), np.stack(out_i)


def assert_matches_oracle(dists, labels, ref_d, ref_i):
    # Distances must match; labels may swap only on exact distance ties.
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-3)
    mismatch = labels != ref_i
    if mismatch.any():
        # Every mismatch must be a near-tie.
        assert np.allclose(dists[mismatch], ref_d[mismatch], rtol=1e-4,
                           atol=1e-3)


def test_search_matches_oracle(built_index):
    idx, base, queries, gt = built_index
    d, l = idx.search(queries, SearchParams(k=10, nprobe=8, max_codes=0))
    ref_d, ref_i = adc_oracle(idx, queries, nprobe=8, k=10)
    assert_matches_oracle(d, l, ref_d, ref_i)


def test_max_codes_budget_semantics(built_index):
    idx, base, queries, gt = built_index
    d, l = idx.search(queries, SearchParams(k=10, nprobe=16, max_codes=300))
    ref_d, ref_i = adc_oracle(idx, queries, nprobe=16, k=10, max_codes=300)
    assert_matches_oracle(d, l, ref_d, ref_i)


def test_recall_reasonable_and_monotone(built_index):
    idx, base, queries, gt = built_index
    r_small = recall_at_k(idx.search(queries, SearchParams(k=100, nprobe=2,
                                                           max_codes=0))[1], gt)
    r_big = recall_at_k(idx.search(queries, SearchParams(k=100, nprobe=32,
                                                         max_codes=0))[1], gt)
    assert r_big[100] >= 0.9
    assert r_big[100] >= r_small[100] - 1e-9


def test_serialization_roundtrip(built_index, tmp_path):
    idx, base, queries, gt = built_index
    path = str(tmp_path / "test.index")
    idx.write(path)
    idx2 = IVFADCIndex(idx.config)
    idx2.set_centroids(np.asarray(idx.centroids))
    idx2.pq, idx2.norm_pq = idx.pq, idx.norm_pq
    idx2.read(path)
    p = SearchParams(k=10, nprobe=8, max_codes=0)
    d1, l1 = idx.search(queries, p)
    d2, l2 = idx2.search(queries, p)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_index_file_reference_layout(built_index, tmp_path):
    """The .index file must follow the reference byte layout
    (IndexIVF_HNSW.cpp:637-669): u64 d, u64 nc, then length-prefixed lists."""
    idx, *_ = built_index
    path = str(tmp_path / "layout.index")
    idx.write(path)
    with open(path, "rb") as f:
        d = int(np.frombuffer(f.read(8), "<u8")[0])
        nc = int(np.frombuffer(f.read(8), "<u8")[0])
        assert (d, nc) == (idx.d, idx.nc)
        total = 0
        for _ in range(nc):
            cnt = int(np.frombuffer(f.read(4), "<u4")[0])
            f.seek(cnt * 4, 1)
            total += cnt
        assert total == idx.store.ntotal


def test_enn_self_match(built_index):
    idx, base, queries, gt = built_index
    dn, ln = idx.search_enn(base[:200])
    # With 8-byte codes self-match is approximate; require a strong majority.
    assert (ln == np.arange(200)).mean() > 0.5


def test_search_precomputed_matches_search(built_index):
    idx, base, queries, gt = built_index
    from ivfhnsw_tpu.ops.distances import streaming_topk_l2
    import jax.numpy as jnp
    qc, probes = streaming_topk_l2(jnp.asarray(queries), idx.centroids, 8,
                                   precision=jax.lax.Precision.HIGHEST)
    p = SearchParams(k=10, nprobe=8, max_codes=0)
    d1, l1 = idx.search_precomputed(queries, np.asarray(probes),
                                    np.asarray(qc), p)
    d2, l2 = idx.search(queries, p)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-3)


def test_search_per_probe(built_index):
    idx, base, queries, gt = built_index
    p = SearchParams(k=5, nprobe=4, max_codes=0)
    d, l = idx.search_per_probe(queries, p)
    assert d.shape == (queries.shape[0], 4, 5)
    # Global top-1 must appear among the per-probe winners.
    dg, lg = idx.search(queries, SearchParams(k=1, nprobe=4, max_codes=0))
    assert all(lg[i, 0] in l[i, :, 0] for i in range(queries.shape[0]))


def test_add_batch2_obuf(built_index):
    idx, base, *_ = built_index
    cfg = idx.config
    idx2 = IVFADCIndex(cfg)
    idx2.set_centroids(np.asarray(idx.centroids))
    idx2.pq, idx2.norm_pq, idx2.opq_R = idx.pq, idx.norm_pq, idx.opq_R
    n = 10
    keys = idx2.assign(base[:n])
    eids = np.arange(100, 100 + n, dtype=np.uint64)
    buf = idx2.add_batch2(base[:n], np.arange(n), keys, eids)
    rec_size = 8 + cfg.pq_m + 1
    assert len(buf) == n * rec_size
    rec = np.frombuffer(buf, dtype=[("eid", "<u8"),
                                    ("code", "u1", (cfg.pq_m,)),
                                    ("norm", "u1")])
    np.testing.assert_array_equal(rec["eid"], eids)


def test_write2_orcv_export(built_index, tmp_path):
    idx, *_ = built_index
    home = str(tmp_path / "orcv_home")
    idx.write2(home, n_vecs=idx.store.ntotal)
    import os
    from ivfhnsw_tpu.utils.orcv import OrcvHeader
    hdr = OrcvHeader.read(os.path.join(home, "hdr.vec"))
    assert hdr.n == idx.store.ntotal and hdr.nc == idx.nc and hdr.d == idx.d
    for fn in ("cnorms.vec", "pq.vec", "normpq.vec", "edge.vec"):
        assert os.path.exists(os.path.join(home, fn))


def test_opq_end_to_end():
    rng = np.random.RandomState(11)
    base, queries, gt = make_dataset(rng, nb=4000, nq=12)
    cfg = IndexConfig(d=32, nc=32, code_size=8, do_opq=True)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(1)
    idx.train_centroids(key, base[:3000], niter=10)
    idx.train_pq(key, base[:3000], opq_niter=8)
    idx.add_batch(base, np.arange(base.shape[0], dtype=np.int32))
    idx.finalize()
    r = recall_at_k(idx.search(queries, SearchParams(k=100, nprobe=16,
                                                     max_codes=0))[1], gt)
    assert r[100] >= 0.85, r


def test_orcv_home_roundtrip(built_index, tmp_path):
    """write2 export -> load_home_dir restores the code/norm content."""
    from ivfhnsw_tpu.utils.orcv import load_home_dir
    idx, base, queries, gt = built_index
    home = str(tmp_path / "orcv_rt")
    idx.write2(home, n_vecs=idx.store.ntotal)
    idx2, hdr = load_home_dir(home)
    assert hdr.n == idx.store.ntotal
    np.testing.assert_array_equal(np.asarray(idx2.store.codes),
                                  np.asarray(idx.store.codes))
    np.testing.assert_array_equal(np.asarray(idx2.store.norm_codes),
                                  np.asarray(idx.store.norm_codes))
    np.testing.assert_array_equal(np.asarray(idx2.store.list_offsets),
                                  np.asarray(idx.store.list_offsets))


def test_search_per_probe_ignores_max_codes(built_index):
    """search2m scans every probe's full list (the reference's max_codes
    early-exit is commented out, IndexIVF_HNSW.cpp:528-530); a params.max_codes
    must not shrink the scan window (regression: L was sized from the budget
    while inclusion ignored it, silently dropping later probes)."""
    idx, base, queries, gt = built_index
    d0, l0 = idx.search_per_probe(queries, SearchParams(k=5, nprobe=6,
                                                        max_codes=0))
    d1, l1 = idx.search_per_probe(queries, SearchParams(k=5, nprobe=6,
                                                        max_codes=50))
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(l1, l0)


def test_reseed_builder_extends_persisted_index(built_index, tmp_path):
    """A written index can be read back, reseeded into the builder, and
    extended with new batches; the result is byte-identical to building
    the full set from scratch (the reference's read-then-add flow,
    test_ivfhnsw_grouping_sift1b_vector_add.cpp:262-274)."""
    idx, base, queries, gt = built_index
    half = base.shape[0] // 2
    cfg = IndexConfig(d=32, nc=64, code_size=8)

    a = IVFADCIndex(cfg)
    a.set_centroids(np.asarray(idx.centroids))
    a.pq, a.norm_pq = idx.pq, idx.norm_pq
    a.add_batch(base[:half], np.arange(half, dtype=np.int32))
    a.finalize()
    p = str(tmp_path / "half.index")
    a.write(p)

    b = IVFADCIndex(cfg)
    b.set_centroids(np.asarray(idx.centroids))
    b.pq, b.norm_pq = idx.pq, idx.norm_pq
    b.read(p)
    assert b.builder.ntotal == 0
    b.reseed_builder_from_store()
    assert b.builder.ntotal == half
    b.store = None
    b.add_batch(base[half:], np.arange(half, base.shape[0],
                                       dtype=np.int32))
    b.finalize()

    full = IVFADCIndex(cfg)
    full.set_centroids(np.asarray(idx.centroids))
    full.pq, full.norm_pq = idx.pq, idx.norm_pq
    full.add_batch(base, np.arange(base.shape[0], dtype=np.int32))
    full.finalize()

    assert b.store.ntotal == full.store.ntotal == base.shape[0]
    np.testing.assert_array_equal(np.asarray(b.store.list_offsets),
                                  np.asarray(full.store.list_offsets))
    np.testing.assert_array_equal(np.asarray(b.store.ids),
                                  np.asarray(full.store.ids))
    np.testing.assert_array_equal(np.asarray(b.store.codes),
                                  np.asarray(full.store.codes))
    np.testing.assert_array_equal(np.asarray(b.store.norm_codes),
                                  np.asarray(full.store.norm_codes))
