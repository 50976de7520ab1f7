"""Property tests from SURVEY.md §4: recall behavior must be monotone in the
search-effort knobs, and searches must be deterministic."""

import jax
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
from ivfhnsw_tpu.utils.recall import recall_at_k


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(17)
    nb, d = 12000, 32
    centers = rng.randn(50, d).astype(np.float32) * 5
    base = centers[rng.randint(0, 50, nb)] + rng.randn(nb, d).astype(np.float32)
    queries = centers[rng.randint(0, 50, 64)] + rng.randn(64, d).astype(np.float32)
    gt = np.argsort(((queries[:, None] - base[None]) ** 2).sum(-1),
                    axis=1)[:, :1]
    idx = IVFADCIndex(IndexConfig(d=d, nc=64, code_size=8))
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:5000], niter=10)
    idx.train_pq(key, base[:4000])
    idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries, gt


def test_recall_monotone_in_nprobe(built):
    idx, queries, gt = built
    rs = []
    for nprobe in (1, 4, 16, 64):
        _, l = idx.search(queries, SearchParams(k=100, nprobe=nprobe,
                                                max_codes=0))
        rs.append(recall_at_k(l, gt, ks=(100,))[100])
    assert all(b >= a - 1e-9 for a, b in zip(rs, rs[1:])), rs
    assert rs[-1] >= 0.9


def test_recall_monotone_in_max_codes(built):
    idx, queries, gt = built
    rs = []
    for mc in (200, 1000, 5000, 0):  # 0 = unlimited
        _, l = idx.search(queries, SearchParams(k=100, nprobe=32,
                                                max_codes=mc))
        rs.append(recall_at_k(l, gt, ks=(100,))[100])
    assert all(b >= a - 1e-9 for a, b in zip(rs, rs[1:])), rs


def test_search_deterministic(built):
    idx, queries, gt = built
    p = SearchParams(k=10, nprobe=16, max_codes=2000)
    d1, l1 = idx.search(queries, p)
    d2, l2 = idx.search(queries, p)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(d1, d2)


def test_returned_distances_sorted(built):
    idx, queries, gt = built
    d, _ = idx.search(queries, SearchParams(k=50, nprobe=16, max_codes=0))
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_k_larger_than_candidates_padded(built):
    idx, queries, gt = built
    d, l = idx.search(queries, SearchParams(k=400, nprobe=1, max_codes=0))
    # Some queries' single probed list is smaller than k.
    short = ~np.isfinite(d)
    assert (l[short] == -1).all()