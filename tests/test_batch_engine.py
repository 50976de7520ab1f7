"""Shared-scan batch engine must reproduce the portable XLA engine's
results exactly (same scanned sets, f32 math) in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
from ivfhnsw_tpu.ops.pallas import batch_scan as bs


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(21)
    nb, d = 20000, 128
    centers = rng.randn(60, d).astype(np.float32) * 5
    base = centers[rng.randint(0, 60, nb)] + rng.randn(nb, d).astype(np.float32)
    queries = centers[rng.randint(0, 60, 64)] + rng.randn(64, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=64, code_size=16)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:6000], niter=10)
    idx.train_pq(key, base[:4000], pq_niter=10)
    idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries


def run_batch(idx, queries, params, QB=16, U=None, nch=None):
    tiled = idx.store.tiled()
    nprobe = min(params.nprobe, idx.nc)
    U = U or min(QB * nprobe, idx.nc)  # exact upper bound: never overflows
    mx = idx.store.max_list_size()
    if nch is None:
        nch = U * max(1, -(-mx // bs.CHUNK))
    c_rank = jnp.asarray(bs.spatial_rank(idx.centroids))
    d, l, ov = bs.batch_search_core(
        jnp.asarray(queries), idx.centroids, idx.centroid_norms,
        idx.pq.codebooks, idx.norm_pq.centroids,
        jnp.zeros((0, 0), jnp.float32), tiled.tiles, tiled.ids_aligned,
        tiled.tile_offsets, tiled.list_sizes, c_rank,
        jnp.int32(params.max_codes),
        nprobe=nprobe, k=params.k, QB=QB, U=U, nch=nch, coarse_block=64,
        use_opq=False, interpret=True)
    return np.asarray(d), np.asarray(l), np.asarray(ov)


def assert_same(d1, l1, d2, l2):
    np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-3)
    mism = l1 != l2
    if mism.any():
        assert np.allclose(d1[mism], d2[mism], rtol=1e-4, atol=1e-3)


def test_batch_matches_xla_unlimited(built):
    idx, queries = built
    p = SearchParams(k=10, nprobe=8, max_codes=0)
    idx.engine = "xla"
    d1, l1 = idx.search(queries, p)
    d2, l2, ov = run_batch(idx, queries, p)
    assert (ov == 0).all()
    assert_same(d1, l1, d2, l2)


def test_batch_matches_xla_budget(built):
    idx, queries = built
    p = SearchParams(k=10, nprobe=16, max_codes=900)
    idx.engine = "xla"
    d1, l1 = idx.search(queries, p)
    d2, l2, ov = run_batch(idx, queries, p)
    assert (ov == 0).all()
    assert_same(d1, l1, d2, l2)


def test_batch_union_overflow_counted(built):
    idx, queries = built
    p = SearchParams(k=10, nprobe=16, max_codes=0)
    # Tiny U forces overflow; results may degrade but must not crash.
    d2, l2, ov = run_batch(idx, queries, p, U=8,
                           nch=8 * max(1, -(-idx.store.max_list_size()
                                            // bs.CHUNK)))
    assert ov.sum() > 0
    # Overflow drops lists; queries whose probes all fell outside the kept
    # union legitimately return +inf, but most queries must still resolve.
    assert np.isfinite(d2[:, 0]).mean() > 0.5
