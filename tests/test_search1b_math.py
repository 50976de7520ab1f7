"""The shard-streamed 1B search (tools/search_1b.py) must be EXACTLY the
single-store search: global coarse top-nprobe, per-centroid-range shards
scanned via search_precomputed with pad probes (+inf distance, empty pad
list), then a (distance, label) lexsort merge — parallel/sharded.py's
all_gather + global top-k as a host reduction. This test runs that
composition at small scale against the direct full-store search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
from ivfhnsw_tpu.models.storage import PostingListStore
from ivfhnsw_tpu.ops.distances import streaming_topk_l2


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(5)
    nb, d, nc = 20000, 32, 64
    centers = rng.randn(96, d).astype(np.float32) * 5
    base = centers[rng.randint(0, 96, nb)] + rng.randn(nb, d).astype(
        np.float32)
    queries = centers[rng.randint(0, 96, 32)] + rng.randn(32, d).astype(
        np.float32)
    idx = IVFADCIndex(IndexConfig(d=d, nc=nc, code_size=8))
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:8000], niter=12)
    idx.train_pq(key, base[:6000])
    idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries


def test_shard_streamed_merge_matches_direct(built):
    idx, queries = built
    nc, d = idx.nc, idx.d
    nprobe, k, mc = 12, 10, 4000
    store = idx.store
    mx = int(np.diff(np.asarray(store.list_offsets)).max())
    L = -(-(mc + mx) // 128) * 128
    sp = SearchParams(k=k, nprobe=nprobe, max_codes=mc, scan_budget=L)

    qc_d, probes = streaming_topk_l2(
        jnp.asarray(queries), idx.centroids, nprobe, block=idx._cb(),
        point_sqnorms=idx.centroid_norms,
        precision=jax.lax.Precision.HIGHEST)
    qc_d, probes = np.asarray(qc_d), np.asarray(probes)

    # Direct reference: one store, explicit probes (search2 surface).
    d_ref, l_ref = idx.search_precomputed(queries, probes, qc_d, sp)

    # Shard-streamed composition (tools/search_1b.py's exact steps).
    S = 4
    nq = queries.shape[0]
    all_d = np.full((nq, S * k), np.inf, np.float32)
    all_l = np.full((nq, S * k), -1, np.int64)
    offs = np.asarray(store.list_offsets).astype(np.int64)
    keys_flat = np.repeat(np.arange(nc), np.diff(offs))
    cents = np.asarray(idx.centroids)
    nc_per = -(-nc // S)
    for s in range(S):
        lo, hi = s * nc_per, min((s + 1) * nc_per, nc)
        nc_loc = hi - lo
        sel = np.flatnonzero((keys_flat >= lo) & (keys_flat < hi))
        k_loc = keys_flat[sel] - lo
        sizes = np.bincount(k_loc, minlength=nc_loc + 1)
        soffs = np.zeros(nc_loc + 2, np.int64)
        np.cumsum(sizes, out=soffs[1:])
        sidx = IVFADCIndex(IndexConfig(d=d, nc=nc_loc + 1, code_size=8))
        sidx.set_centroids(np.vstack([cents[lo:hi],
                                      np.zeros((1, d), np.float32)]))
        sidx.pq, sidx.norm_pq = idx.pq, idx.norm_pq
        sidx.store = PostingListStore(
            codes=store.codes[sel], ids=store.ids[sel],
            norm_codes=store.norm_codes[sel],
            list_offsets=soffs.astype(np.int32), nc=nc_loc + 1)
        m = (probes >= lo) & (probes < hi)
        order = np.argsort(~m, axis=1, kind="stable")
        p_sh = (np.take_along_axis(probes, order, 1) - lo).astype(np.int32)
        d_sh = np.take_along_axis(qc_d, order, 1).astype(np.float32)
        msk = np.take_along_axis(m, order, 1)
        p_sh[~msk] = nc_loc
        d_sh[~msk] = np.inf
        d_o, l_o = sidx.search_precomputed(queries, p_sh, d_sh, sp)
        all_d[:, s * k:(s + 1) * k] = d_o
        all_l[:, s * k:(s + 1) * k] = l_o
    gsel = np.lexsort((all_l, all_d), axis=1)[:, :k]
    fin_d = np.take_along_axis(all_d, gsel, axis=1)
    fin_l = np.take_along_axis(all_l, gsel, axis=1)

    np.testing.assert_allclose(fin_d, d_ref, rtol=1e-4, atol=1e-3)
    mism = fin_l != l_ref
    if mism.any():  # equal-distance tie labels may swap
        assert np.allclose(fin_d[mism], d_ref[mism], rtol=1e-4, atol=1e-3)
