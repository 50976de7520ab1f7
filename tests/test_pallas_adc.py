"""The Pallas fused ADC kernel must produce the same results as the portable
XLA path (which is itself oracle-verified in test_ivfadc.py). Runs in
interpreter mode on CPU."""

import jax
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(9)
    nb, d = 9000, 32
    centers = rng.randn(48, d).astype(np.float32) * 5
    base = centers[rng.randint(0, 48, nb)] + rng.randn(nb, d).astype(np.float32)
    queries = centers[rng.randint(0, 48, 24)] + rng.randn(24, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=64, code_size=8)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:4000], niter=12)
    idx.train_pq(key, base[:4000])
    idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries


def both_engines(idx, queries, params, layout="quad"):
    prev_engine, prev_layout = idx.engine, idx.scan_layout
    try:
        idx.engine = "xla"
        d1, l1 = idx.search(queries, params)
        idx.engine = "pallas_interpret"
        idx.scan_layout = layout
        d2, l2 = idx.search(queries, params)
    finally:
        idx.engine, idx.scan_layout = prev_engine, prev_layout
    return d1, l1, d2, l2


def assert_same(d1, l1, d2, l2):
    np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-3)
    mism = l1 != l2
    if mism.any():  # exact-tie label swaps allowed
        assert np.allclose(d1[mism], d2[mism], rtol=1e-4, atol=1e-3)


def test_auto_layout_resolution(built):
    """_resolve_layout's 768-codes/list crossover, end-to-end: the fixture's
    ~140-code average lists must resolve 'auto' -> 'chunk', and a fat-list
    store must resolve 'quad'."""
    idx, _ = built
    assert idx.scan_layout == "auto"
    assert idx._resolve_layout() == "chunk"   # 9000/64 ≈ 140 codes/list
    try:
        idx.scan_layout = "quad"
        assert idx._resolve_layout() == "quad"  # explicit setting wins
    finally:
        idx.scan_layout = "auto"


def test_pallas_matches_xla_unlimited(built):
    idx, queries = built
    d1, l1, d2, l2 = both_engines(idx, queries,
                                  SearchParams(k=10, nprobe=8, max_codes=0))
    assert_same(d1, l1, d2, l2)


def test_pallas_matches_xla_budget(built):
    idx, queries = built
    d1, l1, d2, l2 = both_engines(
        idx, queries, SearchParams(k=10, nprobe=16, max_codes=300))
    assert_same(d1, l1, d2, l2)


def test_pallas_opq():
    rng = np.random.RandomState(10)
    nb, d = 5000, 32
    base = rng.randn(nb, d).astype(np.float32)
    queries = rng.randn(10, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=32, code_size=8, do_opq=True)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(1)
    idx.train_centroids(key, base[:3000], niter=8)
    idx.train_pq(key, base[:3000], opq_niter=5)
    idx.add_batch(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    d1, l1, d2, l2 = both_engines(idx, queries,
                                  SearchParams(k=5, nprobe=4, max_codes=0))
    assert_same(d1, l1, d2, l2)


def test_pallas_chunk_layout_matches_xla(built):
    """The round-1 per-chunk layout stays available behind scan_layout."""
    idx, queries = built
    d1, l1, d2, l2 = both_engines(
        idx, queries, SearchParams(k=10, nprobe=16, max_codes=300),
        layout="chunk")
    assert_same(d1, l1, d2, l2)


def test_pallas_batch_cap_padded_width():
    """_pallas_batch_cap budgets against the Mosaic-PADDED prefetch lane
    width: nch=130 allocates as [B, 256] i32 in SMEM, so B=1024 (pre-fix
    cap) would need 1 MB exactly and fail on device."""
    idx = IVFADCIndex(IndexConfig(d=16, nc=8, code_size=8))
    assert idx._pallas_batch_cap(130) * 256 * 4 <= 640 << 10
    assert idx._pallas_batch_cap(52) == 1024   # padded 128: full batch ok


def test_quad_store_layout(built):
    """Quad tiles: code row 4m+c = subquantizer m of chunk c, rows 64..67 =
    norm codes of chunks 0..3, lists 1024-aligned."""
    idx, _ = built
    store = idx.store
    q = store.quad()
    off = np.asarray(store.list_offsets)
    qoff = np.asarray(q.tile_offsets)
    sizes = off[1:] - off[:-1]
    np.testing.assert_array_equal(np.diff(qoff), -(-sizes // 1024))
    qt = np.asarray(q.tiles)
    ids_al = np.asarray(q.ids_aligned)
    codes = np.asarray(store.codes)
    ncodes = np.asarray(store.norm_codes)
    ids = np.asarray(store.ids)
    c = int(np.argmax(sizes > 0))
    lo, n = off[c], min(int(sizes[c]), 256)
    t0 = qoff[c]
    m = codes.shape[1]
    # chunk 0 of the first quad tile: rows 4m+0
    np.testing.assert_array_equal(qt[t0, 0:4 * m:4, :n], codes[lo:lo + n].T)
    np.testing.assert_array_equal(qt[t0, 64, :n], ncodes[lo:lo + n])
    np.testing.assert_array_equal(ids_al[t0 * 1024:t0 * 1024 + n],
                                  ids[lo:lo + n])
    if int(sizes[c]) > 256:  # chunk 1 rows 4m+1
        n2 = min(int(sizes[c]) - 256, 256)
        np.testing.assert_array_equal(qt[t0, 1:4 * m:4, :n2],
                                      codes[lo + 256:lo + 256 + n2].T)
        np.testing.assert_array_equal(qt[t0, 65, :n2],
                                      ncodes[lo + 256:lo + 256 + n2])


def test_tiled_store_layout(built):
    idx, _ = built
    store = idx.store
    tiled = store.tiled()
    off = np.asarray(store.list_offsets)
    toff = np.asarray(tiled.tile_offsets)
    sizes = off[1:] - off[:-1]
    np.testing.assert_array_equal(np.diff(toff), -(-sizes // 256))
    # Row 16 of each tile holds norm codes; codes rows transposed.
    tiles = np.asarray(tiled.tiles)
    ids_al = np.asarray(tiled.ids_aligned)
    codes = np.asarray(store.codes)
    ncodes = np.asarray(store.norm_codes)
    ids = np.asarray(store.ids)
    c = int(np.argmax(sizes > 0))
    lo, n = off[c], min(int(sizes[np.argmax(sizes > 0)]), 256)
    t0 = toff[c]
    np.testing.assert_array_equal(tiles[t0, :8, :n], codes[lo:lo + n].T)
    np.testing.assert_array_equal(tiles[t0, 16, :n], ncodes[lo:lo + n])
    np.testing.assert_array_equal(ids_al[t0 * 256:t0 * 256 + n],
                                  ids[lo:lo + n])


def test_search_device_matches_host(built):
    """The device-resident serving path (search_device) must agree with the
    host search API (same fused kernel, different batching/staging)."""
    import jax.numpy as jnp
    idx, queries = built
    p = SearchParams(k=10, nprobe=8, max_codes=1000)
    idx.engine = "xla"
    d1, l1 = idx.search(queries, p)
    idx.engine = "auto"
    dd, ll = idx.search_device(jnp.asarray(queries[:16]), p, interpret=True)
    dd = np.asarray(dd).reshape(16, -1)
    ll = np.asarray(ll).reshape(16, -1)
    assert_same(d1[:16], l1[:16], dd, ll)


@pytest.mark.parametrize("layout", ["chunk", "quad"])
@pytest.mark.parametrize("mc", [0, 300])
def test_two_phase_matches_wide(built, layout, mc):
    """The two-phase (min-reduce + exact k-unit rescan) engine must return
    the same distances as the wide engine (exact-tie label swaps allowed)."""
    idx, queries = built
    params = SearchParams(k=10, nprobe=12, max_codes=mc)
    prev = idx.engine, idx.scan_layout, idx.scan_topk
    try:
        idx.engine = "pallas_interpret"
        idx.scan_layout = layout
        idx.scan_topk = "wide"
        d1, l1 = idx.search(queries, params)
        idx.scan_topk = "twophase"
        d2, l2 = idx.search(queries, params)
    finally:
        idx.engine, idx.scan_layout, idx.scan_topk = prev
    assert_same(d1, l1, d2, l2)


def test_two_phase_small_k_edge(built):
    """k=1 and k larger than the per-query unit count both stay exact."""
    idx, queries = built
    prev = idx.engine, idx.scan_layout, idx.scan_topk
    try:
        idx.engine = "pallas_interpret"
        idx.scan_layout = "chunk"
        idx.scan_topk = "twophase"
        for k in (1, 64):
            p = SearchParams(k=k, nprobe=4, max_codes=0)
            d2, l2 = idx.search(queries, p)
            idx.engine = "xla"
            d1, l1 = idx.search(queries, p)
            idx.engine = "pallas_interpret"
            assert_same(d1, l1, d2, l2)
    finally:
        idx.engine, idx.scan_layout, idx.scan_topk = prev


@pytest.mark.parametrize("layout", ["chunk", "quad"])
def test_coarse_approx_ext_path(built, layout):
    """coarse_mode='approx' routes through streaming_topk_l2's approx_min_k
    path inside the fused kernel. With recall_target ~1.0 on a small
    centroid set the probe cut matches exact coarse, so results must agree
    with the exact-coarse engine."""
    idx, queries = built
    prev = idx.engine, idx.scan_layout
    try:
        idx.engine = "pallas_interpret"
        idx.scan_layout = layout
        p_ex = SearchParams(k=10, nprobe=8, max_codes=2000,
                            coarse_mode="exact")
        d1, l1 = idx.search(queries, p_ex)
        p_ap = SearchParams(k=10, nprobe=8, max_codes=2000,
                            coarse_mode="approx", coarse_recall=1.0)
        d2, l2 = idx.search(queries, p_ap)
    finally:
        idx.engine, idx.scan_layout = prev
    assert_same(d1, l1, d2, l2)


def test_profiled_scan_budget_exact(built):
    """scan_budget >= the profiled max demand caps the Pallas slot count
    without changing ANY result (profile-guided serving config)."""
    idx, queries = built
    params = SearchParams(k=5, nprobe=8, max_codes=2000)
    dem = idx.scan_slot_demand(queries, params)
    assert dem.shape == (queries.shape[0],) and dem.min() > 0
    worst = idx._pallas_nch(params, 8)
    gran = 1024 if idx._resolve_layout() == "quad" else 256
    capped = SearchParams(k=5, nprobe=8, max_codes=2000,
                          scan_budget=int(dem.max()) * gran)
    assert idx._pallas_nch(capped, 8) <= worst
    assert idx._pallas_nch(capped, 8) >= int(dem.max())
    prev = idx.engine
    try:
        idx.engine = "pallas_interpret"
        d1, l1 = idx.search(queries, params)
        d2, l2 = idx.search(queries, capped)
    finally:
        idx.engine = prev
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))


def test_tiny_scan_budget_truncates_farthest(built):
    """A scan_budget BELOW demand drops the farthest probes' tails: still
    returns valid results, and every returned distance matches a distance
    the unbudgeted search also found for that query (prefix property)."""
    idx, queries = built
    gran = 1024 if idx._resolve_layout() == "quad" else 256
    full = SearchParams(k=5, nprobe=8, max_codes=0)
    tiny = SearchParams(k=5, nprobe=8, max_codes=0, scan_budget=3 * gran)
    assert idx._pallas_nch(tiny, 8) == 3
    prev = idx.engine
    try:
        idx.engine = "pallas_interpret"
        df, lf = idx.search(queries, full)
        dt, lt = idx.search(queries, tiny)
    finally:
        idx.engine = prev
    lt, dt = np.asarray(lt), np.asarray(dt)
    df = np.asarray(df)
    assert (lt >= -1).all()
    assert np.isfinite(dt[lt >= 0]).all()
    # Truncation only removes candidates: each query's best truncated
    # distance can never beat its best full-scan distance.
    assert (dt[:, 0] >= df[:, 0] - 1e-5).all()


def test_coarse_binned_matches_exact(built):
    """coarse_mode='binned' (the 3-pass bin-min reduction) is an EXACT
    probe selection: end-to-end results match coarse_mode='exact' through
    the fused engine (modulo equal-distance tie labels)."""
    idx, queries = built
    prev = idx.engine
    try:
        idx.engine = "pallas_interpret"
        p_ex = SearchParams(k=10, nprobe=8, max_codes=3000,
                            coarse_mode="exact")
        d1, l1 = idx.search(queries, p_ex)
        p_bn = SearchParams(k=10, nprobe=8, max_codes=3000,
                            coarse_mode="binned")
        d2, l2 = idx.search(queries, p_bn)
    finally:
        idx.engine = prev
    assert_same(d1, l1, d2, l2)
    # scan_slot_demand follows the same mode without error
    dem = idx.scan_slot_demand(queries, p_bn)
    assert (dem > 0).all()
