"""The fused grouping kernel (interpret mode) must match the XLA grouping
engine — which is itself oracle-verified in test_grouping.py."""

import jax
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCGroupingIndex, IndexConfig, SearchParams


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(13)
    nb, d = 8000, 32
    centers = rng.randn(40, d).astype(np.float32) * 5
    base = centers[rng.randint(0, 40, nb)] + rng.randn(nb, d).astype(np.float32)
    queries = centers[rng.randint(0, 40, 20)] + rng.randn(20, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=32, code_size=8, nsubc=8)
    idx = IVFADCGroupingIndex(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:4000], niter=10)
    idx.compute_neighbor_centroids()
    idx.train_pq(key, base[:3000])
    idx.add(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    return idx, queries


def both(idx, queries, params):
    idx.engine = "xla"
    d1, l1 = idx.search(queries, params)
    idx.engine = "pallas_interpret"
    d2, l2 = idx.search(queries, params)
    idx.engine = "auto"
    return d1, l1, d2, l2


def assert_same(d1, l1, d2, l2):
    np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-3)
    mism = l1 != l2
    if mism.any():
        assert np.allclose(d1[mism], d2[mism], rtol=1e-4, atol=1e-3)


def test_grouping_pallas_unlimited(built):
    idx, queries = built
    assert_same(*both(idx, queries, SearchParams(k=10, nprobe=6,
                                                 max_codes=0)))


def test_schedule_skips_fully_pruned_groups():
    """A group whose subgroups are ALL pruned (eff_size 0) must get no
    scan slots — its window would scan only masked +inf lanes (the
    round-4 traffic cut: flagship 23.8 -> 17.6 us/q, bit-identical)."""
    import jax.numpy as jnp
    from ivfhnsw_tpu.ops.pallas import grouping_scan as gs
    probes = jnp.asarray([[0, 1, 2]], jnp.int32)
    term1 = jnp.zeros((1, 3), jnp.float32)
    # Probe 1 fully pruned: effective size 0, full window 300 codes.
    eff = jnp.asarray([[100, 0, 50]], jnp.int32)
    scan = jnp.asarray([[100, 300, 50]], jnp.int32)
    toff = jnp.asarray([0, 1, 3, 4], jnp.int32)   # group 1 spans tiles 1-2
    tl, bias, seg = gs.grouping_chunk_metadata(
        probes, term1, eff, scan, toff, jnp.int32(0), 6)
    lens = np.asarray(tl) % gs.TL_PACK
    segs = np.asarray(seg)
    active = lens[0] > 0
    # Two slots total (groups 0 and 2), none scheduled for probe 1.
    assert active.sum() == 2
    assert not np.any(segs[0][active] == 1)
    # Same at quad granularity.
    qoff = jnp.asarray([0, 1, 2, 3], jnp.int32)
    qtl, _, qseg = gs.grouping_quad_metadata(
        probes, term1, eff, scan, qoff, jnp.int32(0), 4)
    qlens = np.asarray(qtl) % gs.RTL_PACK
    qactive = qlens[0] > 0
    assert qactive.sum() == 2
    assert not np.any(np.asarray(qseg)[0][qactive] == 1)


def test_grouping_pallas_pruning(built):
    idx, queries = built
    assert_same(*both(idx, queries,
                      SearchParams(k=10, nprobe=8, max_codes=600,
                                   do_pruning=True)))


def test_grouping_pallas_budget(built):
    idx, queries = built
    assert_same(*both(idx, queries, SearchParams(k=10, nprobe=8,
                                                 max_codes=400)))


def test_grouped_tile_layout(built):
    idx, _ = built
    from ivfhnsw_tpu.models.storage import SUBC_ROW, NORM_ROW
    store = idx.store
    tiled = store.tiled_grouped(idx.nsubc)
    off = np.asarray(store.list_offsets)
    sub_sizes = (off[1:] - off[:-1]).reshape(idx.nc, idx.nsubc)
    np.testing.assert_array_equal(np.asarray(tiled.list_sizes),
                                  sub_sizes.sum(1))
    tiles = np.asarray(tiled.tiles)
    # First group's first positions carry ascending subc ids per layout.
    g = int(np.argmax(sub_sizes.sum(1) > 0))
    t0 = int(np.asarray(tiled.tile_offsets)[g])
    expected_subc = np.repeat(np.arange(idx.nsubc), sub_sizes[g])[:16]
    np.testing.assert_array_equal(tiles[t0, SUBC_ROW, :len(expected_subc)],
                                  expected_subc)


def test_quad_grouped_tile_layout(built):
    """quad_grouped: groups 1024-aligned, code rows interleaved 4m+c, rows
    64..67 norm codes, rows 68..71 per-chunk subcentroid ids."""
    idx, _ = built
    store = idx.store
    quad = store.quad_grouped(idx.nsubc)
    tiled = store.tiled_grouped(idx.nsubc)
    np.testing.assert_array_equal(np.asarray(quad.list_sizes),
                                  np.asarray(tiled.list_sizes))
    off = np.asarray(store.list_offsets)
    sub_sizes = (off[1:] - off[:-1]).reshape(idx.nc, idx.nsubc)
    gsizes = sub_sizes.sum(1)
    g = int(np.argmax(gsizes > 0))
    q0 = int(np.asarray(quad.tile_offsets)[g])
    qt = np.asarray(quad.tiles)
    n0 = min(int(gsizes[g]), 16)
    expected_subc = np.repeat(np.arange(idx.nsubc), sub_sizes[g])[:n0]
    np.testing.assert_array_equal(qt[q0, 68, :n0], expected_subc)
    # Code rows interleave 4m+c: chunk 0's subquantizer-0 codes sit in row 0.
    t0 = int(np.asarray(tiled.tile_offsets)[g])
    ct = np.asarray(tiled.tiles)
    np.testing.assert_array_equal(qt[q0, 0, :n0], ct[t0, 0, :n0])
    np.testing.assert_array_equal(qt[q0, 64, :n0], ct[t0, 16, :n0])


def test_grouping_pallas_quad_matches_xla(built):
    """The QUAD grouping kernel (interpret) must match the XLA engine under
    every budget mode, like the chunk kernel above."""
    idx, queries = built
    idx.scan_layout = "quad"
    try:
        for p in (SearchParams(k=10, nprobe=6, max_codes=0),
                  SearchParams(k=10, nprobe=8, max_codes=600,
                               do_pruning=True),
                  SearchParams(k=10, nprobe=8, max_codes=400),
                  SearchParams(k=10, nprobe=12, max_codes=100,
                               do_pruning=True)):
            assert_same(*both(idx, queries, p))
    finally:
        idx.scan_layout = "auto"


def test_grouping_quad_profiled_scan_budget(built):
    """Profiled budgets under the quad layout cap in RCHUNK units (the
    index's scan_unit) without changing results."""
    idx, queries = built
    idx.scan_layout = "quad"
    try:
        base_p = SearchParams(k=5, nprobe=8, max_codes=600, do_pruning=True)
        dem = idx.scan_slot_demand(queries, base_p)
        assert dem.min() > 0
        capped = SearchParams(k=5, nprobe=8, max_codes=600, do_pruning=True,
                              scan_budget=int(dem.max()) * idx.scan_unit())
        idx.engine = "pallas_interpret"
        try:
            d1, l1 = idx.search(queries, base_p)
            d2, l2 = idx.search(queries, capped)
        finally:
            idx.engine = "auto"
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))
    finally:
        idx.scan_layout = "auto"


def test_grouping_pallas_opq():
    rng = np.random.RandomState(31)
    nb, d = 6000, 32
    base = rng.randn(nb, d).astype(np.float32)
    queries = rng.randn(12, d).astype(np.float32)
    cfg = IndexConfig(d=d, nc=32, code_size=8, nsubc=8, do_opq=True)
    idx = IVFADCGroupingIndex(cfg)
    key = jax.random.PRNGKey(2)
    idx.train_centroids(key, base[:3000], niter=8)
    idx.compute_neighbor_centroids()
    idx.train_pq(key, base[:3000], opq_niter=5)
    idx.add(base, np.arange(nb, dtype=np.int32))
    idx.finalize()
    assert_same(*both(idx, queries,
                      SearchParams(k=10, nprobe=8, max_codes=500,
                                   do_pruning=True)))
    # Same index through the QUAD layout (the flagship bench resolves to
    # quad; OPQ exercises the rotated-LUT path there too).
    idx.scan_layout = "quad"
    try:
        assert_same(*both(idx, queries,
                          SearchParams(k=10, nprobe=8, max_codes=500,
                                       do_pruning=True)))
    finally:
        idx.scan_layout = "auto"


def test_grouping_pallas_aggressive_pruning(built):
    """Regression: under heavy pruning the budget gate admits many probes
    (effective sizes are small) while each included probe still demands its
    FULL group chunk span — the chunk window must be provisioned for that
    demand, not for max_codes/CHUNK (+nprobe). With under-provisioning the
    tail chunks were silently dropped and the kernel returned worse results
    than the XLA engine."""
    idx, queries = built
    assert_same(*both(idx, queries,
                      SearchParams(k=10, nprobe=12, max_codes=100,
                                   do_pruning=True)))


def test_grouping_search_device_matches_host(built):
    """Grouping device-resident serving path vs host search API."""
    import jax.numpy as jnp
    idx, queries = built
    p = SearchParams(k=10, nprobe=8, max_codes=2000, do_pruning=True)
    idx.engine = "xla"
    d1, l1 = idx.search(queries, p)
    idx.engine = "auto"
    dd, ll = idx.search_device(jnp.asarray(queries[:16]), p, interpret=True)
    dd = np.asarray(dd).reshape(16, -1)
    ll = np.asarray(ll).reshape(16, -1)
    np.testing.assert_allclose(dd, d1[:16], rtol=1e-4, atol=1e-3)


def test_grouping_profiled_scan_budget(built):
    """A profiled scan_budget (scan_slot_demand max) caps the grouping
    kernel's chunk allocation without changing any result, with and
    without pruning."""
    idx, queries = built
    for extra in ({"do_pruning": True}, {}):
        base_p = SearchParams(k=5, nprobe=8, max_codes=600, **extra)
        dem = idx.scan_slot_demand(queries, base_p)
        assert dem.min() > 0
        capped = SearchParams(k=5, nprobe=8, max_codes=600,
                              scan_budget=int(dem.max()) * 256, **extra)
        idx.engine = "pallas_interpret"
        try:
            d1, l1 = idx.search(queries, base_p)
            d2, l2 = idx.search(queries, capped)
        finally:
            idx.engine = "auto"
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))
