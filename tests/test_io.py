import io as _io
import numpy as np
import pytest

from ivfhnsw_tpu.utils import io


def test_xvec_roundtrip(tmp_path, rng):
    for dtype, ext in [(np.uint8, ".bvecs"), (np.float32, ".fvecs"),
                       (np.int32, ".ivecs")]:
        path = str(tmp_path / f"x{ext}")
        data = (rng.rand(100, 16) * 100).astype(dtype)
        io.write_xvec(path, data)
        assert io.infer_xvec_dim(path, dtype) == 16
        assert io.xvec_count(path, 16, dtype) == 100
        back = io.read_xvec(path, 16)
        np.testing.assert_array_equal(back, data)
        # Offset + partial read
        np.testing.assert_array_equal(io.read_xvec(path, 16, 10, 5),
                                      data[5:15])


def test_xvec_dim_mismatch(tmp_path, rng):
    path = str(tmp_path / "x.fvecs")
    io.write_xvec(path, rng.rand(10, 8).astype(np.float32))
    with pytest.raises(ValueError):
        io.read_xvec(path, 16)


def test_xvec_fvec_promotes(tmp_path, rng):
    path = str(tmp_path / "x.bvecs")
    data = (rng.rand(20, 4) * 255).astype(np.uint8)
    io.write_xvec(path, data)
    out = io.read_xvec_fvec(path, 4)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data.astype(np.float32))


def test_iter_batches(tmp_path, rng):
    path = str(tmp_path / "x.fvecs")
    data = rng.rand(25, 4).astype(np.float32)
    io.write_xvec(path, data)
    batches = list(io.iter_xvec_batches(path, 4, 10))
    assert [b.shape[0] for b in batches] == [10, 10, 5]
    np.testing.assert_array_equal(np.concatenate(batches), data)


def test_len_vector_roundtrip(rng):
    buf = _io.BytesIO()
    v = rng.rand(17).astype(np.float32)
    io.write_len_vector(buf, v)
    io.write_variable(buf, 42, "<u8")
    buf.seek(0)
    np.testing.assert_array_equal(io.read_len_vector(buf, "<f4"), v)
    assert io.read_variable(buf, "<u8") == 42


def test_xvec_file_gather(tmp_path, rng):
    path = str(tmp_path / "x.bvecs")
    data = (rng.rand(50, 8) * 255).astype(np.uint8)
    io.write_xvec(path, data)
    f = io.XvecFile(path, 8)
    assert len(f) == 50
    got = f.gather([3, 7, 3])
    np.testing.assert_array_equal(got, data[[3, 7, 3]].astype(np.float32))


def test_random_subset_deterministic(rng):
    data = rng.rand(100, 4).astype(np.float32)
    a = io.random_subset(data, 10)
    b = io.random_subset(data, 10)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (10, 4)


def test_prefetch_preserves_order_and_values():
    items = [(i, np.full((4,), i)) for i in range(20)]
    got = list(io.prefetch(iter(items), depth=3))
    assert [o for o, _ in got] == list(range(20))
    for (_, a), (_, b) in zip(got, items):
        np.testing.assert_array_equal(a, b)


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 0, np.zeros(2)
        raise RuntimeError("decode failed")

    it = io.prefetch(gen(), depth=2)
    assert next(it)[0] == 0
    try:
        next(it)
    except RuntimeError as e:
        assert "decode failed" in str(e)
    else:
        raise AssertionError("producer exception not propagated")


def test_prefetch_early_abandon_stops_producer():
    import threading

    produced = []
    release = threading.Event()

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i, None
            if i > 2:
                # producer should be stopped long before the tail
                release.wait(0.01)

    it = io.prefetch(gen(), depth=1)
    assert next(it)[0] == 0
    it.close()  # abandon; the finally-block signals the producer to stop
    release.set()
    import time
    time.sleep(0.3)
    assert len(produced) < 1000


def test_file_dataset_total_base_counts_without_decode(tmp_path, rng):
    from ivfhnsw_tpu.drivers.common import FileDataset
    from ivfhnsw_tpu.utils.config import IndexConfig, RunConfig

    d = 8
    base = (rng.rand(37, d) * 255).astype(np.uint8)
    queries = rng.rand(5, d).astype(np.float32)
    gt = np.zeros((5, 1), np.int32)
    pb = str(tmp_path / "base.bvecs")
    pq_ = str(tmp_path / "q.fvecs")
    pg = str(tmp_path / "gt.ivecs")
    io.write_xvec(pb, base)
    io.write_xvec(pq_, queries)
    io.write_xvec(pg, gt)
    cfg = RunConfig(index=IndexConfig(d=d, nc=4), nq=5, ngt=1,
                    path_base=pb, path_q=pq_, path_gt=pg)
    ds = FileDataset(cfg)
    assert ds.total_base == 37
    batches = list(ds.base_batches(batch=10))
    assert sum(b.shape[0] for _, b in batches) == 37


@pytest.mark.parametrize("force_fallback", [False, True])
def test_write_len_series_matches_per_record_loop(tmp_path, rng,
                                                 force_fallback,
                                                 monkeypatch):
    """write_len_series (one interleave pass over a flat payload) must emit
    bytes identical to nc write_len_vector calls, for ragged u4 and u8
    payloads — native path and Python fallback."""
    from ivfhnsw_tpu.utils import native

    if force_fallback:
        monkeypatch.setattr(native, "available", lambda: False)
    counts = np.asarray([3, 0, 5, 1, 2], np.int64)
    ids = (rng.rand(int(counts.sum())) * 1e6).astype("<u4")
    codes = (rng.rand(int(counts.sum()), 4) * 255).astype(np.uint8)

    p1, p2 = str(tmp_path / "series.bin"), str(tmp_path / "loop.bin")
    with open(p1, "wb") as f:
        io.write_len_series(f, ids, counts)
        io.write_len_series(f, codes, counts * 4)
    with open(p2, "wb") as f:
        pos = 0
        for c in counts:
            io.write_len_vector(f, ids[pos:pos + c])
            pos += c
        pos = 0
        for c in counts:
            io.write_len_vector(f, codes[pos:pos + c])
            pos += c
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_write_read_len_rows_roundtrip(tmp_path, rng):
    rows = (rng.rand(7, 5) * 1e5).astype("<f4")
    p = str(tmp_path / "rows.bin")
    with open(p, "wb") as f:
        io.write_len_rows(f, rows)
        io.write_len_vector(f, np.asarray([1.5], "<f4"))   # trailing data
    buf = np.fromfile(p, np.uint8)
    got, pos = io.read_len_rows(buf, 0, 7, 5, "<f4")
    np.testing.assert_array_equal(got, rows)
    assert int(buf[pos:pos + 4].view("<u4")[0]) == 1
