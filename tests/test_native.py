"""Native C++ data-plane tests: results must be identical to the numpy
fallback paths, and the library must build on demand."""

import numpy as np
import pytest

from ivfhnsw_tpu.utils import io, native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_builds(lib_ok):
    assert native.available()


def test_xvec_read_matches_numpy(lib_ok, tmp_path, rng):
    for dtype, ext in [(np.uint8, ".bvecs"), (np.float32, ".fvecs"),
                       (np.int32, ".ivecs")]:
        path = str(tmp_path / f"x{ext}")
        data = (rng.rand(500, 24) * 200).astype(dtype)
        io.write_xvec(path, data)
        nat = native.xvec_read_f32(path, 24, 100, offset=37, dtype=dtype)
        ref = io.read_xvec(path, 24, 100, 37, dtype=dtype).astype(np.float32)
        np.testing.assert_array_equal(nat, ref)


def test_xvec_read_rejects_bad_dim(lib_ok, tmp_path, rng):
    path = str(tmp_path / "x.fvecs")
    io.write_xvec(path, rng.rand(10, 8).astype(np.float32))
    assert native.xvec_read_f32(path, 16, 5, dtype=np.float32) is None


def test_lenvec_series_roundtrip(lib_ok, rng):
    import io as _io
    bufio = _io.BytesIO()
    parts = [rng.randint(0, 255, rng.randint(0, 50)).astype("u1")
             for _ in range(200)]
    for p in parts:
        io.write_len_vector(bufio, p)
    buf = np.frombuffer(bufio.getvalue(), np.uint8)
    data, counts, end = native.lenvec_series(buf, 0, 200, "u1")
    assert end == buf.size
    np.testing.assert_array_equal(counts, [len(p) for p in parts])
    np.testing.assert_array_equal(data, np.concatenate(parts))


def test_lenvec_series_corrupt_raises(lib_ok):
    buf = np.frombuffer(np.asarray([1000], "<u4").tobytes() + b"xx",
                        np.uint8).copy()
    with pytest.raises(ValueError):
        native.lenvec_series(buf, 0, 1, "u1")


def test_index_read_native_matches(lib_ok, tmp_path, rng):
    """Index read via native series parser == store built through add."""
    import jax
    from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams
    base = rng.randn(4000, 16).astype(np.float32)
    idx = IVFADCIndex(IndexConfig(d=16, nc=32, code_size=4))
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:2000], niter=8)
    idx.train_pq(key, base[:2000], pq_niter=8)
    idx.add_batch(base, np.arange(4000, dtype=np.int32))
    idx.finalize()
    path = str(tmp_path / "n.index")
    idx.write(path)
    idx2 = IVFADCIndex(idx.config)
    idx2.set_centroids(np.asarray(idx.centroids))
    idx2.pq, idx2.norm_pq = idx.pq, idx.norm_pq
    idx2.read(path)
    np.testing.assert_array_equal(np.asarray(idx.store.codes),
                                  np.asarray(idx2.store.codes))
    np.testing.assert_array_equal(np.asarray(idx.store.ids),
                                  np.asarray(idx2.store.ids))
    np.testing.assert_array_equal(np.asarray(idx.store.list_offsets),
                                  np.asarray(idx2.store.list_offsets))
