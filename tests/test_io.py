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
