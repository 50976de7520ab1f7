"""faiss-binary quantizer IO: readers/writers must match the faiss on-disk
byte layout (hand-built fixtures emulating faiss::write_ProductQuantizer /
write_VectorTransform — faiss itself is not installed here), and the index
save/load paths must round-trip through it."""

import struct

import numpy as np

from ivfhnsw_tpu.ops.opq import load_rotation, save_rotation
from ivfhnsw_tpu.ops.pq import NormQuantizer, ProductQuantizer
from ivfhnsw_tpu.utils import faiss_io


def faiss_pq_bytes(d, M, nbits, centroids):
    """Exactly what faiss::write_ProductQuantizer emits: three size_t fields
    then WRITEVECTOR(centroids) = u64 count + raw f32."""
    cb = np.asarray(centroids, "<f4").ravel()
    return (struct.pack("<QQQQ", d, M, nbits, cb.size) + cb.tobytes())


def faiss_ltra_bytes(A, b=()):
    """faiss::write_VectorTransform for a generic LinearTransform (OPQ):
    fourcc 'LTra', u8 have_bias, WRITEVECTOR A, WRITEVECTOR b, then the
    VectorTransform common fields i32 d_in, i32 d_out, u8 is_trained."""
    A = np.asarray(A, "<f4")
    d_out, d_in = A.shape
    b = np.asarray(b, "<f4")
    return (b"LTra" + struct.pack("<B", 1 if b.size else 0)
            + struct.pack("<Q", A.size) + A.tobytes()
            + struct.pack("<Q", b.size) + b.tobytes()
            + struct.pack("<iiB", d_in, d_out, 1))


def test_read_faiss_pq_fixture(tmp_path, rng):
    cb = rng.randn(16, 256, 8).astype(np.float32)
    p = str(tmp_path / "fixture.pq")
    with open(p, "wb") as f:
        f.write(faiss_pq_bytes(128, 16, 8, cb))
    assert faiss_io.is_faiss_pq(p)
    out = faiss_io.read_product_quantizer(p)
    np.testing.assert_array_equal(out, cb)


def test_write_matches_faiss_bytes(tmp_path, rng):
    cb = rng.randn(8, 256, 4).astype(np.float32)
    p = str(tmp_path / "ours.pq")
    faiss_io.write_product_quantizer(p, cb)
    with open(p, "rb") as f:
        ours = f.read()
    assert ours == faiss_pq_bytes(32, 8, 8, cb)


def test_norm_pq_is_faiss_pq_1_1_8(tmp_path, rng):
    """The reference's norm quantizer file is ProductQuantizer(1,1,8)."""
    nq = NormQuantizer(256)
    import jax.numpy as jnp
    nq.centroids = jnp.asarray(np.sort(rng.rand(256).astype(np.float32)))
    p = str(tmp_path / "norm.pq")
    nq.save(p)
    with open(p, "rb") as f:
        raw = f.read()
    assert raw[:32] == struct.pack("<QQQQ", 1, 1, 8, 256)
    nq2 = NormQuantizer.load(p)
    np.testing.assert_array_equal(np.asarray(nq2.centroids),
                                  np.asarray(nq.centroids))


def test_pq_roundtrip_faiss_format(tmp_path, rng):
    pq = ProductQuantizer(64, 8, 256)
    import jax.numpy as jnp
    pq.codebooks = jnp.asarray(rng.randn(8, 256, 8).astype(np.float32))
    p = str(tmp_path / "rt.pq")
    pq.save(p)
    pq2 = ProductQuantizer.load(p)
    assert (pq2.d, pq2.M, pq2.ksub) == (64, 8, 256)
    np.testing.assert_array_equal(np.asarray(pq2.codebooks),
                                  np.asarray(pq.codebooks))


def test_read_faiss_ltra_fixture(tmp_path, rng):
    A = rng.randn(32, 32).astype(np.float32)
    p = str(tmp_path / "fixture.opq")
    with open(p, "wb") as f:
        f.write(faiss_ltra_bytes(A))
    assert faiss_io.is_faiss_vector_transform(p)
    A2, b = faiss_io.read_vector_transform(p)
    np.testing.assert_array_equal(A2, A)
    assert b is None


def test_rotation_roundtrip_and_bytes(tmp_path, rng):
    from ivfhnsw_tpu.ops.opq import random_rotation
    import jax
    R = np.asarray(random_rotation(jax.random.PRNGKey(0), 32))
    p = str(tmp_path / "rt.opq")
    save_rotation(p, R)
    with open(p, "rb") as f:
        assert f.read() == faiss_ltra_bytes(R)
    np.testing.assert_array_equal(np.asarray(load_rotation(p)), R)


def test_legacy_formats_still_load(tmp_path, rng):
    """Round-1 caches used our own headers; the loaders must sniff them."""
    cb = rng.randn(4, 256, 8).astype(np.float32)
    p = str(tmp_path / "legacy.pq")
    with open(p, "wb") as f:
        np.asarray([32, 4, 256], "<u4").tofile(f)
        cb.astype("<f4").tofile(f)
    pq = ProductQuantizer.load(p)
    np.testing.assert_array_equal(np.asarray(pq.codebooks), cb)

    R = rng.randn(16, 16).astype(np.float32)
    p2 = str(tmp_path / "legacy.opq")
    with open(p2, "wb") as f:
        np.asarray([16], "<u4").tofile(f)
        R.astype("<f4").tofile(f)
    np.testing.assert_array_equal(np.asarray(load_rotation(p2)), R)
