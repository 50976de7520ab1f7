"""OPQ rotation training by alternating PQ / procrustes updates.

Replaces faiss::OPQMatrix::train as invoked by the reference
(IndexIVF_HNSW.cpp:548-554 with niter=70; Grouping variant uses niter=100 at
IndexIVF_HNSW_Grouping.cpp:557-563). Convention matches faiss
LinearTransform: the rotation is applied as ``y = x @ R.T`` (apply), and
undone as ``x = y @ R`` (transform_transpose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ivfhnsw_tpu.ops.pq import ProductQuantizer


def random_rotation(key, d: int) -> jax.Array:
    """Haar-ish random orthogonal matrix via QR of a Gaussian."""
    g = jax.random.normal(key, (d, d), jnp.float32)
    q, r = jnp.linalg.qr(g)
    # Fix signs for a proper distribution.
    return q * jnp.sign(jnp.diagonal(r))[None, :]


def apply_rotation(x, R):
    return jnp.asarray(x, jnp.float32) @ R.T


def apply_rotation_transpose(y, R):
    return jnp.asarray(y, jnp.float32) @ R


def train_opq(key, data, M: int, niter: int = 25, niter_pq: int = 4,
              final_pq_niter: int = 25, ksub: int = 256, verbose: bool = False):
    """Train an OPQ rotation + PQ codebooks on `data` [n, d].

    Alternation: (1) rotate data, (2) a few Lloyd iterations of PQ warm-started
    from the previous codebooks, (3) orthogonal procrustes update of R against
    the PQ reconstruction (R = U V^T from SVD of recon^T X). Returns
    (R [d, d], ProductQuantizer trained on x @ R.T).
    """
    data = jnp.asarray(data, jnp.float32)
    n, d = data.shape
    k_rot, k_pq = jax.random.split(key)
    R = random_rotation(k_rot, d)
    pq = ProductQuantizer(d, M, ksub)
    init = None
    for it in range(niter):
        xr = apply_rotation(data, R)
        pq.train(k_pq, xr, niter=niter_pq, init=init)
        init = pq.codebooks
        recon = pq.decode(pq.encode(xr))                      # [n, d] in rotated space
        # min_R ||X R^T - recon||_F over orthogonal R  =>  R = U V^T,
        # U S V^T = svd(recon^T X).
        m = recon.T @ data
        u, _, vt = jnp.linalg.svd(m, full_matrices=False)
        R = u @ vt
        if verbose:
            err = float(jnp.mean(jnp.sum((apply_rotation(data, R) - recon) ** 2,
                                         axis=1)))
            print(f"  opq iter {it}: recon mse {err:.5f}")
    xr = apply_rotation(data, R)
    pq.train(k_pq, xr, niter=final_pq_niter, init=init)
    return R, pq


def save_rotation(path: str, R) -> None:
    """faiss write_VectorTransform layout (generic LinearTransform, the
    record faiss::OPQMatrix serializes to), so .opq artifacts interchange
    with the reference (test_ivfhnsw_sift1b.cpp:61,86). A == R because
    faiss applies y = A @ x and we apply x @ R.T."""
    from ivfhnsw_tpu.utils import faiss_io
    faiss_io.write_linear_transform(path, R)


def load_rotation(path: str):
    import numpy as np
    from ivfhnsw_tpu.utils import faiss_io
    if faiss_io.is_faiss_vector_transform(path):
        A, b = faiss_io.read_vector_transform(path)
        if b is not None:
            raise ValueError("OPQ rotation with bias is not supported")
        return jnp.asarray(A)
    # legacy [u32 d | f32 R]
    with open(path, "rb") as f:
        d = int(np.fromfile(f, "<u4", 1)[0])
        R = np.fromfile(f, "<f4", d * d).reshape(d, d)
    return jnp.asarray(R)
