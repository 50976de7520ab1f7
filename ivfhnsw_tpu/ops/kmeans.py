"""Batched Lloyd's k-means on the MXU.

This is the trainer the reference *outsources*: coarse centroids are an input
file produced by an external k-means tool (README.md:56,62; Parser.h:54), and
PQ codebooks come from faiss's ProductQuantizer::train. Here both are
first-class:

- :func:`kmeans` — streaming Lloyd's for large k (coarse centroids, up to
  2^20): data and centroids are both processed in blocks so nothing [n, k]
  ever materializes.
- :func:`kmeans_batched` — vmapped small-k variant for PQ subspace codebooks
  (M independent (n, dsub) -> 256 problems in one call) and the 1-D norm
  quantizer.

Empty clusters keep their previous centroid (faiss instead splits the largest
cluster; at our sample-to-cluster ratios empties are rare and keeping the old
centroid is recall-neutral — revisit if a dataset disagrees).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ivfhnsw_tpu.ops.distances import assign_top1, l2sqr_pairwise


@functools.partial(jax.jit, static_argnames=("k", "block_c", "precision"))
def _stream_iter(data_blocks, valid, centroids, k: int, block_c: int,
                 precision=None):
    """One Lloyd iteration over pre-blocked data [nb, bs, d] with a validity
    mask [nb, bs]. Returns (sums [k, d], counts [k], sse)."""

    def body(carry, xs):
        sums, counts, sse = carry
        blk, msk = xs
        dist, idx = assign_top1(blk, centroids, block=block_c,
                                precision=precision)
        w = msk.astype(jnp.float32)
        sums = sums + jax.ops.segment_sum(blk * w[:, None], idx,
                                          num_segments=k)
        counts = counts + jax.ops.segment_sum(w, idx, num_segments=k)
        sse = sse + jnp.sum(dist * w)
        return (sums, counts, sse), None

    init = (jnp.zeros((k, data_blocks.shape[-1]), jnp.float32),
            jnp.zeros((k,), jnp.float32), jnp.float32(0.0))
    (sums, counts, sse), _ = jax.lax.scan(body, init, (data_blocks, valid))
    return sums, counts, sse


def kmeans(key, data, k: int, niter: int = 25, block_c: int = 16384,
           block_n: int = 131072, precision=None, verbose: bool = False):
    """Streaming Lloyd's k-means. data: [n, d] (numpy or jax). Returns
    (centroids [k, d] f32, final mean squared error)."""
    data = np.asarray(data, dtype=np.float32)
    n, d = data.shape
    if n < k:
        raise ValueError(f"kmeans: n={n} < k={k}")
    block_n = min(block_n, max(8, n))
    nb = -(-n // block_n)
    n_pad = nb * block_n
    padded = np.zeros((n_pad, d), np.float32)
    padded[:n] = data
    valid = np.zeros((n_pad,), np.bool_)
    valid[:n] = True
    data_blocks = jnp.asarray(padded.reshape(nb, block_n, d))
    valid = jnp.asarray(valid.reshape(nb, block_n))

    perm = jax.random.permutation(key, n)[:k]
    centroids = jnp.asarray(data[np.asarray(perm)])

    sse = jnp.float32(0.0)
    for it in range(niter):
        sums, counts, sse = _stream_iter(data_blocks, valid, centroids, k,
                                         block_c, precision)
        nonempty = counts > 0
        centroids = jnp.where(nonempty[:, None],
                              sums / jnp.maximum(counts, 1.0)[:, None],
                              centroids)
        if verbose:
            print(f"  kmeans iter {it}: mse={float(sse) / n:.4f} "
                  f"empty={int(jnp.sum(~nonempty))}")
    return centroids, float(sse) / n


@functools.partial(jax.jit, static_argnames=("k", "niter", "precision"))
def kmeans_batched(key, data, k: int, niter: int = 25, precision=None,
                   init=None):
    """Lloyd's k-means over a batch of independent problems.

    data: [B, n, d]; returns centroids [B, k, d]. Used for PQ subspace
    codebooks (B = M subquantizers) and the norm quantizer (B=1, d=1).
    Fully jitted: the iteration loop is unrolled at trace time.

    init: optional warm-start centroids [B, k, d] (used by the OPQ
    alternation, which re-trains PQ a few iterations per rotation update).
    """
    B, n, d = data.shape
    data = data.astype(jnp.float32)
    keys = jax.random.split(key, B)

    def init_one(kk, x):
        idx = jax.random.permutation(kk, n)[:k]
        return x[idx]

    centroids = jax.vmap(init_one)(keys, data) if init is None else init

    def one_iter(cent, x):
        dists = l2sqr_pairwise(x, cent, precision=precision)
        idx = jnp.argmin(dists, axis=1)
        sums = jax.ops.segment_sum(x, idx, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), idx,
                                     num_segments=k)
        nonempty = counts > 0
        return jnp.where(nonempty[:, None],
                         sums / jnp.maximum(counts, 1.0)[:, None], cent)

    for _ in range(niter):
        centroids = jax.vmap(one_iter)(centroids, data)
    return centroids
