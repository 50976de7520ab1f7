"""Top-k helpers: smallest-k selection and pairwise merge.

These replace the reference's faiss max-heap usage (maxheap_heapify/push at
IndexIVF_HNSW.cpp:265,282-289) with `lax.top_k` — the heap is a CPU idiom;
on TPU a full-block sort/select is the fast path and composes with blockwise
streaming merges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_smallest(x: jax.Array, k: int):
    """k smallest entries along the last axis, ascending. If k exceeds the
    axis size, the result is padded with +inf values (index 0).
    Returns (values, indices)."""
    n = x.shape[-1]
    if k > n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, k - n)]
        x = jnp.pad(x, pad, constant_values=jnp.inf)
    neg, idx = jax.lax.top_k(-x, k)
    return -neg, jnp.minimum(idx, n - 1)


def merge_topk(d_a: jax.Array, i_a: jax.Array, d_b: jax.Array, i_b: jax.Array,
               k: int):
    """Merge two (dists, ids) top-k sets along the last axis into one."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    best_d, sel = topk_smallest(d, k)
    best_i = jnp.take_along_axis(i, sel, axis=-1)
    return best_d, best_i
