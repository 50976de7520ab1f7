"""ADC posting-list scan, XLA version.

This is the TPU re-architecture of the reference's hot loop 2
(IndexIVF_HNSW.cpp:268-293): instead of walking std::vector posting lists with
a max-heap, we

1. turn the per-query probe set into a *static-length* flat gather index
   (:func:`probe_positions`) that reproduces the reference's `max_codes`
   budget semantics — probes are consumed in ascending centroid-distance
   order and scanning stops after the list that crosses the budget
   (IndexIVF_HNSW.cpp:290-292); the fixed tail is masked, and

2. evaluate the ADC decomposition ``d = term1 + ||y||^2 - 2<q, y_R>``
   (documented at IndexIVF_HNSW.cpp:206-233) as a batched LUT gather +
   top-k (:func:`adc_scan`).

A Pallas kernel with VMEM-resident LUTs replaces step 2 on TPU
(ivfhnsw_tpu.ops.pallas.adc_scan); this XLA version is the portable
reference implementation and the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ivfhnsw_tpu.ops.topk import topk_smallest


@functools.partial(jax.jit, static_argnames=("L",))
def probe_positions(probes: jax.Array, list_offsets: jax.Array,
                    max_codes: jax.Array, L: int):
    """Flatten per-query probe lists into fixed-length gather indices.

    probes: [B, nprobe] centroid ids sorted by ascending query-centroid
    distance. list_offsets: [nc + 1] int32/int64 prefix sums of list sizes.
    max_codes: scalar scan budget (0 = unlimited).

    Returns (pos [B, L] int32 — indices into the flat code arrays,
             seg [B, L] int32 — which probe slot each position belongs to,
             valid [B, L] bool,
             included [B, nprobe] bool — which probes made the budget).
    """
    nprobe = probes.shape[1]

    def per_query(p):
        sizes = (list_offsets[p + 1] - list_offsets[p]).astype(jnp.int32)
        cum_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])
        unlimited = max_codes <= 0
        included = jnp.logical_or(unlimited, cum_before < max_codes)
        eff = sizes * included
        bounds = jnp.cumsum(eff)                       # [nprobe]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), bounds[:-1]])
        j = jnp.arange(L, dtype=jnp.int32)
        seg = jnp.searchsorted(bounds, j, side="right").astype(jnp.int32)
        seg_c = jnp.minimum(seg, nprobe - 1)
        within = j - starts[seg_c]
        pos = (list_offsets[p[seg_c]].astype(jnp.int32) + within)
        valid = j < bounds[-1]
        pos = jnp.where(valid, pos, 0)
        return pos, seg_c, valid, included

    return jax.vmap(per_query)(probes)


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def adc_scan(luts: jax.Array, codes: jax.Array, bias: jax.Array,
             valid: jax.Array, k: int, precision=None):
    """ADC distance evaluation + top-k over a gathered scan window.

    luts:  [B, M, ksub] f32 per-query inner-product tables.
    codes: [B, L, M] uint8 gathered PQ codes.
    bias:  [B, L] f32 — precombined term1 + decoded norm (everything except
           the -2<q, y_R> LUT term).
    valid: [B, L] bool mask.

    Returns (dists [B, k] ascending, positions [B, k] int32 into the scan
    window).
    """
    idx = codes.astype(jnp.int32).transpose(0, 2, 1)          # [B, M, L]
    t3 = jnp.take_along_axis(luts, idx, axis=2)               # [B, M, L]
    t3 = jnp.sum(t3, axis=1)                                  # [B, L]
    dist = bias - 2.0 * t3
    dist = jnp.where(valid, dist, jnp.inf)
    return topk_smallest(dist, k)
