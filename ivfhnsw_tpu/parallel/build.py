"""Sharded index-build step: data-parallel assign + PQ-encode over a mesh.

This is the TPU analog of the reference's OpenMP `assign` sweep
(IndexIVF_HNSW.cpp:68-72) at pod scale: base-vector batches are sharded over
the mesh (data parallel); the centroid table is sharded by range and
all-gathered fsdp-style for the local top-1 sweep; codes come back sharded by
batch. One step of this, streamed over a 1B-vector corpus, is the "assign +
encode in hours" path (BASELINE.md north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ivfhnsw_tpu.ops.distances import assign_top1
from ivfhnsw_tpu.parallel.mesh import SHARD_AXIS

HIGHEST = jax.lax.Precision.HIGHEST


def make_assign_encode_step(mesh, coarse_block: int = 16384,
                            precision=HIGHEST):
    """Returns a jitted step:
        (x [B, d] sharded-by-batch,
         centroids [D, nc_loc, d] sharded,
         codebooks [M, ksub, dsub] replicated)
      -> (keys [B] int32, codes [B, M] uint8, residual_norms [B] f32)
    with B sharded over the mesh.
    """

    def fn(x, centroids, codebooks):
        x = x  # [B_loc, d] local batch
        cents = jax.lax.all_gather(centroids[0], SHARD_AXIS,
                                   tiled=True)            # [nc, d]
        dist, keys = assign_top1(x, cents, block=coarse_block,
                                 precision=precision)
        residuals = x - cents[keys]
        from ivfhnsw_tpu.ops.pq import _pq_encode
        codes = _pq_encode(residuals, codebooks, precision=precision)
        rnorm = jnp.sum(residuals ** 2, axis=1)
        return keys.astype(jnp.int32), codes, rnorm

    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P()),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        check_vma=False)
    return jax.jit(mapped)
