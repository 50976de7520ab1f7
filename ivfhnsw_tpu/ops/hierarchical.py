"""Two-level coarse quantizer for billion-scale assignment.

The exact matmul assigner costs n * nc * d FLOPs; at nb=10^9 and nc=2^20
that is ~2.6e17 * d flops — hours even on TPU (SURVEY.md §7 hard part #3;
the reference's CPU took 2-3 days, README.md:65). The standard fix is a
two-level search: cluster the nc centroids into ~sqrt(nc) super-centroids,
route each point to its `w` nearest super-clusters, and do the exact argmin
only over those clusters' centroids.

With w ~ 8-16 the recall against the exact assignment is >99% at ~1/30 the
FLOPs; :func:`TwoLevelAssigner.assign` also reports the exact-match rate on
a validation sample so the accuracy/TCO trade-off is measured, not assumed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ivfhnsw_tpu.ops.distances import streaming_topk_l2
from ivfhnsw_tpu.ops.kmeans import kmeans

HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("w", "cap", "precision"))
def _two_level_assign(x, supers, super_sqn, members, member_valid,
                      centroids, centroid_norms, w: int, cap: int,
                      precision=HIGHEST):
    """x [B, d]; supers [ns, d]; members [ns, cap] centroid ids per super
    cluster (padded, member_valid mask). Returns (dist [B], idx [B])."""
    _, top_s = streaming_topk_l2(x, supers, w, block=supers.shape[0],
                                 point_sqnorms=super_sqn,
                                 precision=precision)           # [B, w]
    cand = members[top_s].reshape(x.shape[0], w * cap)          # [B, w*cap]
    valid = member_valid[top_s].reshape(x.shape[0], w * cap)
    cc = centroids[cand]                                        # [B, wc, d]
    ip = jnp.einsum("bkd,bd->bk", cc, x, precision=precision,
                    preferred_element_type=jnp.float32)
    d2 = (jnp.sum(x ** 2, axis=1)[:, None] - 2.0 * ip
          + centroid_norms[cand])
    d2 = jnp.where(valid, d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    return (jnp.take_along_axis(d2, j[:, None], 1)[:, 0],
            jnp.take_along_axis(cand, j[:, None], 1)[:, 0].astype(jnp.int32))


class TwoLevelAssigner:
    """Approximate nearest-centroid assigner: k-means over the centroid set
    + routed exact argmin."""

    def __init__(self, centroids, n_super: int | None = None, w: int = 8,
                 key=None, niter: int = 15):
        centroids = np.asarray(centroids, np.float32)
        nc, d = centroids.shape
        self.w = w
        # Fine supers (avg ~64 members) keep the per-point candidate set
        # w*cap small; sqrt(nc) supers made it O(sqrt(nc)) per probe.
        n_super = n_super or max(16, min(nc // 2, nc // 64 or 16))
        key = key if key is not None else jax.random.PRNGKey(0)
        sup, _ = kmeans(key, centroids, n_super, niter=niter)
        self.supers = sup
        self.super_sqn = jnp.sum(sup ** 2, axis=1)

        # Capacity-bounded membership. cap = counts.max() is a footgun: one
        # skewed super (k-means over centroids can collapse) inflates every
        # point's gather to w*cap — observed cap ~= 21x average at nc=2^17,
        # a 4 TB intermediate. Instead: hard cap at 4x the average and
        # greedily spill overflow to the centroid's next-nearest super with
        # room (processed nearest-first so spills are the far members).
        n_choice = min(8, n_super)
        cd, cids = streaming_topk_l2(jnp.asarray(centroids), jnp.asarray(sup),
                                     n_choice, point_sqnorms=self.super_sqn)
        cd, cids = np.asarray(cd), np.asarray(cids)
        cap = max(8, -(-4 * nc // n_super))
        members = np.zeros((n_super, cap), np.int32)
        valid = np.zeros((n_super, cap), bool)
        fill = np.zeros(n_super, np.int64)
        for c in np.argsort(cd[:, 0], kind="stable"):
            placed = False
            for s in cids[c]:
                if fill[s] < cap:
                    members[s, fill[s]] = c
                    valid[s, fill[s]] = True
                    fill[s] += 1
                    placed = True
                    break
            if not placed:  # all n_choice full; total capacity is 4*nc, so
                s = int(np.argmin(fill))          # a least-full super exists
                members[s, fill[s]] = c
                valid[s, fill[s]] = True
                fill[s] += 1
        self.members = jnp.asarray(members)
        self.member_valid = jnp.asarray(valid)
        self.cap = cap
        self.centroids = jnp.asarray(centroids)
        self.centroid_norms = jnp.sum(self.centroids ** 2, axis=1)

    def assign(self, x, batch: int = 65536) -> np.ndarray:
        x = np.asarray(x, np.float32)
        # The gathered candidate block is [B, w*cap, d] f32 — bound it to
        # ~2 GB regardless of geometry.
        d = x.shape[1] if x.ndim == 2 else 1
        batch = min(batch, max(512, (1 << 29) // max(self.w * self.cap * d, 1)))
        out = np.empty(x.shape[0], np.int32)
        for off in range(0, x.shape[0], batch):
            _, idx = _two_level_assign(
                jnp.asarray(x[off:off + batch]), self.supers, self.super_sqn,
                self.members, self.member_valid, self.centroids,
                self.centroid_norms, w=self.w, cap=self.cap)
            out[off:off + batch] = np.asarray(idx)
        return out

    def exact_match_rate(self, x_sample, exact_assign_fn) -> float:
        """Fraction of sample points routed to the true nearest centroid."""
        approx = self.assign(x_sample)
        exact = exact_assign_fn(x_sample)
        return float((approx == np.asarray(exact)).mean())
