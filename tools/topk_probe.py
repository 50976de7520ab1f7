"""Flat lax.top_k vs binned_topk_smallest over the masked scan output.

The Pallas scan's wide output is the top-k input: ~20k lanes at the
primary point, ~54k at scale3 (212 chunk slots), ~170k at scale2 (166
quad slots). Round-2 measured flat top_k marginally faster at 20k lanes
(0.96 vs 0.99 us/q) and the note in adc_scan.adc_search_tiles froze that
choice — but lax.top_k is sort-bound LINEAR in width, while the binned
pass's width-proportional part is a bandwidth-trivial min-reduce, so the
crossover matters at canonical geometry (scale2 measured 9.2 us/q of
top-k in tools/scale_probe.py — ~15% of the whole query).

Measures both (+ bin sizes 32/64/128) at the three production widths for
k=10 and k=100 on +inf-masked data with realistic finite density, and
prints the crossover. Feeds the width-dependent engine choice in
ops/pallas/adc_scan.py.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ivfhnsw_tpu.ops.topk import (binned_topk_smallest,  # noqa: E402
                                  topk_smallest)
from perf_probe import marginal_ms  # noqa: E402


def main():
    B = 512
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    for width, finite_frac, tag in ((20_480, 0.6, "primary"),
                                    (54_272, 0.55, "scale3"),
                                    (169_984, 0.62, "scale2")):
        kd, km = jax.random.split(jax.random.fold_in(key, width))
        x = jax.random.normal(kd, (B, width), jnp.float32) * 100.0
        mask = jax.random.uniform(km, (B, width)) < finite_frac
        x = jnp.where(mask, x, jnp.inf)
        x = jax.block_until_ready(x)
        for k in (10, 100):
            flat = jax.jit(functools.partial(topk_smallest, k=k))
            ref_v, _ = jax.block_until_ready(flat(x))
            ms_flat = marginal_ms(flat, x)
            line = (f"{tag:8s} width={width:7d} k={k:3d}  "
                    f"flat {ms_flat * 1e3 / B:6.2f} us/q")
            for bs in (32, 64, 128):
                fn = jax.jit(functools.partial(binned_topk_smallest,
                                               k=k, bin_size=bs))
                v, _ = jax.block_until_ready(fn(x))
                ok = bool(jnp.allclose(
                    jnp.where(jnp.isfinite(v), v, 0.0),
                    jnp.where(jnp.isfinite(ref_v), ref_v, 0.0),
                    atol=1e-4))
                ms = marginal_ms(fn, x)
                line += (f"  bin{bs} {ms * 1e3 / B:6.2f}"
                         f"{'' if ok else ' MISMATCH'}")
            print(line)


if __name__ == "__main__":
    main()
