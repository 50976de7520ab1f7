"""Measure chunk vs quad vs run scan layouts end-to-end on cached bench
indexes (primary + scale geometries — the small/medium list-size regimes the
run layout targets; scale2's 1024-code lists already favor quad).

The run layout (ops/pallas/adc_scan.py layout="run") moves RUN=4 consecutive
chunk tiles per DMA descriptor: same per-descriptor scalar floor as quad but
over the 256-aligned chunk store, so small lists don't pad whole 1024-lane
slots. This probe decides whether _resolve_layout's auto policy should
prefer "run" below the quad crossover.

Usage: python tools/layout_probe.py [--stage primary|scale|both]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ivfhnsw_tpu import IVFADCIndex, IndexConfig, SearchParams  # noqa: E402


def probe(idx, queries, nprobe, max_codes, layouts=("chunk", "quad", "run"),
          runs=3):
    from ivfhnsw_tpu.utils.recall import recall_at_k
    base = SearchParams(k=10, nprobe=nprobe, max_codes=max_codes)
    out = {}
    for layout in layouts:
        idx.scan_layout = layout
        try:
            dem = int(idx.scan_slot_demand(queries, base).max())
            gran = idx.scan_unit()
            p = SearchParams(k=10, nprobe=nprobe, max_codes=max_codes,
                             scan_budget=dem * gran)
            qps, labels = bench.timed_qps(idx, queries, p, runs=runs)
            out[layout] = {"us_per_query": 1e6 / qps, "slots": dem,
                           "labels": labels}
            print(f"  {layout:5s}: {1e6/qps:7.2f} us/q  ({dem} slots x "
                  f"{gran})", flush=True)
        except Exception as e:
            print(f"  {layout:5s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        finally:
            idx.release_device()
            idx.scan_layout = "auto"
    # Cross-layout agreement (exact same schedule semantics -> identical
    # label sets up to distance ties).
    ls = [v["labels"] for v in out.values() if "labels" in v]
    if len(ls) > 1:
        agree = min(float((ls[0] == o).mean()) for o in ls[1:])
        print(f"  label agreement vs {list(out)[0]}: {agree:.4f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both",
                    choices=("primary", "scale", "both"))
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    if args.stage in ("primary", "both"):
        idx, queries, _ = bench.build_primary(key)
        print(f"primary (nb={bench.NB}, nc={bench.NC}, "
              f"~{bench.NB//bench.NC} codes/list), nprobe={bench.NPROBE}, "
              f"mc={bench.MAX_CODES}:")
        probe(idx, queries, bench.NPROBE, bench.MAX_CODES)
        idx.release_device()

    if args.stage in ("scale", "both"):
        sidx, sq, _, _ = bench.build_scale(key)
        print(f"scale (nb={bench.S_NB}, nc={bench.S_NC}, "
              f"~{bench.S_NB//bench.S_NC} codes/list), "
              f"nprobe={bench.S_NPROBE}, mc={bench.S_MC}:")
        probe(sidx, sq, bench.S_NPROBE, bench.S_MC, runs=2)
        sidx.release_device()


if __name__ == "__main__":
    main()
