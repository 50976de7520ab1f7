"""Measure chunk vs quad scan layouts end-to-end on cached bench indexes
at PROFILED scan budgets — the data behind _resolve_layout's auto
crossover (re-fit to 416 codes/list in round 3).

Round-3 measurements (v5e, sustained, profiled budgets):
  152 codes/list (scale):    chunk 37.7 | quad 57.5 | run 45.3 us/q
  325 codes/list (midband):  chunk 12.6 | quad 16.8 | run 15.0
  488 codes/list (primary):  chunk 11.8 | quad  9.3 | run 10.9
A run-granular engine (RUN=4 chunk tiles per DMA) was measured here and
deleted — dominated at every geometry (see adc_scan.py header note).

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


def probe(idx, queries, nprobe, max_codes, layouts=("chunk", "quad"),
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
            # reshape=None -> search_device picks its own SMEM-safe
            # sub-batching (a forced B=1024 at ~130 slots pads the
            # prefetch operand past the 1 MB SMEM).
            qps, labels = bench.timed_qps(idx, queries, p, runs=runs,
                                          reshape=None)
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
