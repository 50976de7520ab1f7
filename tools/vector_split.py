"""Split a base xvec file (+ optional precomputed-idxs file) into equal
segments for the incremental-add driver.

Equivalent of /root/reference/tools/vector_split.cpp:100-228; the reference
allows segment counts {10, 20, 50} (:258-263) — here any count >= 2.

Usage:
    python tools/vector_split.py -path_base b.bvecs -d 128 -segments 10 \\
        [-path_precomputed_idxs idxs.ivecs] [-out_dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivfhnsw_tpu.utils import io  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-path_base", required=True)
    ap.add_argument("-path_precomputed_idxs", default="")
    ap.add_argument("-d", type=int, required=True)
    ap.add_argument("-segments", type=int, default=10)
    ap.add_argument("-out_dir", default="")
    args = ap.parse_args()

    out_dir = args.out_dir or os.path.dirname(args.path_base) or "."
    os.makedirs(out_dir, exist_ok=True)
    stem, ext = os.path.splitext(os.path.basename(args.path_base))
    dtype = io.XVEC_DTYPES[ext]
    total = io.xvec_count(args.path_base, args.d, dtype)
    per = -(-total // args.segments)
    print(f"{total} vectors -> {args.segments} segments of <= {per}")

    for i in range(args.segments):
        off = i * per
        n = min(per, total - off)
        if n <= 0:
            break
        seg = io.read_xvec(args.path_base, args.d, n, off, dtype=dtype)
        out = os.path.join(out_dir, f"{stem}_{i:02d}{ext}")
        io.write_xvec(out, seg)
        print(f"wrote {out} ({n} vectors)")

    if args.path_precomputed_idxs:
        # The idx file is stored in 1M-record xvec batches; re-emit per
        # segment with the same batch framing.
        out_chunks = []
        with open(args.path_precomputed_idxs, "rb") as f:
            while True:
                hdr = np.fromfile(f, "<u4", 1)
                if hdr.size == 0:
                    break
                out_chunks.append(np.fromfile(f, "<u4", int(hdr[0])))
        idxs = np.concatenate(out_chunks)
        istem, iext = os.path.splitext(
            os.path.basename(args.path_precomputed_idxs))
        for i in range(args.segments):
            off = i * per
            n = min(per, total - off)
            if n <= 0:
                break
            blk = idxs[off:off + n].astype("<u4")
            out = os.path.join(out_dir, f"{istem}_{i:02d}{iext}")
            with open(out, "wb") as f:
                np.asarray([blk.size], "<u4").tofile(f)
                blk.tofile(f)
            print(f"wrote {out} ({n} idxs)")


if __name__ == "__main__":
    main()
