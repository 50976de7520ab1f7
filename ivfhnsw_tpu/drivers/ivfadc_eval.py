"""IVFADC end-to-end build + eval driver.

Equivalent of `test_ivfhnsw_sift1b` AND `test_ivfhnsw_deep1b`
(/root/reference/tests/test_ivfhnsw_sift1b.cpp, test_ivfhnsw_deep1b.cpp —
the two differ only in reader element type, which our IO layer keys off the
file extension). Also covers `test_sift1b_orca`'s add_batch2 exercise via
the -orca_obuf flag.

Usage (reference CLI grammar, see examples/):
    python -m ivfhnsw_tpu.drivers.ivfadc_eval -d 128 -nc 16384 \\
        -path_base b.bvecs -path_q q.bvecs -path_gt gt.ivecs ... \\
        -nprobe 32 -max_codes 10000 -k 10
    python -m ivfhnsw_tpu.drivers.ivfadc_eval -synthetic 0 -nb 200000 ...
"""

from __future__ import annotations

import jax
import numpy as np

from ivfhnsw_tpu import IVFADCIndex
from ivfhnsw_tpu.drivers import common as C


def main() -> dict:
    cfg, extras = C.parse_driver_args(("synthetic", "orca_obuf"))
    seed = int(extras["synthetic"]) if "synthetic" in extras else None
    ds = C.get_dataset(cfg, seed)
    index = IVFADCIndex(cfg.index)
    key = jax.random.PRNGKey(0)
    C.setup_quantizer(index, cfg, ds, key)
    C.setup_pq(index, cfg, ds, key)
    idxs = C.load_or_assign(index, cfg, ds)
    if "orca_obuf" in extras:
        # add_batch2 path (test_sift1b_orca.cpp:151-158): capture the ORCV
        # output buffer for the first batch as a smoke check.
        off, batch = next(ds.base_batches())
        n = batch.shape[0]
        buf = index.add_batch2(batch, np.arange(n, dtype=np.int32),
                               idxs[:n], np.arange(n, dtype=np.uint64))
        C.log(f"add_batch2 obuf: {len(buf)} bytes for {n} vectors")
        index.builder = type(index.builder)(index.nc, index.config.pq_m)
    C.build_or_read_index(index, cfg, ds, idxs)
    return C.eval_search(index, cfg, ds)


if __name__ == "__main__":
    main()
