"""Build-only driver with ORCV export.

Equivalent of `tests/mkindex.cpp` (/root/reference/tests/mkindex.cpp:187,195):
grouping pipeline, no query eval; exports the ORCV persistent home dir via
write2 and dumps inter-centroid distances to `centriods.log` (sic — the
reference's filename).

Flags: -orcv_home DIR for the write2 export target.
"""

from __future__ import annotations

from ivfhnsw_tpu.drivers import common as C
from ivfhnsw_tpu.drivers.grouping_eval import build


def main() -> None:
    cfg, extras = C.parse_driver_args(("synthetic", "orcv_home"))
    index, ds = build(cfg, extras)
    index.dump_inter_centroid_dists("centriods.log")
    C.log("wrote centriods.log")
    if "orcv_home" in extras:
        index.write2(extras["orcv_home"], n_vecs=index.store.ntotal)
        C.log(f"ORCV export -> {extras['orcv_home']}")


if __name__ == "__main__":
    main()
