"""ORCV persistent-index header (reference orcv.h:11-22).

Binary layout matches the C struct written by write2
(IndexIVF_HNSW.cpp:677-701): seven uint32 fields, two floats, one uint8
do_opq flag, padded to the C struct size of 40 bytes (alignment 4).
Defaults dmatch=4444.0 / dnear=8888.0 per IndexIVF_HNSW.h:90-91.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_FMT = "<7I2fB3x"  # 7*u32, 2*f32, u8, 3 pad bytes -> 40 bytes
assert struct.calcsize(_FMT) == 40


@dataclass
class OrcvHeader:
    n: int = 0
    nc: int = 0
    code_size: int = 0
    code_bytes: int = 0
    d: int = 0
    M: int = 16
    efConstruction: int = 500
    dmatch: float = 4444.0
    dnear: float = 8888.0
    do_opq: int = 0

    def pack(self) -> bytes:
        return struct.pack(_FMT, self.n, self.nc, self.code_size,
                           self.code_bytes, self.d, self.M,
                           self.efConstruction, self.dmatch, self.dnear,
                           self.do_opq)

    def write(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.pack())

    @classmethod
    def read(cls, path: str) -> "OrcvHeader":
        with open(path, "rb") as f:
            vals = struct.unpack(_FMT, f.read(40))
        return cls(*vals)


def load_home_dir(home_dir: str, centroids_path: str = ""):
    """Load an ORCV persistent home dir (the write2 export,
    IndexIVF_HNSW.cpp:672-755) back into an IVFADCIndex.

    The home dir carries codes/norm-codes/centroid-norms but (per the
    reference's format) not the PQ codebooks or ids — those live in separate
    .pq artifacts and the per-vector record stream. This loader restores
    what the format contains: header + per-centroid code/norm-code lists +
    centroid norms; the caller supplies centroids (the external k-means
    file) and quantizers, and ids default to insertion order.
    """
    import os

    import numpy as np

    from ivfhnsw_tpu.models.ivfadc import IVFADCIndex
    from ivfhnsw_tpu.models.storage import store_from_lists
    from ivfhnsw_tpu.utils import io
    from ivfhnsw_tpu.utils.config import IndexConfig

    hdr = OrcvHeader.read(os.path.join(home_dir, "hdr.vec"))
    cfg = IndexConfig(d=hdr.d, nc=hdr.nc, code_size=hdr.code_size,
                      do_opq=bool(hdr.do_opq), M=hdr.M,
                      efConstruction=hdr.efConstruction)
    index = IVFADCIndex(cfg)
    index.dmatch, index.dnear = hdr.dmatch, hdr.dnear
    if centroids_path:
        index.load_centroids(centroids_path)
    with open(os.path.join(home_dir, "pq.vec"), "rb") as f:
        codes = [io.read_len_vector(f, "u1").reshape(-1, cfg.pq_m)
                 for _ in range(hdr.nc)]
    with open(os.path.join(home_dir, "normpq.vec"), "rb") as f:
        ncodes = [io.read_len_vector(f, "u1") for _ in range(hdr.nc)]
    with open(os.path.join(home_dir, "cnorms.vec"), "rb") as f:
        cnorms = io.read_len_vector(f, "<f4")
    next_id = 0
    per_list = []
    for c in range(hdr.nc):
        n = len(ncodes[c])
        per_list.append((np.arange(next_id, next_id + n, dtype=np.int32),
                         codes[c], ncodes[c]))
        next_id += n
    index.store = store_from_lists(hdr.nc, cfg.pq_m, per_list)
    if cnorms.size == hdr.nc:
        import jax.numpy as jnp
        index.centroid_norms = jnp.asarray(cnorms.copy())
    return index, hdr
