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
