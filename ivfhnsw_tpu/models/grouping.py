"""IVFADC + Grouping (+Pruning) — TPU-native equivalent of
`ivfhnsw::IndexIVF_HNSW_Grouping` (/root/reference/IndexIVF_HNSW_Grouping.*).

Implementation lands in the grouping milestone; this module currently exposes
the class shell so the package surface is stable.
"""

from __future__ import annotations

from ivfhnsw_tpu.models.ivfadc import IVFADCIndex
from ivfhnsw_tpu.utils.config import IndexConfig


class IVFADCGroupingIndex(IVFADCIndex):
    def __init__(self, config: IndexConfig):
        if config.nsubc <= 0:
            raise ValueError("grouping index requires nsubc > 0")
        super().__init__(config)
        self.nsubc = config.nsubc
