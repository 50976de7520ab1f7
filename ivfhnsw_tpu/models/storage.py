"""Flat posting-list storage.

The reference keeps one std::vector per centroid for ids / PQ codes / norm
codes (IndexIVF_HNSW.h:64-66). On a dense-tensor machine the equivalent is a
flat layout sorted by centroid:

    codes       [N, M]  uint8
    ids         [N]     int32   (SIFT1B ids < 2^31; reference idx_t is u32)
    norm_codes  [N]     uint8
    list_offsets[nc+1]  int32   prefix sums, list i = rows [off[i], off[i+1])

Construction accumulates append batches host-side and finalizes with a stable
argsort by centroid key, which preserves the reference's push_back insertion
order within each list (IndexIVF_HNSW.cpp:124-133). Incremental add
(the vector_add driver) re-finalizes from the accumulated batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


CHUNK = 256      # codes per tile; must match ops.pallas.adc_scan.CHUNK
TILE_ROWS = 24   # 16 transposed code rows + 1 norm row + 7 pad (8-aligned DMA)
NORM_ROW = 16
SUBC_ROW = 17    # grouping layout only: per-position subcentroid index
QCHUNK = 4 * CHUNK  # codes per quad tile (adc_scan.RCHUNK)
QROWS = 72       # quad tile rows: 64 interleaved code rows + 4 norm + 4 pad


def _check_f32_exact(sizes, n_tiles: int) -> None:
    """The Pallas schedule builders pack per-list sizes and tile offsets
    into f32 lanes (adc_scan._probe_schedule's 8-lane gather + one-hot
    einsum); exactness requires every packed integer < 2^24. Tile counts
    are bounded by TL_PACK/RTL_PACK already, but per-list sizes are not —
    enforce the precondition here (once, at layout-build time) instead of
    silently rounding a >16.7M-code posting list."""
    max_sz = int(sizes.max()) if sizes.size else 0
    if max_sz >= 1 << 24 or n_tiles >= 1 << 24:
        raise ValueError(
            f"posting-list layout exceeds f32-exact schedule range: "
            f"max list size {max_sz}, tiles {n_tiles} (limit 2^24)")


@dataclass
class TiledStore:
    """Search-optimized mirror of the posting lists for the Pallas kernel:
    every list starts 256-aligned, one tile = [24, 256] u8 (rows 0..15 =
    transposed PQ codes, row 16 = norm codes, 17..23 zero) = one contiguous DMA."""

    tiles: jnp.ndarray         # [NT, 24, 256] uint8
    ids_aligned: jnp.ndarray   # [NT*256] int32 (-1 on padding slots)
    tile_offsets: jnp.ndarray  # [nc+1] int32 — first tile of each list
    list_sizes: jnp.ndarray    # [nc] int32


@dataclass
class PostingListStore:
    """Finalized posting lists.

    Canonical arrays are HOST numpy: serialization, tiling, sharding, and
    incremental re-finalization all consume them host-side, and a remote
    TPU tunnel moves only ~30 MB/s — keeping the canonical copy on device
    (as round 1 did) cost a 2 GB-scale download + re-upload round-trip at
    every (re)tile. Device consumers use the lazily-uploaded, cached
    ``*_d`` mirrors; the Pallas engine uploads only its tile layout."""

    codes: np.ndarray        # [N, M] uint8
    ids: np.ndarray          # [N] int32
    norm_codes: np.ndarray   # [N] uint8
    list_offsets: np.ndarray  # [nc+1] int32
    nc: int
    _tiled: "TiledStore | None" = None
    _quad: "TiledStore | None" = None

    def __post_init__(self):
        self.codes = np.asarray(self.codes, np.uint8)
        self.ids = np.asarray(self.ids, np.int32)
        self.norm_codes = np.asarray(self.norm_codes, np.uint8)
        self.list_offsets = np.asarray(self.list_offsets, np.int32)
        self._dev: dict = {}

    def _mirror(self, name: str) -> jnp.ndarray:
        if name not in self._dev:
            self._dev[name] = jnp.asarray(getattr(self, name))
        return self._dev[name]

    def release_device(self) -> None:
        """Drop every device-resident mirror and cached tile layout (HBM
        release when a process serves/builds several indexes — the bench's
        multi-stage flow OOMed building scale3 with all prior stages'
        tiles still resident). Canonical host arrays are untouched; the
        next device consumer re-uploads lazily."""
        self._dev = {}
        self._tiled = None
        self._quad = None

    @property
    def codes_d(self) -> jnp.ndarray:
        return self._mirror("codes")

    @property
    def ids_d(self) -> jnp.ndarray:
        return self._mirror("ids")

    @property
    def norm_codes_d(self) -> jnp.ndarray:
        return self._mirror("norm_codes")

    @property
    def list_offsets_d(self) -> jnp.ndarray:
        return self._mirror("list_offsets")

    @property
    def ntotal(self) -> int:
        return int(self.codes.shape[0])

    @property
    def code_m(self) -> int:
        return int(self.codes.shape[1])

    def list_sizes(self) -> np.ndarray:
        off = np.asarray(self.list_offsets)
        return off[1:] - off[:-1]

    def max_list_size(self) -> int:
        s = self.list_sizes()
        return int(s.max()) if s.size else 0

    def tiled(self, max_m: int = 16) -> TiledStore:
        """Build (and cache) the aligned tile layout. Alignment overhead is
        < CHUNK codes per non-empty list."""
        if self._tiled is not None:
            return self._tiled
        off = np.asarray(self.list_offsets).astype(np.int64)
        sizes = off[1:] - off[:-1]
        tcnt = (sizes + CHUNK - 1) // CHUNK
        tile_off = np.zeros(self.nc + 1, np.int64)
        np.cumsum(tcnt, out=tile_off[1:])
        nt = max(int(tile_off[-1]), 1)
        n_al = nt * CHUNK
        _check_f32_exact(sizes, nt)

        codes = np.asarray(self.codes)
        ncodes = np.asarray(self.norm_codes)
        ids = np.asarray(self.ids)
        m = codes.shape[1]
        if m > max_m:
            raise ValueError(f"code_size {m} > tile budget {max_m}")

        # Scatter each list into its aligned span.
        pos_al = np.arange(self.ntotal, dtype=np.int64)
        list_of = np.repeat(np.arange(self.nc), sizes)
        within = pos_al - off[list_of]
        dest = tile_off[list_of] * CHUNK + within

        codes_al = np.zeros((n_al, max_m), np.uint8)
        norm_al = np.zeros(n_al, np.uint8)
        ids_al = np.full(n_al, -1, np.int32)
        codes_al[dest, :m] = codes
        norm_al[dest] = ncodes
        ids_al[dest] = ids

        tiles = np.empty((nt, TILE_ROWS, CHUNK), np.uint8)
        tiles[:, :max_m, :] = codes_al.reshape(
            nt, CHUNK, max_m).transpose(0, 2, 1)
        tiles[:, max_m:, :] = 0
        tiles[:, NORM_ROW, :] = norm_al.reshape(nt, CHUNK)

        self._tiled = TiledStore(
            tiles=jnp.asarray(tiles),
            ids_aligned=jnp.asarray(ids_al),
            tile_offsets=jnp.asarray(tile_off.astype(np.int32)),
            list_sizes=jnp.asarray(sizes.astype(np.int32)),
        )
        return self._tiled

    def quad(self, max_m: int = 16) -> TiledStore:
        """Build (and cache) the QUAD tile layout: four 256-code chunks per
        [72, 256] u8 HBM tile, lists 1024-aligned. Code rows are interleaved
        4m+c (subquantizer m of chunk c), rows 64..67 hold the chunks' norm
        codes, rows 68..71 are zero pad. One DMA moves 1024 codes at
        18 B/code (vs 24 for the per-chunk layout) and the kernel's
        per-chunk reduce becomes a sublane-strided group sum — see
        ops.pallas.adc_scan._adc_kernel_quad. Alignment overhead is
        < QCHUNK codes per non-empty list."""
        if self._quad is not None:
            return self._quad
        off = np.asarray(self.list_offsets).astype(np.int64)
        sizes = off[1:] - off[:-1]
        qcnt = (sizes + QCHUNK - 1) // QCHUNK
        qoff = np.zeros(self.nc + 1, np.int64)
        np.cumsum(qcnt, out=qoff[1:])
        nqt = max(int(qoff[-1]), 1)
        n_al = nqt * QCHUNK
        _check_f32_exact(sizes, nqt)

        codes = np.asarray(self.codes)
        ncodes = np.asarray(self.norm_codes)
        ids = np.asarray(self.ids)
        m = codes.shape[1]
        if m > max_m:
            raise ValueError(f"code_size {m} > tile budget {max_m}")

        pos = np.arange(self.ntotal, dtype=np.int64)
        list_of = np.repeat(np.arange(self.nc), sizes)
        within = pos - off[list_of]
        dest = qoff[list_of] * QCHUNK + within

        codes_al = np.zeros((n_al, max_m), np.uint8)
        norm_al = np.zeros(n_al, np.uint8)
        ids_al = np.full(n_al, -1, np.int32)
        codes_al[dest, :m] = codes
        norm_al[dest] = ncodes
        ids_al[dest] = ids

        # [NQT, 4 chunks, 256 lanes, 16 m] -> code row 4m+c.
        c4 = codes_al.reshape(nqt, 4, CHUNK, max_m)
        qt = np.zeros((nqt, QROWS, CHUNK), np.uint8)
        qt[:, :64, :] = c4.transpose(0, 3, 1, 2).reshape(nqt, 64, CHUNK)
        qt[:, 64:68, :] = norm_al.reshape(nqt, 4, CHUNK)

        self._quad = TiledStore(
            tiles=jnp.asarray(qt),
            ids_aligned=jnp.asarray(ids_al),
            tile_offsets=jnp.asarray(qoff.astype(np.int32)),
            list_sizes=jnp.asarray(sizes.astype(np.int32)),
        )
        return self._quad

    def tiled_grouped(self, nsubc: int, max_m: int = 16) -> TiledStore:
        """Group-aligned tile layout for the grouping index: this store's nc
        must be n_groups * nsubc (flattened subgroup lists). Groups (not
        subgroups — they average only tens of codes) are 256-aligned;
        subgroups stay contiguous inside their group, and tile row 17 holds
        each position's subcentroid index so the kernel can apply per-subc
        term2/pruning via a lane gather."""
        if self._tiled is not None:
            return self._tiled
        if self.nc % nsubc != 0:
            raise ValueError("store nc not divisible by nsubc")
        ngroups = self.nc // nsubc
        off = np.asarray(self.list_offsets).astype(np.int64)
        sub_sizes = (off[1:] - off[:-1]).reshape(ngroups, nsubc)
        gsizes = sub_sizes.sum(axis=1)
        tcnt = (gsizes + CHUNK - 1) // CHUNK
        tile_off = np.zeros(ngroups + 1, np.int64)
        np.cumsum(tcnt, out=tile_off[1:])
        nt = max(int(tile_off[-1]), 1)
        n_al = nt * CHUNK
        _check_f32_exact(gsizes, nt)

        codes = np.asarray(self.codes)
        ncodes = np.asarray(self.norm_codes)
        ids = np.asarray(self.ids)
        m = codes.shape[1]
        if m > max_m:
            raise ValueError(f"code_size {m} > tile budget {max_m}")

        group_lo = off[:-1].reshape(ngroups, nsubc)[:, 0]
        list_of = np.repeat(np.arange(self.nc), off[1:] - off[:-1])
        group_of = list_of // nsubc
        subc_of = (list_of % nsubc).astype(np.uint8)
        within_group = np.arange(self.ntotal) - group_lo[group_of]
        dest = tile_off[group_of] * CHUNK + within_group

        codes_al = np.zeros((n_al, max_m), np.uint8)
        norm_al = np.zeros(n_al, np.uint8)
        subc_al = np.zeros(n_al, np.uint8)
        ids_al = np.full(n_al, -1, np.int32)
        codes_al[dest, :m] = codes
        norm_al[dest] = ncodes
        subc_al[dest] = subc_of
        ids_al[dest] = ids

        tiles = np.empty((nt, TILE_ROWS, CHUNK), np.uint8)
        tiles[:, :max_m, :] = codes_al.reshape(nt, CHUNK, max_m).transpose(0, 2, 1)
        tiles[:, max_m:, :] = 0
        tiles[:, NORM_ROW, :] = norm_al.reshape(nt, CHUNK)
        tiles[:, SUBC_ROW, :] = subc_al.reshape(nt, CHUNK)

        self._tiled = TiledStore(
            tiles=jnp.asarray(tiles),
            ids_aligned=jnp.asarray(ids_al),
            tile_offsets=jnp.asarray(tile_off.astype(np.int32)),
            list_sizes=jnp.asarray(gsizes.astype(np.int32)),
        )
        return self._tiled

    def quad_grouped(self, nsubc: int, max_m: int = 16) -> TiledStore:
        """QUAD variant of :meth:`tiled_grouped`: groups 1024-aligned, four
        256-code chunks per [72, 256] u8 tile. Code rows interleave 4m+c
        like :meth:`quad`; rows 64..67 hold the chunks' norm codes and the
        four PAD rows 68..71 carry each chunk's per-position subcentroid
        index — the quad grouping kernel gathers the probe's term2 row by
        those ids, so one DMA moves 1024 group codes at 18 B/code and the
        per-chunk term2 table write of the chunk-layout kernel becomes one
        broadcast gather per QUAD tile (ops.pallas.grouping_scan).
        Alignment overhead is < QCHUNK codes per non-empty group."""
        if self._quad is not None:
            return self._quad
        if self.nc % nsubc != 0:
            raise ValueError("store nc not divisible by nsubc")
        ngroups = self.nc // nsubc
        off = np.asarray(self.list_offsets).astype(np.int64)
        gsizes = (off[1:] - off[:-1]).reshape(ngroups, nsubc).sum(axis=1)
        qcnt = (gsizes + QCHUNK - 1) // QCHUNK
        qoff = np.zeros(ngroups + 1, np.int64)
        np.cumsum(qcnt, out=qoff[1:])
        nqt = max(int(qoff[-1]), 1)
        n_al = nqt * QCHUNK
        _check_f32_exact(gsizes, nqt)

        codes = np.asarray(self.codes)
        ncodes = np.asarray(self.norm_codes)
        ids = np.asarray(self.ids)
        m = codes.shape[1]
        if m > max_m:
            raise ValueError(f"code_size {m} > tile budget {max_m}")

        group_lo = off[:-1].reshape(ngroups, nsubc)[:, 0]
        list_of = np.repeat(np.arange(self.nc), off[1:] - off[:-1])
        group_of = list_of // nsubc
        subc_of = (list_of % nsubc).astype(np.uint8)
        within_group = np.arange(self.ntotal) - group_lo[group_of]
        dest = qoff[group_of] * QCHUNK + within_group

        codes_al = np.zeros((n_al, max_m), np.uint8)
        norm_al = np.zeros(n_al, np.uint8)
        subc_al = np.zeros(n_al, np.uint8)
        ids_al = np.full(n_al, -1, np.int32)
        codes_al[dest, :m] = codes
        norm_al[dest] = ncodes
        subc_al[dest] = subc_of
        ids_al[dest] = ids

        c4 = codes_al.reshape(nqt, 4, CHUNK, max_m)
        qt = np.zeros((nqt, QROWS, CHUNK), np.uint8)
        qt[:, :64, :] = c4.transpose(0, 3, 1, 2).reshape(nqt, 64, CHUNK)
        qt[:, 64:68, :] = norm_al.reshape(nqt, 4, CHUNK)
        qt[:, 68:72, :] = subc_al.reshape(nqt, 4, CHUNK)

        self._quad = TiledStore(
            tiles=jnp.asarray(qt),
            ids_aligned=jnp.asarray(ids_al),
            tile_offsets=jnp.asarray(qoff.astype(np.int32)),
            list_sizes=jnp.asarray(gsizes.astype(np.int32)),
        )
        return self._quad


class PostingListBuilder:
    """Accumulates (centroid key, id, code, norm code) batches; finalize()
    produces a sorted PostingListStore."""

    def __init__(self, nc: int, code_m: int):
        self.nc = nc
        self.code_m = code_m
        self._keys: list[np.ndarray] = []
        self._ids: list[np.ndarray] = []
        self._codes: list[np.ndarray] = []
        self._norm_codes: list[np.ndarray] = []

    def add(self, keys, ids, codes, norm_codes) -> None:
        keys = np.asarray(keys, np.int32)
        n = keys.shape[0]
        codes = np.asarray(codes, np.uint8).reshape(n, self.code_m)
        if keys.min(initial=0) < 0 or (n and keys.max() >= self.nc):
            raise ValueError("centroid key out of range")
        self._keys.append(keys)
        self._ids.append(np.asarray(ids, np.int32))
        self._codes.append(codes)
        self._norm_codes.append(np.asarray(norm_codes, np.uint8).reshape(n))

    @property
    def ntotal(self) -> int:
        return sum(k.shape[0] for k in self._keys)

    def finalize(self) -> PostingListStore:
        if self._keys:
            keys = np.concatenate(self._keys)
            ids = np.concatenate(self._ids)
            codes = np.concatenate(self._codes)
            ncodes = np.concatenate(self._norm_codes)
        else:
            keys = np.zeros((0,), np.int32)
            ids = np.zeros((0,), np.int32)
            codes = np.zeros((0, self.code_m), np.uint8)
            ncodes = np.zeros((0,), np.uint8)
        order = np.argsort(keys, kind="stable")
        sizes = np.bincount(keys, minlength=self.nc)
        offsets = np.zeros(self.nc + 1, np.int32)
        np.cumsum(sizes, out=offsets[1:])
        return PostingListStore(
            codes=codes[order],
            ids=ids[order],
            norm_codes=ncodes[order],
            list_offsets=offsets,
            nc=self.nc,
        )


def store_from_lists(nc: int, code_m: int, per_list) -> PostingListStore:
    """Build a store from per-centroid (ids, codes, norm_codes) sequences
    (deserialization path)."""
    b = PostingListBuilder(nc, code_m)
    for c, (ids, codes, ncodes) in enumerate(per_list):
        n = len(ids)
        if n:
            b.add(np.full(n, c, np.int32), ids, codes, ncodes)
    return b.finalize()
