"""ctypes bindings for the native host-side data plane (native/).

Builds lazily with g++ on first use and caches the .so; every entry point
has a numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libivfhnsw_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.xvec_read_f32.restype = ctypes.c_int64
            lib.xvec_read_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float)]
            lib.lenvec_concat.restype = ctypes.c_int64
            lib.lenvec_concat.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.lenvec_total.restype = ctypes.c_int64
            lib.lenvec_total.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.lenvec_interleave.restype = ctypes.c_int64
            lib.lenvec_interleave.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


_KIND = {np.dtype(np.uint8): 0, np.dtype(np.float32): 1,
         np.dtype(np.int32): 2}


def xvec_read_f32(path: str, d: int, n: int, offset: int = 0,
                  dtype=np.uint8) -> np.ndarray | None:
    """Native streaming xvec decode to f32; None if native lib unavailable
    or the file fails validation (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, d), np.float32)
    got = lib.xvec_read_f32(
        path.encode(), d, offset, n, _KIND[np.dtype(dtype)],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got != n:
        return None
    return out


def lenvec_interleave(payload: np.ndarray, counts: np.ndarray,
                      esize: int,
                      out: np.ndarray | None = None) -> np.ndarray | None:
    """Serialize a length-prefixed vector series in one native pass:
    flat payload bytes + per-record element counts -> the on-disk
    [u32 count | count*esize]* byte stream. None if native lib unavailable
    (caller falls back to a per-record Python loop).

    Pass ``out`` (a u8 scratch of >= 4*len(counts) + payload bytes) to
    reuse a buffer across calls — on this VM class, first-touch page
    faults on fresh multi-GB allocations cost ~10 s/GB, so streaming
    through one persistent slab is the difference between O(file) and
    O(slab) fault cost. Returns a view of out sized to the bytes written."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload).view(np.uint8).reshape(-1)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    need = 4 * counts.size + payload.size
    if out is None:
        out = np.empty(need, np.uint8)
    elif out.size < need:
        raise ValueError(f"interleave scratch too small: {out.size} < {need}")
    rc = lib.lenvec_interleave(
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), payload.size,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), counts.size,
        esize, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != need:
        raise ValueError("lenvec_interleave: counts/payload mismatch")
    return out[:need]


def lenvec_series(buf: np.ndarray, pos: int, n: int, dtype) -> tuple | None:
    """Parse n length-prefixed vectors from a uint8 buffer starting at pos.
    Returns (flat_data [total] of dtype, counts [n] int64, end_pos) or None
    if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dt = np.dtype(dtype)
    end = ctypes.c_int64(0)
    bufp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    total = lib.lenvec_total(bufp, buf.size, pos, n, dt.itemsize,
                             ctypes.byref(end))
    if total < 0:
        raise ValueError("corrupt length-prefixed series")
    data = np.empty(total * dt.itemsize, np.uint8)
    counts = np.empty(n, np.int64)
    rc = lib.lenvec_concat(
        bufp, buf.size, pos, n, dt.itemsize,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        data.size, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc < 0:
        raise ValueError("corrupt length-prefixed series")
    return data.view(dt), counts, int(rc)
