"""Native (C++) host runtime: tile scatter/gather via ctypes.

Builds ``scatter.cpp`` into a shared library on first use (cached beside the
source); falls back to numpy loops when no compiler is available.  See
scatter.cpp for why this exists (reference utils.py:121-125 stitches in a
python loop; we keep the host out of the TPU's way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scatter.cpp")
_LIB_PATH = os.path.join(_HERE, "libtemnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC, "-lpthread"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except Exception:
        _build_failed = True
        return None
    return _load_lib()


def _load_lib() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(i64)
        lib.tem_scatter_blocks.argtypes = [u8p, i64, i64, i64, u8p, i64,
                                           i64, i64p, i64]
        lib.tem_scatter_blocks.restype = None
        lib.tem_gather_blocks.argtypes = [u8p, i64, i64, i64, u8p, i64,
                                          i64, i64p, i64]
        lib.tem_gather_blocks.restype = None
        return lib
    except (OSError, AttributeError) as e:
        # A present-but-unloadable .so (wrong arch/glibc, truncated copy,
        # missing symbol) must engage the numpy fallback like a failed
        # build — not crash every serving read, repeatedly (round-5
        # review).  Cache the failure so the error logs once.
        import warnings
        _build_failed = True
        warnings.warn(f"libtemnative.so present but unloadable "
                      f"({type(e).__name__}: {e}); using the numpy "
                      "fallback", RuntimeWarning, stacklevel=2)
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            if (os.path.exists(_LIB_PATH)
                    and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
                _lib = _load_lib()
            else:
                _lib = _build()
    return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def scatter_blocks(out_zyx: np.ndarray, tiles: np.ndarray,
                   indices: Sequence[Tuple[int, int, int]], tile_size: int,
                   num_threads: int = 4) -> None:
    """Scatter cubic uint8 tiles into a zyx buffer at xyz offsets (clipped).

    Equivalent to the reference's slice assignment (utils.py:121-125) but
    parallel memcpy in C++; numpy fallback preserves exact semantics.
    """
    assert out_zyx.dtype == np.uint8 and out_zyx.flags.c_contiguous
    tiles = np.ascontiguousarray(tiles, np.uint8)
    n = len(indices)
    assert tiles.shape[0] == n
    t = tile_size
    lib = _get_lib()
    if lib is not None and tiles.ndim == 4 and tiles.shape[1:] == (t, t, t):
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        lib.tem_scatter_blocks(
            _u8p(out_zyx), *map(ctypes.c_int64, out_zyx.shape),
            _u8p(tiles), ctypes.c_int64(n), ctypes.c_int64(t),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(num_threads))
        return
    Z, Y, X = out_zyx.shape
    for i, (ox, oy, oz) in enumerate(indices):
        # Clip BOTH faces: a negative offset drops the tile's leading
        # planes; naive low slicing would wrap via Python negative
        # indexing and write to the far end of the axis (round-5 review).
        z0, z1 = max(0, -oz), min(t, Z - oz)
        y0, y1 = max(0, -oy), min(t, Y - oy)
        x0, x1 = max(0, -ox), min(t, X - ox)
        if z0 >= z1 or y0 >= y1 or x0 >= x1:
            continue
        out_zyx[oz + z0:oz + z1, oy + y0:oy + y1,
                ox + x0:ox + x1] = tiles[i][z0:z1, y0:y1, x0:x1]


def gather_blocks(vol_zyx: np.ndarray,
                  corners: Sequence[Tuple[int, int, int]], tile_size: int,
                  num_threads: int = 4) -> np.ndarray:
    """Extract cubic uint8 tiles at xyz corners (zero-filled out of bounds).

    The in-memory tile source for tiled inference over a local volume.
    """
    vol_zyx = np.ascontiguousarray(vol_zyx, np.uint8)
    n = len(corners)
    t = tile_size
    tiles = np.zeros((n, t, t, t), np.uint8)
    lib = _get_lib()
    if lib is not None:
        cor = np.ascontiguousarray(np.asarray(corners, np.int64))
        lib.tem_gather_blocks(
            _u8p(vol_zyx), *map(ctypes.c_int64, vol_zyx.shape),
            _u8p(tiles), ctypes.c_int64(n), ctypes.c_int64(t),
            cor.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(num_threads))
        return tiles
    Z, Y, X = vol_zyx.shape
    for i, (cx, cy, cz) in enumerate(corners):
        z0, z1 = max(0, -cz), min(t, Z - cz)
        y0, y1 = max(0, -cy), min(t, Y - cy)
        x0, x1 = max(0, -cx), min(t, X - cx)
        if z0 >= z1 or y0 >= y1 or x0 >= x1:
            continue
        tiles[i][z0:z1, y0:y1, x0:x1] = vol_zyx[cz + z0:cz + z1,
                                                cy + y0:cy + y1,
                                                cx + x0:cx + x1]
    return tiles


def gather_box(vol_zyx: np.ndarray, corner_xyz: Sequence[int],
               size_xyz: Sequence[int]) -> np.ndarray:
    """Copy an xyz box out of a host zyx volume, zero-filled out of bounds
    (the box analogue of gather_blocks' semantics).  Lives here — the only
    jax-free host module — so both infer.stream and the prefork (jax-free)
    serve.backends workers share ONE clamp-and-copy implementation."""
    Z, Y, X = vol_zyx.shape
    cx, cy, cz = (int(v) for v in corner_xyz)
    sx, sy, sz = (int(v) for v in size_xyz)
    out = np.zeros((sz, sy, sx), np.uint8)
    z0, z1 = max(0, -cz), min(sz, Z - cz)
    y0, y1 = max(0, -cy), min(sy, Y - cy)
    x0, x1 = max(0, -cx), min(sx, X - cx)
    if z0 < z1 and y0 < y1 and x0 < x1:
        out[z0:z1, y0:y1, x0:x1] = vol_zyx[cz + z0:cz + z1,
                                           cy + y0:cy + y1,
                                           cx + x0:cx + x1]
    return out


def native_available() -> bool:
    return _get_lib() is not None
