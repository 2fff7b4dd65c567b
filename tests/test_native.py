"""Native C++ scatter/gather vs numpy fallback equivalence."""

import numpy as np
import pytest

from transfer_em_tpu import native


def test_native_builds():
    assert native.native_available(), "C++ scatter lib failed to build"


def test_scatter_matches_numpy(rng):
    out_c = np.zeros((50, 60, 70), np.uint8)
    out_np = np.zeros_like(out_c)
    tiles = rng.integers(0, 255, size=(4, 16, 16, 16), dtype=np.uint8)
    idx = [(0, 0, 0), (54, 44, 34), (60, 0, 40), (16, 16, 16)]  # incl. clipped
    native.scatter_blocks(out_c, tiles, idx, 16)
    # numpy fallback path
    Z, Y, X = out_np.shape
    for i, (ox, oy, oz) in enumerate(idx):
        zl, yl, xl = min(16, Z - oz), min(16, Y - oy), min(16, X - ox)
        if zl <= 0 or yl <= 0 or xl <= 0:
            continue
        out_np[oz:oz + zl, oy:oy + yl, ox:ox + xl] = tiles[i][:zl, :yl, :xl]
    np.testing.assert_array_equal(out_c, out_np)


def test_gather_matches_numpy(rng):
    vol = rng.integers(0, 255, size=(40, 50, 60), dtype=np.uint8)
    corners = [(-5, -5, -5), (0, 0, 0), (50, 40, 30), (10, 20, 5)]
    got = native.gather_blocks(vol, corners, 16)
    want = np.zeros_like(got)
    Z, Y, X = vol.shape
    t = 16
    for i, (cx, cy, cz) in enumerate(corners):
        z0, z1 = max(0, -cz), min(t, Z - cz)
        y0, y1 = max(0, -cy), min(t, Y - cy)
        x0, x1 = max(0, -cx), min(t, X - cx)
        if z0 >= z1 or y0 >= y1 or x0 >= x1:
            continue
        want[i][z0:z1, y0:y1, x0:x1] = vol[cz + z0:cz + z1, cy + y0:cy + y1,
                                           cx + x0:cx + x1]
    np.testing.assert_array_equal(got, want)


def test_gather_scatter_roundtrip(rng):
    vol = rng.integers(0, 255, size=(32, 32, 32), dtype=np.uint8)
    corners = [(x, y, z) for x in (0, 16) for y in (0, 16) for z in (0, 16)]
    tiles = native.gather_blocks(vol, corners, 16)
    out = np.zeros_like(vol)
    native.scatter_blocks(out, tiles, corners, 16)
    np.testing.assert_array_equal(out, vol)


def test_scatter_clips_negative_offsets(rng):
    """The public contract says '(clipped)': a NEGATIVE xyz offset must
    drop the tile's leading planes, in BOTH the C++ path and the numpy
    fallback (round-5 review: the C++ path clipped only the high faces —
    an out-of-bounds memcpy — and the fallback wrapped via Python negative
    slicing, writing to the far end of the axis)."""
    from transfer_em_tpu import native

    t = 4
    tile = rng.integers(1, 255, size=(1, t, t, t), dtype=np.uint8)
    want = np.zeros((8, 8, 8), np.uint8)
    # offset xyz = (-2, -1, -3): leading 2 x-cols, 1 y-row, 3 z-planes drop
    want[0:1, 0:3, 0:2] = tile[0][3:4, 1:4, 2:4]

    for use_native in ([True] if native.native_available() else []) + [False]:
        out = np.zeros((8, 8, 8), np.uint8)
        if use_native:
            native.scatter_blocks(out, tile, [(-2, -1, -3)], t)
        else:
            lib, native._lib = native._lib, None
            failed, native._build_failed = native._build_failed, True
            try:
                native.scatter_blocks(out, tile, [(-2, -1, -3)], t)
            finally:
                native._lib, native._build_failed = lib, failed
        np.testing.assert_array_equal(out, want, err_msg=f"native={use_native}")
        # fully out of bounds: no write, no crash
        out2 = np.zeros((8, 8, 8), np.uint8)
        native.scatter_blocks(out2, tile, [(-10, 0, 0)], t)
        assert not out2.any()
