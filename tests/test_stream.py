"""Chunk-streaming inference (>HBM volumes) == resident device path.

The streaming pipeline (infer/stream.py) replaces the reference's serial
arbitrary-size loop (transfer_em/utils.py:87-126); these tests force a
multi-chunk grid with a tiny HBM budget and assert bit-identity with the
whole-volume device program plus correct geometry bookkeeping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transfer_em_tpu.infer import predict_volume
from transfer_em_tpu.infer.stream import (gather_box, plan_chunks,
                                          predict_volume_streaming)
from transfer_em_tpu.models import UNetGenerator

# Effective geometry for (outdimsize=40, buffer=17): od=36, b=19, tile 74.
OD, B_EFF, TILE = 36, 19, 74


@pytest.fixture(scope="module")
def setup():
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    rng = np.random.default_rng(7)
    vol = rng.integers(0, 255, size=(150, 150, 150), dtype=np.uint8)
    return gen, params, vol


def test_plan_chunks_geometry():
    # Budget of exactly two tiles along x: (2*od+2b, od+2b, od+2b).
    budget = (2 * OD + 2 * B_EFF) * (OD + 2 * B_EFF) ** 2
    plan = plan_chunks((0, 0, 0), (100, 40, 80), 40, 17, budget)
    assert plan.outdimsize == OD and plan.buffer == B_EFF
    assert all(c % OD == 0 for c in plan.chunk)
    assert plan.block == tuple(c + 2 * B_EFF for c in plan.chunk)
    assert int(np.prod(plan.block)) <= budget
    # padded request (108, 72, 108) / chunk (72, 36, 36) -> grid (2, 2, 3)
    assert plan.chunk == (72, 36, 36)
    assert plan.grid == (2, 2, 3)
    # chunk_xyz enumerates x innermost
    assert plan.chunk_xyz(0) == (0, 0, 0)
    assert plan.chunk_xyz(1) == (1, 0, 0)
    assert plan.chunk_xyz(2) == (0, 1, 0)
    assert plan.chunk_xyz(plan.num_chunks - 1) == (1, 1, 2)


def test_plan_chunks_budget_too_small():
    with pytest.raises(ValueError, match="cannot hold even one"):
        plan_chunks((0, 0, 0), (36, 36, 36), 40, 17, TILE ** 3 - 1)


def test_gather_box_oob_zero_fill():
    vol = np.arange(4 * 5 * 6, dtype=np.uint8).reshape(4, 5, 6)
    box = gather_box(vol, (-2, 3, 2), (6, 4, 4))  # xyz corner/size
    assert box.shape == (4, 4, 6)  # zyx
    assert box[:, :, :2].sum() == 0           # x < 0 overhang
    assert box[2:].sum() == 0                 # z >= 4 overhang
    np.testing.assert_array_equal(box[0, 0, 2:], vol[2, 3, 0:4])


def test_streaming_matches_device_path(setup):
    gen, params, vol = setup
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)
    start, size = (30, 40, 20), (76, 40, 72)  # unaligned; multi-chunk

    want = predict_volume(vol, gen.apply, params, start, size, ms_x, ms_y,
                          mode="device", batch_size=4)
    # One-tile budget -> every chunk is a single 74^3 block; 3x2x2 grid.
    got = predict_volume_streaming(vol, gen.apply, params, start, size,
                                   ms_x, ms_y, max_block_bytes=TILE ** 3,
                                   batch_size=4)
    assert got.shape == want.shape == (72, 40, 76)
    np.testing.assert_array_equal(got, want)


def test_streaming_oob_request_matches_device(setup):
    """Request hanging past the source on every face: halo + overhang zeros."""
    gen, params, vol = setup
    ms_x, ms_y = (0.0, 1.0), (0.0, 1.0)
    start, size = (120, -10, 100), (48, 40, 60)

    want = predict_volume(vol, gen.apply, params, start, size, ms_x, ms_y,
                          mode="device", batch_size=4)
    got = predict_volume_streaming(vol, gen.apply, params, start, size,
                                   ms_x, ms_y, max_block_bytes=TILE ** 3,
                                   batch_size=4)
    np.testing.assert_array_equal(got, want)


def test_streaming_via_predict_volume_mode_and_out(setup, tmp_path):
    """mode='stream' entry point + preallocated memmap output."""
    gen, params, vol = setup
    ms = (0.0, 1.0)
    start, size = (40, 40, 40), (72, 36, 36)

    want = predict_volume(vol, gen.apply, params, start, size, ms, ms,
                          mode="device", batch_size=4)
    out = np.memmap(tmp_path / "out.u8", np.uint8, "w+",
                    shape=(36, 36, 72))
    got = predict_volume(vol, gen.apply, params, start, size, ms, ms,
                         mode="stream", max_block_bytes=TILE ** 3,
                         batch_size=4, out=out)
    assert got is out
    np.testing.assert_array_equal(np.asarray(out), want)


def test_streaming_dp_mesh_matches_single_device(setup):
    """Chunk tile batches fan out over a mesh 'data' axis; same bytes."""
    from transfer_em_tpu.parallel import make_mesh
    gen, params, vol = setup
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)
    start, size = (30, 40, 20), (76, 40, 72)
    mesh = make_mesh(4, data=4, space=1)

    want = predict_volume_streaming(vol, gen.apply, params, start, size,
                                    ms_x, ms_y, max_block_bytes=TILE ** 3,
                                    batch_size=2)
    got = predict_volume_streaming(vol, gen.apply, params, start, size,
                                   ms_x, ms_y, max_block_bytes=TILE ** 3,
                                   batch_size=2, mesh=mesh)
    np.testing.assert_array_equal(got, want)


def test_stream_out_must_be_uint8_contiguous():
    """predict_streaming's out= enforces the same contract as
    predict_tiled's (a float memmap would silently take uint8 casts at 4x
    the bytes)."""
    from transfer_em_tpu.infer.stream import predict_streaming

    bad = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError, match="C-contiguous uint8"):
        predict_streaming(lambda c, s: np.zeros((s[2], s[1], s[0]),
                                                np.uint8),
                          lambda p, x: x, None, (0, 0, 0), (8, 8, 8),
                          40, 17, (0.0, 1.0), (0.0, 1.0), out=bad)


def test_stream_zero_extent_request_returns_empty():
    """A degenerate zero-size axis must return the empty array, not fetch a
    block or divide by a zero grid axis (round-5 review)."""
    import jax
    import jax.numpy as jnp

    from transfer_em_tpu.infer import predict_volume
    from transfer_em_tpu.models import UNetGenerator

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.zeros((100, 100, 100), np.uint8)
    out = predict_volume(vol, gen.apply, params, (0, 0, 0), (64, 0, 64),
                         (0.0, 1.0), (0.0, 1.0), mode="stream")
    assert out.shape == (64, 0, 64) and out.dtype == np.uint8
