"""Tiled-inference tests: plan arithmetic and seam-free stitching.

The stitching invariant (SURVEY.md §4): predicting a large block via
overlapping tiles must equal predicting the whole block in one shot on the
interior — VALID convs guarantee it mathematically; these tests check the
bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.infer.tiling import (make_tile_step, plan_tiles,
                                          predict_tiled)
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.native import gather_blocks
from transfer_em_tpu.shapes import generator_shapes


def test_plan_tiles_reference_arithmetic():
    # outdimsize 40 -> 36, buffer 17 -> 19, tpad 2 (reference utils.py:70-75)
    plan = plan_tiles((0, 0, 0), (72, 72, 72), 40, 17)
    assert plan.outdimsize == 36 and plan.buffer == 19 and plan.tpad == 2
    assert plan.insize == 36 + 38 == 74
    assert plan.num_tiles == 8  # 72/36 = 2 per axis
    assert plan.corners[0] == (-19, -19, -19)
    assert plan.indices[0] == (0, 0, 0)
    assert plan.padded_size == (72, 72, 72)


def test_plan_tiles_non_multiple_size():
    plan = plan_tiles((10, 20, 30), (50, 40, 30), 40, 17)
    # 36-sized tiles: ceil(50/36)=2, ceil(40/36)=2, ceil(30/36)=1 -> 4 tiles
    assert plan.num_tiles == 4
    assert plan.padded_size == (36, 72, 72)  # zyx of padded xyz (72,72,36)
    assert plan.corners[0] == (10 - 19, 20 - 19, 30 - 19)


@pytest.fixture(scope="module")
def gen_and_params():
    gen = UNetGenerator(wf=32)
    x = jnp.zeros((1, 74, 74, 1))
    params = gen.init(jax.random.PRNGKey(3), x)
    return gen, params


def test_tile_step_uint8_roundtrip(gen_and_params):
    gen, params = gen_and_params
    step = make_tile_step(gen.apply, params,
                          (0.1, 0.9), (0.0, 1.0), tpad=2)
    tiles = np.random.default_rng(0).integers(0, 255, size=(2, 74, 74),
                                              dtype=np.uint8)
    out = np.asarray(step(jnp.asarray(tiles)))
    assert out.shape == (2, 36, 36)
    assert out.dtype == np.uint8


def _predict_2d_tiled_vs_whole(gen, params):
    """2D stitching check via predict_tiled on an in-memory source.

    Use a 3D-looking volume of thickness 1?  2D models take (B, y, x, 1);
    easier: run the 3D machinery in 2D by treating tiles as 2D — instead we
    check 3D stitching in test_stitching_3d (slow) and 2D equivalence here
    directly with gather/scatter math.
    """


def test_stitching_2d_matches_whole(gen_and_params):
    """Predict a 112^2 region tiled (4 tiles of out 36 + trim) vs whole-image
    prediction; interiors must agree exactly."""
    gen, params = gen_and_params
    shapes = generator_shapes(74)
    rng = np.random.default_rng(1)
    # big image with halo margin around the 72^2 region of interest
    big = rng.integers(0, 255, size=(256, 256), dtype=np.uint8)
    meanstd = (0.05, 0.8)

    # whole prediction over the region + halo, via a 74-in window at each
    # 36-out tile; emulate with the tiling planner on a 2D-volume-as-3D? The
    # tiling module is 3D (cubes); do the 2D check manually:
    plan = plan_tiles((64, 64, 0), (72, 72, 1), shapes.out, shapes.buffer)
    assert plan.outdimsize == 36 and plan.insize == 74

    step = make_tile_step(gen.apply, params,
                          meanstd, meanstd, tpad=plan.tpad)

    out_tiled = np.zeros((72, 72), np.uint8)
    for (cx, cy, cz), (ix, iy, iz) in zip(plan.corners, plan.indices):
        if cz != -plan.buffer:  # only one z layer in 2D
            continue
        tile = big[cy:cy + 74, cx:cx + 74]  # (y, x) window
        pred = np.asarray(step(jnp.asarray(tile[None])))[0]
        out_tiled[iy:iy + 36, ix:ix + 36] = pred

    # whole-shot: input window covering the full region + halo
    whole_in = big[64 - plan.buffer:64 + 72 + plan.buffer,
                   64 - plan.buffer:64 + 72 + plan.buffer]
    from transfer_em_tpu.ops.normalize import postprocess_to_u8, preprocess_u8
    x = preprocess_u8(jnp.asarray(whole_in[None]), meanstd)
    y = gen.apply(params, x)
    whole = np.asarray(postprocess_to_u8(y, meanstd))[0, :, :, 0]
    # whole covers (72+2*tpad)^2 = 76^2 output; trim tpad
    t = plan.tpad
    whole = whole[t:-t, t:-t]
    assert whole.shape == (72, 72)
    np.testing.assert_array_equal(out_tiled, whole)


def test_predict_tiled_in_memory_3d():
    """End-to-end predict_tiled over an in-memory zyx volume (gather_blocks
    source), checking shape/dtype and determinism."""
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    rng = np.random.default_rng(2)
    vol = rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    out = predict_tiled(fetch_tile, gen.apply, params,
                        start=(40, 40, 40), size=(36, 36, 36),
                        outdimsize=40, buffer=17,
                        meanstd_x=(0.0, 1.0), meanstd_y=(0.0, 1.0),
                        batch_size=4)
    assert out.shape == (36, 36, 36)
    assert out.dtype == np.uint8
    out2 = predict_tiled(fetch_tile, gen.apply, params,
                         start=(40, 40, 40), size=(36, 36, 36),
                         outdimsize=40, buffer=17,
                         meanstd_x=(0.0, 1.0), meanstd_y=(0.0, 1.0),
                         batch_size=2)
    np.testing.assert_array_equal(out, out2)


def test_predict_tiled_mesh_matches_single_device():
    """predict_tiled(mesh=): tile batches shard over the mesh 'data' axis;
    output bytes identical to the unsharded host-streaming path (VERDICT r1
    item 4 — multi-chip serving for non-HBM-resident sources)."""
    from transfer_em_tpu.parallel import make_mesh

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.random.default_rng(3).integers(0, 255, size=(150, 150, 150),
                                            dtype=np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    args = (fetch_tile, gen.apply, params, (30, 40, 20), (76, 40, 72),
            40, 17, (0.1, 0.9), (0.05, 1.1))
    want = predict_tiled(*args, batch_size=3)
    got = predict_tiled(*args, batch_size=3, mesh=make_mesh(8))
    np.testing.assert_array_equal(got, want)

    from jax.sharding import Mesh
    space_only = Mesh(np.array(jax.devices()[:8]), ("space",))
    with pytest.raises(ValueError, match="'data' axis"):
        predict_tiled(*args, mesh=space_only)


def test_predict_tiled_fetch_input():
    """fetch_input=True returns (input, output) like the reference
    (utils.py:126-130)."""
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    rng = np.random.default_rng(5)
    vol = rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    inp, out = predict_tiled(fetch_tile, gen.apply, params,
                             start=(40, 40, 40), size=(36, 36, 36),
                             outdimsize=40, buffer=17,
                             meanstd_x=(0.0, 1.0), meanstd_y=(0.0, 1.0),
                             batch_size=4, fetch_input=True)
    assert inp.shape == out.shape == (36, 36, 36)
    # returned input equals the source region (zyx slice of the volume)
    np.testing.assert_array_equal(inp, vol[40:76, 40:76, 40:76])


def test_predict_tiled_out_memmap(tmp_path):
    """predict_tiled(out=np.memmap) writes straight into the preallocated
    buffer (edge tiles clipped, no padded intermediate) and matches the
    in-RAM result byte-for-byte — the host-tiles analogue of
    infer.stream's out= (VERDICT r2 item 9)."""
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.random.default_rng(9).integers(0, 255, size=(150, 150, 150),
                                            dtype=np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    # size NOT a multiple of the effective outdimsize (36) -> exercises
    # the clipped edge-tile writes into the exact-size buffer
    args = (fetch_tile, gen.apply, params, (30, 40, 20), (50, 40, 30),
            40, 17, (0.1, 0.9), (0.05, 1.1))
    want = predict_tiled(*args, batch_size=3)

    mm = np.memmap(tmp_path / "out.u8", dtype=np.uint8, mode="w+",
                   shape=(30, 40, 50))  # zyx of xyz (50, 40, 30)
    got = predict_tiled(*args, batch_size=3, out=mm)
    assert got is mm
    mm.flush()
    np.testing.assert_array_equal(np.asarray(mm), want)

    # re-read from disk: bytes really landed in the file
    back = np.memmap(tmp_path / "out.u8", dtype=np.uint8, mode="r",
                     shape=(30, 40, 50))
    np.testing.assert_array_equal(np.asarray(back), want)

    with pytest.raises(ValueError, match="out shape"):
        predict_tiled(*args, out=np.zeros((1, 2, 3), np.uint8))
    with pytest.raises(ValueError, match="uint8"):
        predict_tiled(*args, out=np.zeros((30, 40, 50), np.float32))


def test_predict_tiled_should_cancel():
    """should_cancel=True stops both compute loops promptly with
    InferenceCancelled (the serving layer's client-disconnect hook)."""
    from transfer_em_tpu.infer.batcher import make_tile_batcher
    from transfer_em_tpu.infer.tiling import InferenceCancelled

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.zeros((150, 150, 150), np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    args = (fetch_tile, gen.apply, params, (30, 40, 20), (76, 40, 72),
            40, 17, (0.1, 0.9), (0.05, 1.1))

    polls = []

    def cancel_after_one():
        polls.append(1)
        return len(polls) > 1

    with pytest.raises(InferenceCancelled):
        predict_tiled(*args, batch_size=3, should_cancel=cancel_after_one)
    assert len(polls) == 2  # polled per tile, stopped on the second

    batcher = make_tile_batcher(gen.apply, params, (0.1, 0.9), (0.05, 1.1),
                                outdimsize=40, buffer=17, max_batch=4)
    try:
        with pytest.raises(InferenceCancelled):
            predict_tiled(*args, batcher=batcher,
                          should_cancel=lambda: True)
        # The batcher survives a cancelled request: later work still runs.
        want = predict_tiled(*args, batch_size=3)
        got = predict_tiled(*args, batcher=batcher)
        np.testing.assert_array_equal(got, want)
    finally:
        batcher.close()


def test_cancel_fires_during_device_compute():
    """Cancellation must unblock the request thread WHILE the device batch
    is computing — the canonical serving shape (a 64-cube = 8 tiles) submits
    all tiles in milliseconds and then lives in the drain wait for the whole
    compute, so a per-tile-only poll would never fire (round-3 review
    finding: model_service's disconnect/timeout path was inert for small
    requests)."""
    import time as _time

    from transfer_em_tpu.infer.batcher import TileBatcher
    from transfer_em_tpu.infer.tiling import InferenceCancelled

    compute_s = 3.0

    def slow_step(batch):
        _time.sleep(compute_s)
        return np.zeros((batch.shape[0], 36, 36, 36), np.uint8)

    vol = np.zeros((150, 150, 150), np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    args = (fetch_tile, None, None, (0, 0, 0), (72, 72, 72),
            40, 17, (0.1, 0.9), (0.05, 1.1))

    batcher = TileBatcher(slow_step, insize=74, outdimsize=36, buffer=19,
                          max_batch=16)
    try:
        cancel_at = _time.monotonic() + 0.5
        t0 = _time.monotonic()
        with pytest.raises(InferenceCancelled):
            predict_tiled(*args, batcher=batcher,
                          should_cancel=lambda: _time.monotonic() > cancel_at)
        elapsed = _time.monotonic() - t0
        assert elapsed < compute_s - 0.5, elapsed  # unblocked mid-compute
        # The batcher worker survives the abandoned batch.
        got = predict_tiled(*args, batcher=batcher)
        assert got.shape == (72, 72, 72)
    finally:
        batcher.close()


def test_cancel_polled_before_device_dispatch():
    """Unbatched path: a request whose tiles ALL arrive before the first
    device dispatch (per-tile polls returned False) must still observe a
    late cancel at the pre-dispatch poll in flush() instead of computing a
    chunk nobody will read."""
    from transfer_em_tpu.infer.tiling import InferenceCancelled

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.zeros((150, 150, 150), np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    polls = [0]

    def cancel_on_flush():
        polls[0] += 1
        return polls[0] > 8  # 8 tiles of the 72-cube -> 9th poll is flush's

    with pytest.raises(InferenceCancelled):
        predict_tiled(fetch_tile, gen.apply, params, (0, 0, 0), (72, 72, 72),
                      40, 17, (0.1, 0.9), (0.05, 1.1), batch_size=8,
                      should_cancel=cancel_on_flush)
    assert polls[0] == 9


def test_predict_tiled_out_with_batcher():
    """out= also routes through the shared-TileBatcher serving path."""
    from transfer_em_tpu.infer.batcher import make_tile_batcher

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    vol = np.random.default_rng(11).integers(0, 255, size=(150, 150, 150),
                                             dtype=np.uint8)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    args = (fetch_tile, gen.apply, params, (30, 40, 20), (50, 40, 30),
            40, 17, (0.1, 0.9), (0.05, 1.1))
    want = predict_tiled(*args, batch_size=3)
    batcher = make_tile_batcher(gen.apply, params, (0.1, 0.9), (0.05, 1.1),
                                outdimsize=40, buffer=17, max_batch=4)
    try:
        out = np.zeros((30, 40, 50), np.uint8)
        got = predict_tiled(*args, batcher=batcher, out=out)
        assert got is out
        np.testing.assert_array_equal(got, want)
    finally:
        batcher.close()


def test_default_batch_size_width_aware():
    """B=128 at the reference's widths; scaled down for full-width models
    whose activations would OOM (and wedge the remote tunnel) at 128."""
    import jax
    import jax.numpy as jnp

    from transfer_em_tpu.infer.batcher import make_tile_batcher
    from transfer_em_tpu.infer.tiling import default_batch_size
    from transfer_em_tpu.models import UNetGenerator

    x = jnp.zeros((1, 38, 38, 1))
    by_wf = {}
    for wf in (8, 1):
        p = UNetGenerator(wf=wf).init(jax.random.PRNGKey(0), x)
        by_wf[wf] = default_batch_size(p)
    assert by_wf[8] == 128 and by_wf[1] == 16
    # wf=32 (the CPU test width) stays at the ceiling; junk falls back
    p32 = UNetGenerator(wf=32).init(jax.random.PRNGKey(0), x)
    assert default_batch_size(p32) == 128
    assert default_batch_size({"a": 1}) == 128

    # the serving batcher resolves the same width-aware default per model
    p1 = UNetGenerator(wf=1).init(jax.random.PRNGKey(0), x)
    b = make_tile_batcher(UNetGenerator(wf=1).apply, p1, (0.0, 1.0),
                          (0.0, 1.0), 40, 17)
    try:
        assert b.max_batch == 16
    finally:
        b.close()
    b = make_tile_batcher(UNetGenerator(wf=1).apply, p1, (0.0, 1.0),
                          (0.0, 1.0), 40, 17, max_batch=64)  # explicit wins
    try:
        assert b.max_batch == 64
    finally:
        b.close()
