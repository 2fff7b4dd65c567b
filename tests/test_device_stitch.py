"""Device-resident stitching == host-path tiled inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.infer.device_stitch import device_predict_tiled
from transfer_em_tpu.infer.tiling import predict_tiled
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.native import gather_blocks


@pytest.fixture(scope="module")
def setup():
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    rng = np.random.default_rng(4)
    vol = rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)
    return gen, params, vol


def test_device_stitch_matches_host_path(setup):
    gen, params, vol = setup
    apply_fn = gen.apply
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    want = predict_tiled(fetch_tile, apply_fn, params, (40, 40, 40),
                         (72, 36, 36), 40, 17, ms_x, ms_y, batch_size=3)
    got = device_predict_tiled(vol, apply_fn, params, (40, 40, 40),
                               (72, 36, 36), 40, 17, ms_x, ms_y,
                               batch_size=3)
    assert got.shape == want.shape == (36, 36, 72)
    np.testing.assert_array_equal(got, want)


def test_device_stitch_far_oob_reads_zeros(setup):
    """A request extending more than one tile size past the volume: the
    device path must read zeros for out-of-range voxels, exactly like the
    host tiles path (gather_blocks zero-fills).  Regression: the device
    path used a fixed one-tile pad, and lax.dynamic_slice CLAMPS an
    out-of-range start — far-OOB tiles silently read shifted volume data."""
    gen, params, vol = setup
    apply_fn = gen.apply
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    # z spans 100..244 over a 160-deep volume: the last tile corner is
    # 191 > 160, so the old insize(74) pad left its slice start out of range.
    start, size = (100, 100, 100), (36, 36, 144)
    want = predict_tiled(fetch_tile, apply_fn, params, start, size,
                         40, 17, ms_x, ms_y, batch_size=2)
    got = device_predict_tiled(vol, apply_fn, params, start, size,
                               40, 17, ms_x, ms_y, batch_size=2)
    assert got.shape == want.shape == (144, 36, 36)
    np.testing.assert_array_equal(got, want)


def test_device_stitch_single_tile(setup):
    gen, params, vol = setup
    apply_fn = gen.apply
    got = device_predict_tiled(vol, apply_fn, params, (40, 40, 40),
                               (36, 36, 36), 40, 17, (0, 1), (0, 1),
                               batch_size=8)
    assert got.shape == (36, 36, 36)


def test_device_stitch_dp_mesh_matches_single_device(setup):
    """mesh= shards tile batches data-parallel across 8 simulated devices;
    result is identical to the single-device scan (duplicated padding
    batches are idempotent under the all-reduce max combine)."""
    from transfer_em_tpu.parallel import make_mesh

    gen, params, vol = setup
    apply_fn = gen.apply
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)
    mesh = make_mesh(8, data=8, space=1)

    for start, size, bs in [((40, 40, 40), (72, 72, 36), 1),
                            ((40, 40, 40), (72, 36, 36), 2)]:
        want = device_predict_tiled(vol, apply_fn, params, start, size,
                                    40, 17, ms_x, ms_y, batch_size=bs)
        got = device_predict_tiled(vol, apply_fn, params, start, size,
                                   40, 17, ms_x, ms_y, batch_size=bs,
                                   mesh=mesh)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_predict_volume_device_mode_accepts_mesh(setup):
    from transfer_em_tpu.infer import predict_volume
    from transfer_em_tpu.parallel import make_mesh

    gen, params, vol = setup
    apply_fn = gen.apply
    mesh = make_mesh(4, data=4, space=1)
    got = predict_volume(vol, apply_fn, params, (40, 40, 40), (36, 36, 36),
                         (0, 1), (0, 1), mode="device", batch_size=2,
                         mesh=mesh)
    want = predict_volume(vol, apply_fn, params, (40, 40, 40), (36, 36, 36),
                          (0, 1), (0, 1), mode="device", batch_size=2)
    np.testing.assert_array_equal(got, want)


def test_predict_volume_rejects_mesh_for_non_device_modes(setup):
    from transfer_em_tpu.infer import predict_volume
    gen, params, vol = setup
    with pytest.raises(ValueError, match="mode='device' or 'stream'"):
        predict_volume(vol, gen.apply, params,
                       (0, 0, 0), (36, 36, 36), (0, 1), (0, 1),
                       mode="slab", mesh=object())
    with pytest.raises(ValueError, match="as_numpy=False"):
        predict_volume(vol, gen.apply, params,
                       (0, 0, 0), (36, 36, 36), (0, 1), (0, 1),
                       mode="tiles", as_numpy=False)


def test_slab_predict_matches_whole_shot(setup):
    """Slab inference == one whole-volume generator pass at the same halo
    alignment.  (The trimmed-tile grid sits at a different stride-2 pooling
    phase, so bit-equality is only guaranteed against an aligned whole-shot;
    consecutive slabs are 40 apart = phase-aligned with each other.)"""
    from transfer_em_tpu.infer.slab import slab_predict
    from transfer_em_tpu.ops.normalize import postprocess_to_u8, preprocess_u8
    gen, params, vol = setup
    apply_fn = gen.apply
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)

    start, size = (30, 40, 20), (40, 36, 80)  # xyz; 80 z -> 2 slabs
    got = slab_predict(vol, apply_fn, params, start, size, ms_x, ms_y)
    assert got.shape == (80, 36, 40)

    # whole-shot at the same alignment: input z covers both slabs' windows
    # (z in 74+40=114 is a valid dimsize: 114 = 74+40)
    from transfer_em_tpu.shapes import is_valid_dimsize
    assert is_valid_dimsize(114)
    b = 17
    x0, y0, z0 = start
    # y/x input extents must match slab_predict's (next valid >= size+2b)
    from transfer_em_tpu.infer.slab import _next_valid
    y_in = _next_valid(36 + 2 * b)
    x_in = _next_valid(40 + 2 * b)
    whole = gather_blocks(vol, [(x0 - b, y0 - b, z0 - b)], 128)[0]
    whole = whole[:114, :y_in, :x_in]
    xin = preprocess_u8(__import__("jax").numpy.asarray(whole)[None], ms_x)
    y = apply_fn(params, xin)
    pred = np.asarray(postprocess_to_u8(y, ms_y))[0, :, :, :, 0]
    np.testing.assert_array_equal(got, pred[:80, :36, :40])


def test_predict_volume_modes_agree(setup):
    """predict_volume: 'device' and 'tiles' agree exactly; 'slab' agrees with
    its aligned whole-shot (covered above) and matches shapes here."""
    from transfer_em_tpu.infer import predict_volume
    gen, params, vol = setup
    apply_fn = gen.apply
    args = (vol, apply_fn, params, (40, 40, 40), (36, 36, 36), (0.1, 0.9),
            (0.05, 1.1))
    a = predict_volume(*args, mode="device")
    b = predict_volume(*args, mode="tiles")
    c = predict_volume(*args, mode="slab")
    np.testing.assert_array_equal(a, b)
    assert c.shape == a.shape
    with pytest.raises(ValueError):
        predict_volume(*args, mode="nope")


def test_predict_volume_device_resident_roundtrip(setup):
    """A jax-array source (upload-once serving pattern) and as_numpy=False
    produce the same voxels as the numpy path, for both device modes."""
    from transfer_em_tpu.infer import predict_volume
    gen, params, vol = setup
    apply_fn = gen.apply
    vol_d = jax.device_put(vol)
    for mode in ("device", "slab"):
        args = (apply_fn, params, (40, 40, 40), (36, 36, 36), (0.1, 0.9),
                (0.05, 1.1))
        want = predict_volume(vol, *args, mode=mode)
        got = predict_volume(vol_d, *args, mode=mode, as_numpy=False)
        assert isinstance(got, jax.Array) and got.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(got), want)


def test_predict_volume_ndarray_meanstd_all_modes(setup):
    """meanstd passed as np.ndarray (get_meanstd returns a 2-sequence; an
    array is a natural way callers hold it) must work in EVERY mode — the
    device/slab paths previously crashed on `if meanstd` truthiness."""
    from transfer_em_tpu.infer import predict_volume
    gen, params, vol = setup
    apply_fn = gen.apply
    ms_x, ms_y = np.array([0.1, 0.9]), np.array([0.05, 1.1])
    args = (vol, apply_fn, params, (40, 40, 40), (36, 36, 36), ms_x, ms_y)
    ref = predict_volume(vol, apply_fn, params, (40, 40, 40), (36, 36, 36),
                         (0.1, 0.9), (0.05, 1.1), mode="device")
    got_dev = predict_volume(*args, mode="device")
    got_slab = predict_volume(*args, mode="slab")
    got_tiles = predict_volume(*args, mode="tiles")
    np.testing.assert_array_equal(got_dev, ref)
    np.testing.assert_array_equal(got_tiles, ref)
    assert got_slab.shape == ref.shape


def test_predict_volume_out_handling(setup, tmp_path):
    """out= fills the caller's buffer for tiles/stream and raises (instead of
    silently ignoring it) for device/slab."""
    from transfer_em_tpu.infer import predict_volume
    gen, params, vol = setup
    apply_fn = gen.apply
    args = (vol, apply_fn, params, (40, 40, 40), (36, 36, 36), (0.1, 0.9),
            (0.05, 1.1))
    want = predict_volume(*args, mode="device")
    out = np.lib.format.open_memmap(tmp_path / "out.npy", mode="w+",
                                    dtype=np.uint8, shape=want.shape)
    got = predict_volume(*args, mode="tiles", out=out)
    assert got is out
    np.testing.assert_array_equal(np.asarray(out), want)
    for mode in ("device", "slab"):
        with pytest.raises(ValueError, match="out="):
            predict_volume(*args, mode=mode, out=np.zeros_like(want))


def test_choose_mode_and_auto(setup):
    """mode="auto" resolves via choose_mode: "device" when input+output fit
    within the headroom of accelerator memory, "stream" otherwise; the auto
    result equals the explicit device-mode result (both paths bit-identical
    by the tests above, so auto adds selection, not semantics)."""
    from transfer_em_tpu.infer import choose_mode, predict_volume

    assert choose_mode((160, 160, 160), (36, 36, 36),
                       hbm_bytes=16 << 30) == "device"
    # 12 GB input + output vs 16 GB HBM at 0.5 headroom -> stream
    assert choose_mode((2048, 2048, 3072), (2048, 2048, 3072),
                       hbm_bytes=16 << 30) == "stream"
    assert choose_mode((2048, 2048, 3072), (64, 64, 64),
                       hbm_bytes=16 << 30, headroom=2.0) == "device"

    gen, params, vol = setup
    ms = ((0.1, 0.9), (0.05, 1.1))
    got = predict_volume(vol, gen.apply, params, (40, 40, 40), (36, 36, 36),
                         *ms, mode="auto", batch_size=3)
    want = predict_volume(vol, gen.apply, params, (40, 40, 40), (36, 36, 36),
                          *ms, mode="device", batch_size=3)
    np.testing.assert_array_equal(got, want)

    # auto honors a preallocated out= by resolving to the streaming path.
    out = np.zeros((36, 36, 36), np.uint8)
    got2 = predict_volume(vol, gen.apply, params, (40, 40, 40),
                          (36, 36, 36), *ms, mode="auto", out=out)
    assert got2 is out
    np.testing.assert_array_equal(out, want)

    # as_numpy=False resolves auto to "device" (the only auto candidate
    # that can return a device array) instead of raising when the
    # footprint rule would have picked "stream".
    got3 = predict_volume(vol, gen.apply, params, (40, 40, 40),
                          (36, 36, 36), *ms, mode="auto", batch_size=3,
                          as_numpy=False)
    assert isinstance(got3, jax.Array)
    np.testing.assert_array_equal(np.asarray(got3), want)

    # as_numpy=False + out= under auto is contradictory (device-resident
    # result vs host-stitched buffer): explicit ValueError, neither wins
    # silently (ADVICE round 4).
    with pytest.raises(ValueError, match="contradictory"):
        predict_volume(vol, gen.apply, params, (40, 40, 40), (36, 36, 36),
                       *ms, mode="auto", as_numpy=False,
                       out=np.zeros((36, 36, 36), np.uint8))


def test_slab_origin_is_traced_not_static(setup):
    """Distinct interior request starts must reuse ONE compiled slab
    program: the origin rides as a traced int32 triple, so only geometry
    (extents / pad config) keys the jit cache.  A static origin would
    recompile the whole slab scan per start (5-10 s minimum through the
    remote compile service, CLAUDE.md)."""
    from transfer_em_tpu.infer.slab import _run, slab_predict

    gen, params, vol = setup
    ms = ((0.1, 0.9), (0.05, 1.1))
    before = _run._cache_size()
    outs = [slab_predict(vol, gen.apply, params, s, (40, 36, 40), *ms)
            for s in ((30, 40, 20), (34, 44, 24), (38, 48, 28))]
    assert _run._cache_size() == before + 1  # one program, three starts
    assert all(o.shape == (40, 36, 40) for o in outs)
    # ... and the traced origin computes the same voxels as a fresh call
    # path: cross-check one start against mode="device".
    from transfer_em_tpu.infer import predict_volume
    wanted = predict_volume(vol, gen.apply, params, (34, 44, 24),
                            (40, 36, 40), *ms, mode="device", batch_size=8)
    got = outs[1]
    # slab pooling-phase alignment can differ from the tile grid by
    # bf16-level amounts (module docstring); exact equality holds on CPU f32
    np.testing.assert_array_equal(got, wanted)
