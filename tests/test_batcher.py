"""Cross-request tile batching (infer/batcher.py).

The reference's production serving pattern is many concurrent 64-aligned
chunk requests (model_cloudrun/transferem.py:66-73); TileBatcher coalesces
their tiles into shared device batches.  These tests pin down: correctness
under concurrency, coalescing actually happening, shape grouping, error
propagation, plan validation, and bit-identity of predict_tiled through a
batcher (plain, fetch_input, and mesh-sharded)."""

import concurrent.futures as cf
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.infer.batcher import TileBatcher, make_tile_batcher
from transfer_em_tpu.infer.tiling import predict_tiled
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.native import gather_blocks


def _fake_step(arr):
    """(B, s, s, s) u8 -> (B, s-2, s-2, s-2) u8: crop 1 + invert."""
    a = np.asarray(arr)
    return 255 - a[:, 1:-1, 1:-1, 1:-1]


def test_tile_batcher_concurrent_correct_and_coalesces():
    b = TileBatcher(_fake_step, insize=10, max_batch=16, linger_ms=100.0,
                    min_bucket=4)
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 255, size=(60, 10, 10, 10), dtype=np.uint8)
    try:
        def submit_range(lo, hi):
            return [(i, b.submit(tiles[i])) for i in range(lo, hi)]

        with cf.ThreadPoolExecutor(max_workers=6) as ex:
            futs = ex.map(lambda j: submit_range(10 * j, 10 * j + 10),
                          range(6))
            pairs = [p for chunk in futs for p in chunk]
        for i, fut in pairs:
            np.testing.assert_array_equal(
                fut.result(timeout=30),
                255 - tiles[i, 1:-1, 1:-1, 1:-1])
        s = b.stats()
        assert s["tiles"] == 60
        # 60 tiles submitted within the 100 ms linger must coalesce (the
        # worst case without coalescing would be 60 batches).
        assert s["batches"] <= 30
        assert s["largest"] > 1
        assert 0 < s["occupancy"] <= 1
    finally:
        b.close()


def test_tile_batcher_mixed_shapes_grouped():
    b = TileBatcher(_fake_step, insize=None, max_batch=8, linger_ms=50.0,
                    min_bucket=2)
    try:
        t1 = np.full((6, 6, 6), 3, np.uint8)
        t2 = np.full((8, 8, 8), 7, np.uint8)
        f1, f2 = b.submit(t1), b.submit(t2)
        np.testing.assert_array_equal(f1.result(timeout=30),
                                      255 - t1[1:-1, 1:-1, 1:-1])
        np.testing.assert_array_equal(f2.result(timeout=30),
                                      255 - t2[1:-1, 1:-1, 1:-1])
    finally:
        b.close()


def test_tile_batcher_error_propagates_and_survives():
    calls = []

    def step(arr):
        calls.append(np.asarray(arr).shape)
        if np.asarray(arr)[0, 0, 0, 0] == 99:
            raise RuntimeError("boom")
        return _fake_step(arr)

    b = TileBatcher(step, insize=4, max_batch=4, linger_ms=5.0, min_bucket=1)
    try:
        bad = np.full((4, 4, 4), 99, np.uint8)
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(bad).result(timeout=30)
        # The worker survives a failing batch and keeps serving; the
        # failure is visible at /stats (errors counter), not hidden.
        good = np.full((4, 4, 4), 1, np.uint8)
        np.testing.assert_array_equal(b.submit(good).result(timeout=30),
                                      255 - good[1:-1, 1:-1, 1:-1])
        s = b.stats()
        assert s["errors"] == 1
        assert s["tiles"] == 1  # only the successful tile counts
    finally:
        b.close()


def test_tile_batcher_run_direct_after_close():
    """run_direct is the graceful-degradation path for a request whose
    batcher was closed under it (model-cache eviction / service stop)."""
    b = TileBatcher(_fake_step, insize=6, max_batch=4, min_bucket=2)
    t = np.arange(216, dtype=np.uint8).reshape(6, 6, 6)
    via_queue = b.submit(t).result(timeout=30)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(t)
    np.testing.assert_array_equal(b.run_direct(t), via_queue)


def test_predict_tiled_closed_batcher_degrades(small_model, vol):
    """A batcher closed before (or during) a request must not fail or hang
    it: predict_tiled falls back to run_direct per tile, same bytes."""
    gen, params = small_model
    msx, msy = (0.1, 0.9), (0.2, 1.1)
    args = (_fetch(vol), gen.apply, params, (64, 64, 64), (36, 36, 36),
            40, 17, msx, msy)
    want = predict_tiled(*args)
    batcher = make_tile_batcher(gen.apply, params, msx, msy, 40, 17,
                                max_batch=8, min_bucket=4)
    batcher.close()
    got = predict_tiled(*args, batcher=batcher)
    np.testing.assert_array_equal(got, want)
    assert batcher.stats()["tiles"] == 0  # everything went direct


def test_tile_batcher_cancelled_future_skipped():
    """A caller cancelling its pending future must not kill the worker
    (set_result on a cancelled future raises InvalidStateError)."""
    gate = threading.Event()
    first = threading.Event()

    def step(arr):
        if not first.is_set():
            first.set()
            gate.wait(timeout=30)  # hold batch A so B stays queued
        return _fake_step(arr)

    b = TileBatcher(step, insize=4, max_batch=1, linger_ms=0.0, min_bucket=1)
    try:
        ta = np.full((4, 4, 4), 1, np.uint8)
        tb = np.full((4, 4, 4), 2, np.uint8)
        fa = b.submit(ta)
        first.wait(timeout=30)       # worker is inside step(A)
        fb = b.submit(tb)            # queued behind A
        assert fb.cancel()           # still PENDING -> cancellable
        gate.set()
        np.testing.assert_array_equal(fa.result(timeout=30),
                                      255 - ta[1:-1, 1:-1, 1:-1])
        # Worker skipped the cancelled tile and keeps serving.
        tc = np.full((4, 4, 4), 3, np.uint8)
        np.testing.assert_array_equal(b.submit(tc).result(timeout=30),
                                      255 - tc[1:-1, 1:-1, 1:-1])
        s = b.stats()
        assert s["tiles"] == 2 and s["errors"] == 0
    finally:
        gate.set()
        b.close()


def test_tile_batcher_submit_close_race_never_orphans():
    """Every future handed out by submit() resolves, even with close()
    racing the submitters (the sentinel and the closed-flag share a lock,
    so no tile can land behind the sentinel and hang its caller)."""
    for _ in range(20):
        b = TileBatcher(_fake_step, insize=4, max_batch=8, linger_ms=0.5,
                        min_bucket=1)
        t = np.full((4, 4, 4), 5, np.uint8)
        futs, stop = [], threading.Event()

        def hammer():
            while not stop.is_set():
                try:
                    futs.append(b.submit(t))
                except RuntimeError:
                    return

        th = threading.Thread(target=hammer)
        th.start()
        b.close()
        stop.set()
        th.join(timeout=30)
        for f in futs:  # accepted before the sentinel => must resolve
            np.testing.assert_array_equal(f.result(timeout=30),
                                          255 - t[1:-1, 1:-1, 1:-1])


def test_tile_batcher_validation_and_close():
    b = TileBatcher(_fake_step, insize=6, max_batch=4)
    with pytest.raises(ValueError, match="different tile plan"):
        b.submit(np.zeros((5, 5, 5), np.uint8))
    b.close()
    b.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((6, 6, 6), np.uint8))


@pytest.fixture(scope="module")
def small_model():
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    return gen, params


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)


def _fetch(vol):
    return lambda corner, insize: gather_blocks(vol, [corner], insize)[0]


def test_predict_tiled_batcher_matches_plain(small_model, vol):
    gen, params = small_model
    msx, msy = (0.1, 0.9), (0.2, 1.1)
    args = (_fetch(vol), gen.apply, params, (64, 64, 64), (64, 64, 64),
            40, 17, msx, msy)

    want = predict_tiled(*args)
    batcher = make_tile_batcher(gen.apply, params, msx, msy, 40, 17,
                                max_batch=8, linger_ms=20.0, min_bucket=4)
    try:
        got = predict_tiled(*args, batcher=batcher)
        np.testing.assert_array_equal(got, want)

        # fetch_input path returns the same (input, output) pair.
        want_in, want_out = predict_tiled(*args, fetch_input=True)
        got_in, got_out = predict_tiled(*args, fetch_input=True,
                                        batcher=batcher)
        np.testing.assert_array_equal(got_in, want_in)
        np.testing.assert_array_equal(got_out, want_out)

        assert batcher.stats()["tiles"] == 16  # 8 tiles per request
    finally:
        batcher.close()

    # Plan mismatch (different outdimsize) is refused up front.
    wrong = make_tile_batcher(gen.apply, params, msx, msy, 34, 20,
                              max_batch=4)
    try:
        with pytest.raises(ValueError, match="outdimsize/buffer mismatch"):
            predict_tiled(*args, batcher=wrong)
    finally:
        wrong.close()


def test_predict_tiled_batcher_mesh_matches_single_device(small_model, vol):
    """A mesh-sharded batcher (bucket sizes rounded to the data-axis size)
    serves bit-identically to the unsharded path."""
    from transfer_em_tpu.parallel import make_mesh

    gen, params = small_model
    msx, msy = (0.1, 0.9), (0.2, 1.1)
    args = (_fetch(vol), gen.apply, params, (64, 64, 64), (64, 64, 64),
            40, 17, msx, msy)
    want = predict_tiled(*args)
    batcher = make_tile_batcher(gen.apply, params, msx, msy, 40, 17,
                                mesh=make_mesh(8), max_batch=8,
                                linger_ms=20.0, min_bucket=4)
    try:
        got = predict_tiled(*args, batcher=batcher)
    finally:
        batcher.close()
    np.testing.assert_array_equal(got, want)


def test_tile_batcher_cross_thread_coalescing_single_batch(small_model, vol):
    """Tiles submitted by two 'requests' (threads) inside one linger window
    land in ONE shared device batch — the cross-request win itself."""
    gen, params = small_model
    msx, msy = (0.1, 0.9), (0.2, 1.1)
    batcher = make_tile_batcher(gen.apply, params, msx, msy, 40, 17,
                                max_batch=32, linger_ms=2000.0, min_bucket=4)
    try:
        fetch = _fetch(vol)
        barrier = threading.Barrier(2)

        def request(start):
            barrier.wait()
            return predict_tiled(fetch, gen.apply, params, start,
                                 (36, 36, 36), 40, 17, msx, msy,
                                 batcher=batcher)

        with cf.ThreadPoolExecutor(max_workers=2) as ex:
            a = ex.submit(request, (64, 64, 64))
            c = ex.submit(request, (100, 100, 100))
            out_a, out_c = a.result(timeout=300), c.result(timeout=300)

        # Each request is a single 36^3 tile; both resolved correctly.
        for start, got in (((64, 64, 64), out_a), ((100, 100, 100), out_c)):
            want = predict_tiled(fetch, gen.apply, params, start,
                                 (36, 36, 36), 40, 17, msx, msy)
            np.testing.assert_array_equal(got, want)
        s = batcher.stats()
        assert s["tiles"] == 2
        assert s["largest"] == 2, s   # one shared batch, not two singletons
        assert s["batches"] == 1, s
    finally:
        batcher.close()


def test_bucket_ladder_granule_bounds_padding():
    """Round-4 bucket ladder: multiples of ``bucket_granule`` (default 8)
    instead of powers of two — pad waste is bounded at granule-1 slots per
    batch (the round-4 soak measured 57% occupancy under pow2; pad slots
    cost H2D bytes and device FLOPs)."""
    b = TileBatcher(_fake_step, insize=4, max_batch=128, min_bucket=8)
    try:
        assert [b._bucket(k) for k in (1, 8, 9, 16, 17, 24, 25, 65, 121, 128)] \
            == [8, 8, 16, 16, 24, 24, 32, 72, 128, 128]
    finally:
        b.close()
    # Granule interacts with the mesh data-axis rounding (multiple) and the
    # max_batch clamp exactly as the pow2 ladder did.
    b = TileBatcher(_fake_step, insize=4, max_batch=128, min_bucket=8,
                    multiple=3)
    try:
        assert b._bucket(9) == 18   # round_up(9, 8) = 16 -> multiple of 3
    finally:
        b.close()
    b = TileBatcher(_fake_step, insize=4, max_batch=4, min_bucket=1)
    try:
        assert [b._bucket(k) for k in (1, 3, 4)] == [4, 4, 4]  # clamped
    finally:
        b.close()


def test_bucket_granule_one_restores_exact_batches():
    b = TileBatcher(_fake_step, insize=4, max_batch=128, min_bucket=1,
                    bucket_granule=1)
    try:
        assert [b._bucket(k) for k in (1, 3, 7, 100)] == [1, 3, 7, 100]
    finally:
        b.close()


def test_wrong_params_batcher_rejected_by_identity(small_model, vol):
    """Geometry + meanstd cannot catch a wrong-MODEL batcher (two models can
    share a plan, and meanstd can be None on both sides): predict_tiled
    fingerprints the params the batcher's step baked in against the
    caller's params and refuses a mismatch (same structure, different
    weights => sampled leaf values differ)."""
    import jax as _jax

    gen, params = small_model
    other = gen.init(_jax.random.PRNGKey(9), jnp.zeros((1, 74, 74, 74, 1)))
    msx, msy = (0.1, 0.9), (0.05, 1.1)
    b = make_tile_batcher(gen.apply, params, msx, msy, 40, 17, max_batch=4)
    try:
        with pytest.raises(ValueError, match="DIFFERENT params"):
            predict_tiled(_fetch(vol), gen.apply, other, (40, 40, 40),
                          (36, 36, 36), 40, 17, msx, msy, batcher=b)
    finally:
        b.close()


def test_equivalent_params_copy_accepted_by_batcher(small_model, vol):
    """A structurally-identical COPY of the batcher's params (checkpoint
    reload / device_put / tree_map — ADVICE round 4) must NOT be rejected:
    raw object identity would false-positive on the exact params the step
    bakes in, just rehydrated by a different code path."""
    gen, params = small_model
    msx, msy = (0.1, 0.9), (0.05, 1.1)
    copy = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
    assert copy is not params
    b = make_tile_batcher(gen.apply, params, msx, msy, 40, 17, max_batch=4)
    try:
        got = predict_tiled(_fetch(vol), gen.apply, copy, (40, 40, 40),
                            (36, 36, 36), 40, 17, msx, msy, batcher=b)
        want = predict_tiled(_fetch(vol), gen.apply, params, (40, 40, 40),
                             (36, 36, 36), 40, 17, msx, msy)
        np.testing.assert_array_equal(got, want)
    finally:
        b.close()
