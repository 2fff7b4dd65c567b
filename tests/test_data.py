"""Data pipeline tests: parity semantics of the dataset constructors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfer_em_tpu.data import (create_dataset_from_generator,
                                  create_dataset_from_tensors, corner_stream,
                                  zip_datasets)
from transfer_em_tpu.ops.normalize import get_meanstd, scale_tensor


def _tensors(rng, n=10, size=32):
    return [rng.integers(0, 255, size=(size, size), dtype=np.uint8)
            for _ in range(n)]


def test_tensors_dataset_shapes_and_range(rng):
    ds, meanstd = create_dataset_from_tensors(
        _tensors(rng), batch_size=4, enable_augmentation=False)
    batches = list(ds)
    # 10 elements, batch 4, drop_remainder -> 2 batches (reference
    # datasets.py:67 batch(drop_remainder=True))
    assert len(batches) == 2
    assert batches[0].shape == (4, 32, 32, 1)
    assert batches[0].dtype == jnp.float32


def test_meanstd_computed_and_applied(rng):
    tensors = _tensors(rng)
    ds, meanstd = create_dataset_from_tensors(
        tensors, batch_size=10, enable_augmentation=False)
    want = get_meanstd([scale_tensor(jnp.asarray(t)) for t in tensors])
    np.testing.assert_allclose(meanstd, want, rtol=1e-5)
    batch = next(iter(ds))
    # standardized data: mean ~0 across the full set
    assert abs(float(batch.mean())) < 0.2


def test_meanstd_passthrough(rng):
    ds, meanstd = create_dataset_from_tensors(
        _tensors(rng), batch_size=2, meanstd=(0.25, 2.0),
        enable_augmentation=False)
    assert meanstd == (0.25, 2.0)


def test_no_global_adjust(rng):
    tensors = _tensors(rng)
    ds, meanstd = create_dataset_from_tensors(
        tensors, batch_size=10, global_adjust=False,
        enable_augmentation=False)
    assert meanstd is None
    batch = np.asarray(next(iter(ds)))
    want = np.asarray(scale_tensor(jnp.asarray(np.stack(tensors))))
    np.testing.assert_allclose(batch, want, atol=1e-6)


def test_shuffle_reorders_but_preserves_content(rng):
    tensors = _tensors(rng, n=8)
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=8, randomize=True, global_adjust=False,
        enable_augmentation=False)
    e1 = np.asarray(next(iter(ds)))
    e2 = np.asarray(next(iter(ds)))  # next epoch: different order
    assert not np.array_equal(e1, e2)
    np.testing.assert_allclose(np.sort(e1.ravel()), np.sort(e2.ravel()),
                               atol=1e-6)


def test_augmentation_changes_per_epoch(rng):
    tensors = _tensors(rng, n=4)
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=4, enable_augmentation=True, randomize=False)
    e1 = np.asarray(next(iter(ds)))
    e2 = np.asarray(next(iter(ds)))
    assert not np.array_equal(e1, e2)


def test_custom_map_applied(rng):
    tensors = _tensors(rng, n=4)

    def half(el, key):
        return el * 0.5

    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=4, custom_map=half, global_adjust=False,
        enable_augmentation=False)
    got = np.asarray(next(iter(ds)))
    want = np.asarray(scale_tensor(jnp.asarray(np.stack(tensors)))) * 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_meanstd_uses_training_warp_keys(rng):
    """The stats pass must warp each element with the SAME per-element key
    the training transform uses, so the population mean/std describes the
    dataset the model actually sees (the reference computes get_meanstd over
    the post-warp CACHE, datasets.py:47-60).  Regression: the stats pass
    once drew its own key stream, standardizing against differently-warped
    tensors."""
    tensors = _tensors(rng, n=6)

    def keyed_map(el, key):
        # key-sensitive map: any key mismatch between stats and training
        # shifts the element mean detectably
        return el + jax.random.uniform(key, ()) * 2.0

    ds, meanstd = create_dataset_from_tensors(
        tensors, batch_size=6, custom_map=keyed_map,
        enable_augmentation=False, seed=3)
    # expected: stats over elements warped with the TRAINING element keys
    k5 = jax.random.fold_in(jax.random.PRNGKey(3), 5000)
    want = get_meanstd(
        keyed_map(scale_tensor(jnp.asarray(t)), jax.random.fold_in(k5, i))
        for i, t in enumerate(tensors))
    np.testing.assert_allclose(meanstd, want, rtol=1e-6)
    # and the standardized batch is (mapped - mean) / std of ITS OWN stats:
    batch = np.asarray(next(iter(ds)))
    mapped = np.stack([
        np.asarray(keyed_map(scale_tensor(jnp.asarray(t)),
                             jax.random.fold_in(k5, i)))
        for i, t in enumerate(tensors)])
    np.testing.assert_allclose(
        batch, (mapped - meanstd[0]) / meanstd[1], atol=1e-5)


def test_reflect_padding(rng):
    tensors = _tensors(rng, n=2, size=16)
    pad = ((4, 4), (4, 4))
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=2, padding=pad, global_adjust=False,
        enable_augmentation=False)
    batch = np.asarray(next(iter(ds)))
    assert batch.shape == (2, 24, 24, 1)
    want = np.pad(tensors[0], pad, mode="reflect")
    np.testing.assert_allclose(
        batch[0, :, :, 0], (want.astype(np.float32) / 127.5) - 1, atol=1e-6)


def test_generator_dataset_epoch_bound(rng):
    calls = [0]

    def source():
        def it():
            while True:
                calls[0] += 1
                yield rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
        return it()

    ds, meanstd = create_dataset_from_generator(
        source, batch_size=4, epoch_size=8, meanstd=(0.0, 1.0),
        fetch_threads=0)
    batches = list(ds)
    assert len(batches) == 2  # 8 elements / batch 4
    assert batches[0].shape == (4, 16, 16, 1)


def test_corner_stream_seeded_reproducible():
    bbox = ((0, 0, 0), (100, 100, 100))
    c1 = corner_stream(bbox, 10, seed=3)
    c2 = corner_stream(bbox, 10, seed=3)
    got1 = [next(c1) for _ in range(10)]
    got2 = [next(c2) for _ in range(10)]
    assert got1 == got2
    for x, y, z in got1:
        assert 0 <= x < 100 and 0 <= y < 100 and 0 <= z < 100


def test_corner_stream_explicit_array():
    rois = [(1, 2, 3), (4, 5, 6)]
    assert list(corner_stream(None, 10, None, array=rois)) == rois


def test_corner_stream_stratified():
    classes = [[((0, 0, 0), (10, 10, 10))], [((100, 100, 100), (110, 110, 110))]]
    cs = corner_stream(None, 5, seed=0, array=classes, sample_array=True,
                       sample_class=True)
    pts = [next(cs) for _ in range(40)]
    lo = sum(1 for p in pts if p[0] < 50)
    hi = len(pts) - lo
    assert lo > 0 and hi > 0  # both strata sampled


def test_zip_datasets(rng):
    a, _ = create_dataset_from_tensors(_tensors(rng, 4), batch_size=2,
                                       enable_augmentation=False)
    b, _ = create_dataset_from_tensors(_tensors(rng, 4), batch_size=2,
                                       enable_augmentation=False)
    pairs = list(zip_datasets(a, b))
    assert len(pairs) == 2
    assert pairs[0][0].shape == pairs[0][1].shape


def test_threaded_fetch_overlaps_latency(rng):
    """The streaming pipeline must hide source latency behind concurrency
    (SURVEY.md §7 'hiding ~100ms HTTP fetches'): with 8 parallel fetches of a
    25ms-latency source, wall time for an epoch must be well under serial."""
    import time

    from transfer_em_tpu.data.sources import _parallel_fetch

    def slow_fetch(corner):
        time.sleep(0.025)
        return np.zeros((4, 4, 4), np.uint8)

    corners = iter([(0, 0, 0)] * 32)
    t0 = time.perf_counter()
    out = list(_parallel_fetch(corners, slow_fetch, num_threads=8))
    dt = time.perf_counter() - t0
    assert len(out) == 32
    serial = 32 * 0.025
    assert dt < serial * 0.6, (dt, serial)  # >= ~2x overlap in practice


def test_custom_map_fixed_across_epochs(rng):
    """The reference caches post-warp data (datasets.py:47-60): without
    shuffling, each element's warp must be identical across epochs while
    augmentation still re-rolls."""
    from transfer_em_tpu.debug import warp
    tensors = [rng.integers(0, 255, size=(128, 128), dtype=np.uint8)
               for _ in range(4)]
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=4, custom_map=warp, global_adjust=False,
        enable_augmentation=False, randomize=False)
    e1 = np.asarray(next(iter(ds)))
    e2 = np.asarray(next(iter(ds)))
    np.testing.assert_array_equal(e1, e2)


def test_custom_map_fixed_per_element_under_shuffling(rng):
    """Per-element warp keys are derived from element IDS, so each element's
    warp stays fixed across epochs even when shuffling reorders batches —
    the reference's post-warp cache semantics under .shuffle()."""
    from transfer_em_tpu.debug import warp
    tensors = [rng.integers(0, 255, size=(64, 64), dtype=np.uint8)
               for _ in range(6)]
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=1, custom_map=warp, global_adjust=False,
        enable_augmentation=False, randomize=True, seed=9)

    e1 = [np.asarray(b)[0] for b in iter(ds)]
    e2 = [np.asarray(b)[0] for b in iter(ds)]
    # same multiset of warped elements, different order
    s1 = sorted(e1, key=lambda a: a.tobytes())
    s2 = sorted(e2, key=lambda a: a.tobytes())
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)


def test_make_warp_map_works_in_pipeline(rng):
    """make_warp_map's documented use as a dataset custom_map (it must
    accept the pipeline's PRNG-key second argument)."""
    from transfer_em_tpu.ops.warp import make_warp_map
    tensors = [rng.integers(0, 255, size=(64, 64), dtype=np.uint8)
               for _ in range(4)]
    ds, _ = create_dataset_from_tensors(
        tensors, batch_size=2, custom_map=make_warp_map(3),
        global_adjust=False, enable_augmentation=False)
    batch = np.asarray(next(iter(ds)))
    assert batch.shape == (2, 64, 64, 1)
    assert np.all(np.isfinite(batch))
    # reproducible across epochs (no shuffling)
    np.testing.assert_array_equal(batch, np.asarray(next(iter(ds))))


def test_threaded_iterator_abandonment_does_not_leak_threads():
    """Abandoning an epoch iterator mid-stream (zip with a shorter dataset,
    reference cgan.py:260) must not leave worker threads blocked forever."""
    import threading
    import time as _time

    from transfer_em_tpu.data import create_dataset_from_generator

    def source():
        def it():
            i = 0
            while True:  # infinite
                yield np.full((8, 8), i % 255, np.uint8)
                i += 1
        return it()

    ds, _ = create_dataset_from_generator(
        source, batch_size=1, epoch_size=1000, meanstd=(0.0, 1.0),
        fetch_threads=2)
    before = threading.active_count()
    for _ in range(5):
        it = iter(ds)
        next(it)  # consume one batch, abandon the rest
        del it
    _time.sleep(1.0)  # workers notice the stop event within ~0.2 s
    after = threading.active_count()
    assert after <= before + 1, (before, after)


def test_generator_source_errors_propagate(rng):
    """A failing source must surface its exception, not silently truncate
    the epoch (failure-detection parity: the reference raises through
    tf.py_function)."""
    def bad_source():
        def it():
            yield rng.integers(0, 255, size=(8, 8), dtype=np.uint8)
            raise RuntimeError("fetch exploded")
        return it()

    ds, _ = create_dataset_from_generator(
        bad_source, batch_size=1, epoch_size=4, meanstd=(0.0, 1.0),
        fetch_threads=2)
    with pytest.raises(RuntimeError, match="fetch exploded"):
        list(ds)


def test_parallel_fetch_abandonment_drops_queued_work():
    """Closing the generator mid-iteration (what a cancelled serving request
    does) must CANCEL the queued fetches instead of executing them — a
    with-block shutdown(wait=True) would run every pending network read
    before the caller's finally could release its admission slot."""
    import threading
    import time

    from transfer_em_tpu.data.sources import _parallel_fetch

    started = [0]
    lock = threading.Lock()

    def slow_fetch(corner):
        with lock:
            started[0] += 1
        time.sleep(0.05)
        return np.zeros((2, 2, 2), np.uint8)

    corners = iter([(i, 0, 0) for i in range(200)])
    gen = _parallel_fetch(corners, slow_fetch, num_threads=4)
    next(gen)
    t0 = time.perf_counter()
    gen.close()  # GeneratorExit inside _parallel_fetch
    dt = time.perf_counter() - t0
    # In-flight fetches (<= num_threads) may finish in the background, but
    # close() must not block on the whole queued window, and the queued
    # (cancelled) fetches must never start.
    assert dt < 0.5, dt
    time.sleep(0.2)  # let any stragglers run if cancellation were broken
    assert started[0] <= 1 + 2 * 4, started[0]  # window, not the 200


def test_make_warp_map_accepts_typed_keys():
    """New-style typed PRNG keys (jax.random.key) are ndim-0 scalars —
    they must route to the key branch, not the integer fold_in slot
    (round-5 review), and stay deterministic."""
    from transfer_em_tpu.ops.warp import make_warp_map

    m = make_warp_map(seed=3)
    el = jnp.asarray(np.random.default_rng(0)
                     .uniform(-1, 1, (74, 74, 1)).astype(np.float32))
    k = jax.random.key(7)
    a = np.asarray(m(el, k))
    b = np.asarray(m(el, jax.random.key(7)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == el.shape and np.isfinite(a).all()
    # legacy uint32 keys and integer indices still work
    c = np.asarray(m(el, jax.random.PRNGKey(7)))
    d = np.asarray(m(el, 5))
    assert c.shape == el.shape and d.shape == el.shape


def test_take_batches_consumes_exactly_n():
    """take_batches(n) must not pull (fetch + device_put + transform) an
    extra discarded batch — on the axon rig every discarded H2D batch
    permanently grows host RSS (round-5 review)."""
    from transfer_em_tpu.data.pipeline import Dataset

    produced = []

    def epoch():
        i = 0
        while True:
            produced.append(i)
            yield i
            i += 1

    d = Dataset(lambda: epoch())
    got = d.take_batches(3)
    assert got == [0, 1, 2]
    assert produced == [0, 1, 2]  # not [0, 1, 2, 3]
