"""Host-side data pipelines feeding device-resident preprocessing.

TPU-native replacement for the reference tf.data layer
(transfer_em/datasets/datasets.py):

* ``create_dataset_from_tensors``  (datasets.py:14-67): in-memory path —
  reflect pad -> scale -> custom map -> population standardize -> cache ->
  shuffle -> augment -> batch(drop_remainder) -> prefetch.
* ``create_dataset_from_generator`` (datasets.py:69-119): streaming path —
  same minus cache/shuffle, bounded by ``epoch_size``.

Design: the host moves only uint8 bytes; scaling/standardization/augmentation
run on device as one fused jitted map per batch (1 byte/voxel H2D instead of
4).  A background thread keeps ``prefetch`` batches in flight
(double-buffered ``jax.device_put``), hiding host fetch latency behind the
train step — the TPU equivalent of tf.data's AUTOTUNE prefetch.

Parity notes: element order, drop_remainder semantics, and meanstd
computation (mean-of-means / mean-of-variances, datasets.py:173-190) match
the reference; RNG differs by construction (explicit JAX keys, reproducible).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import batch_augment
from ..ops.normalize import get_meanstd, scale_tensor, standardize_population

BATCH_SIZE = 64     # reference datasets.py:10
EPOCH_SIZE = 4096   # reference datasets.py:11
BUFFER_SIZE = 4096  # reference datasets.py:12


def _reflect_pad_np(x: np.ndarray, padding) -> np.ndarray:
    """Host-side REFLECT pad (reference datasets.py:41-43 tf.pad REFLECT)."""
    return np.pad(x, padding, mode="reflect")


class _DevicePrefetcher:
    """Iterate host batches, keeping up to ``depth`` transfers in flight.

    ``transfer`` maps each host item to its in-flight form (default: a bare
    ``jax.device_put``); pass a custom one for structured items, e.g.
    ``(meta, batch)`` tuples where only the batch moves to device.
    """

    def __init__(self, it: Iterator, depth: int = 2,
                 transfer: Callable = jax.device_put):
        self._it = it
        self._depth = depth
        self._transfer = transfer

    def __iter__(self):
        buf: List = []
        try:
            for _ in range(self._depth):
                buf.append(self._transfer(next(self._it)))
        except StopIteration:
            pass
        while buf:
            nxt = buf.pop(0)
            try:
                buf.append(self._transfer(next(self._it)))
            except StopIteration:
                pass
            yield nxt


def _put_indexed(item):
    """Transfer fn for (host_meta, batch) items: device_put the batch only."""
    m, b = item
    return m, jax.device_put(b)


class Dataset:
    """Re-iterable batched dataset; each ``iter()`` is one epoch.

    Yields device arrays of shape (B, *spatial, 1), float32, scaled /
    standardized / augmented, drop_remainder semantics.
    """

    def __init__(self, epoch_fn: Callable[[], Iterator[jax.Array]]):
        self._epoch_fn = epoch_fn

    def __iter__(self):
        return iter(self._epoch_fn())

    def take_batches(self, n: int) -> List[jax.Array]:
        # islice stops BEFORE pulling element n: the old enumerate/break
        # form produced (fetched + device_put + transformed) one extra
        # batch just to discard it — and on this rig every discarded H2D
        # batch permanently grows host RSS (CLAUDE.md tunnel-client leak).
        import itertools
        return list(itertools.islice(self, n))


def _device_transform(custom_map, global_adjust, meanstd, enable_augmentation):
    """Build the fused jitted device map: uint8 batch -> float batch.

    ``cm_key`` seeds the custom map (e.g. warp) and ``aug_key`` the
    augmentation.  The in-memory dataset passes an epoch-INdependent cm_key:
    the reference caches post-warp data (datasets.py:47-60), so the warped
    source domain is fixed across epochs while augmentation re-rolls.
    """

    @jax.jit
    def _tx(batch_u8: jax.Array, cm_key: jax.Array,
            aug_key: jax.Array) -> jax.Array:
        x = scale_tensor(batch_u8)  # (B, *sp, 1) in [-1, 1]
        if custom_map is not None:
            if cm_key.ndim == 1:  # one key for the batch: split positionally
                keys = jax.random.split(cm_key, x.shape[0])
            else:                 # (B, 2): per-ELEMENT keys (id-derived)
                keys = cm_key
            x = jax.vmap(custom_map)(x, keys)
        if global_adjust:
            x = standardize_population(x, meanstd)
        if enable_augmentation:
            x = batch_augment(x, aug_key)
        return x

    return _tx


def _scaled_stream_for_stats(tensors_u8, custom_map, key_fn):
    """Host stream of scaled (+custom-mapped) elements for meanstd (eager
    pass, mirroring reference datasets.py:54-56).  ``key_fn(i)`` supplies the
    custom-map key for element i — the in-memory path passes the SAME
    per-element keys training uses, so the statistics describe exactly the
    warped tensors the model trains on (the reference computes get_meanstd on
    the post-warp cache, datasets.py:47-60)."""
    for i, t in enumerate(tensors_u8):
        x = scale_tensor(jnp.asarray(t))
        if custom_map is not None:
            x = custom_map(x, key_fn(i))
        yield x


def create_dataset_from_tensors(
        tensors: Sequence[np.ndarray],
        custom_map: Optional[Callable] = None,
        batch_size: int = BATCH_SIZE,
        enable_augmentation: bool = True,
        global_adjust: bool = True,
        meanstd: Optional[Tuple[float, float]] = None,
        randomize: bool = False,
        padding=None,
        seed: int = 0,
) -> Tuple[Dataset, Tuple[float, float]]:
    """In-memory dataset (reference ``create_dataset_from_tensors``,
    datasets.py:14-67).

    Args:
      tensors: list of 2D/3D uint8 arrays.
      custom_map: per-element map f(scaled_element, key) -> element, applied
        after scaling (e.g. ``transfer_em_tpu.ops.warp.warp``).  Each
        element's map randomness is a pure function of (seed, element id),
        fixed across epochs and unaffected by ``randomize`` — exactly the
        reference's post-map cache semantics (datasets.py:47-60), where the
        warp is drawn once and the warped tensors are cached.
      randomize: shuffle element order each epoch.
      padding: np.pad-style reflect padding config.
    Returns:
      (Dataset, meanstd)
    """
    base_key = jax.random.PRNGKey(seed)
    tensors = [np.asarray(t, np.uint8) for t in tensors]
    if padding is not None:
        tensors = [_reflect_pad_np(t, padding) for t in tensors]
    stacked = np.stack(tensors)  # cache: all in host memory

    n = len(tensors)
    # Per-ELEMENT custom-map keys derived from element ids, computed once:
    # each element's warp is a pure function of (seed, id), fixed across
    # epochs regardless of shuffling — exactly the reference's post-warp
    # cache semantics (datasets.py:47-60).
    if custom_map is not None:
        _k5 = jax.random.fold_in(base_key, 5000)
        # Eager vmap on the CPU backend: a jit here would pay a remote
        # compile-service round trip per fresh-cache dataset construction
        # (CLAUDE.md); threefry fold_in is backend-deterministic so the key
        # values are identical either way.  If jax_platforms is pinned
        # without a cpu entry (e.g. JAX_PLATFORMS=tpu), fall back to the
        # default backend rather than raising.
        try:
            _cpu = jax.devices("cpu")[0]
        except RuntimeError:
            _cpu = None
        with jax.default_device(_cpu):
            element_keys = np.asarray(
                jax.vmap(lambda i: jax.random.fold_in(_k5, i))(jnp.arange(n)))
    else:
        element_keys = None

    if global_adjust and meanstd is None:
        # The stats pass warps each element with the SAME element key the
        # training transform will use, so the population mean/std describes
        # the dataset the model actually sees — the reference guarantees this
        # by computing get_meanstd over the post-warp cache (datasets.py:47-60).
        meanstd = get_meanstd(
            _scaled_stream_for_stats(
                tensors, custom_map, lambda i: jnp.asarray(element_keys[i])))

    tx = _device_transform(custom_map, global_adjust, meanstd,
                           enable_augmentation)
    _unused_key = jax.random.PRNGKey(0)  # placeholder when custom_map is None
    epoch_counter = [0]
    # Epoch keys live in their own chained stream: a bare fold_in(base, e)
    # would collide with the stats key at e=777 and the element-key base at
    # e=5000 (both reachable in a default 3000-epoch run), reusing
    # randomness across purposes.
    epoch_base = jax.random.fold_in(base_key, 911)

    def epoch() -> Iterator[jax.Array]:
        e = epoch_counter[0]
        epoch_counter[0] += 1
        ekey = jax.random.fold_in(epoch_base, e)
        order = np.arange(n)
        if randomize:
            order = np.asarray(
                jax.random.permutation(jax.random.fold_in(ekey, 0), n))

        def host_batches():
            for s in range(0, n - batch_size + 1, batch_size):  # drop remainder
                idx = order[s:s + batch_size]
                yield idx, stacked[idx]

        def device_batches():
            for bi, (idx, hb) in enumerate(
                    _DevicePrefetcher(host_batches(), transfer=_put_indexed)):
                # per-element warp keys by element id (stable under shuffling)
                cm_keys = jnp.asarray(element_keys[idx]) \
                    if element_keys is not None else _unused_key
                yield tx(hb, cm_keys, jax.random.fold_in(ekey, 1000 + bi))

        return device_batches()

    return Dataset(epoch), meanstd


def create_dataset_from_generator(
        sample_iter_fn: Callable[[], Iterator[np.ndarray]],
        shape=None,
        custom_map: Optional[Callable] = None,
        batch_size: int = BATCH_SIZE,
        epoch_size: int = EPOCH_SIZE,
        global_adjust: bool = True,
        meanstd: Optional[Tuple[float, float]] = None,
        padding=None,
        enable_augmentation: bool = False,
        seed: int = 0,
        fetch_threads: int = 8,
) -> Tuple[Dataset, Tuple[float, float]]:
    """Streaming dataset (reference ``create_dataset_from_generator``,
    datasets.py:69-119).

    Args:
      sample_iter_fn: zero-arg callable returning a (possibly infinite)
        iterator of uint8 arrays — e.g. the volume sources in
        transfer_em_tpu.data.sources.  Called once per epoch.
      shape: deprecated and ignored (parity with reference).
      epoch_size: elements per epoch (bounds the infinite stream).
      fetch_threads: >0 decouples the source from the train loop with ONE
        background pull thread and a bounded queue of depth
        ``2*fetch_threads`` (0 = pull inline).  Fetch CONCURRENCY is the
        source's own business — the volume sources fan out over an
        ordered sliding window of ``num_threads`` (default 8) parallel
        HTTP fetches internally (sources.py `_parallel_fetch`), which is
        what replaces tf.data's num_parallel_calls=AUTOTUNE; tune
        ``volume3d_ng(num_threads=...)``, not this, for fetch-bound loops.
    Returns:
      (Dataset, meanstd)
    """
    del shape
    base_key = jax.random.PRNGKey(seed)

    def bounded_elements() -> Iterator[np.ndarray]:
        it = sample_iter_fn()
        for i, el in enumerate(it):
            if i >= epoch_size:
                break
            el = np.asarray(el, np.uint8)
            if padding is not None:
                el = _reflect_pad_np(el, padding)
            yield el

    if global_adjust and meanstd is None:
        # Eager full pass, like the reference (datasets.py:105-113) — real
        # cost for streaming sources; pass meanstd explicitly to avoid it.
        # Streaming: elements are one-shot draws, so (unlike the cached
        # in-memory path) the stats realization necessarily differs from the
        # training realizations — same as the reference's eager get_meanstd
        # pass over a fresh generator epoch (datasets.py:105-113).
        _k777 = jax.random.fold_in(base_key, 777)
        meanstd = get_meanstd(
            _scaled_stream_for_stats(bounded_elements(), custom_map,
                                     lambda i: jax.random.fold_in(_k777, i)))

    tx = _device_transform(custom_map, global_adjust, meanstd,
                           enable_augmentation)
    epoch_counter = [0]
    # Own chained stream for epoch keys — see create_dataset_from_tensors
    # (a bare fold_in(base, e) collides with the stats key at e=777).
    epoch_base = jax.random.fold_in(base_key, 911)

    def epoch() -> Iterator[jax.Array]:
        e = epoch_counter[0]
        epoch_counter[0] += 1
        ekey = jax.random.fold_in(epoch_base, e)

        def host_batches():
            batch = []
            for el in _threaded(bounded_elements, fetch_threads):
                batch.append(el)
                if len(batch) == batch_size:
                    yield np.stack(batch)
                    batch = []
            # drop remainder

        def device_batches():
            for bi, hb in enumerate(_DevicePrefetcher(host_batches())):
                k = jax.random.fold_in(ekey, 1000 + bi)
                yield tx(hb, jax.random.fold_in(k, 1), jax.random.fold_in(k, 2))

        return device_batches()

    return Dataset(epoch), meanstd


def _threaded(elements_fn: Callable[[], Iterator[np.ndarray]],
              num_threads: int) -> Iterator[np.ndarray]:
    """Run the element iterator on a background thread with a bounded queue.

    The source iterators already parallelize their remote fetches internally
    (see sources.py); this just decouples fetch latency from the train loop.
    """
    if num_threads <= 0:
        yield from elements_fn()
        return
    q: "queue.Queue" = queue.Queue(maxsize=max(2 * num_threads, 8))
    _SENTINEL = object()
    err: list = []
    stop = threading.Event()  # set when the consumer abandons the iterator

    def _put(item) -> bool:
        """Bounded put that gives up once the consumer is gone (an abandoned
        epoch iterator — e.g. zip() with a shorter dataset — must not leave
        this thread blocked forever on a full queue)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for el in elements_fn():
                if not _put(el):
                    return  # consumer gone; drop the source iterator too
        except BaseException as e:  # propagate source failures to the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            el = q.get()
            if el is _SENTINEL:
                if err:
                    raise err[0]
                break
            yield el
    finally:
        stop.set()  # reached on GeneratorExit when abandoned mid-epoch


def zip_datasets(a: Iterable, b: Iterable) -> Iterator:
    """tf.data.Dataset.zip equivalent (reference cgan.py:260)."""
    return zip(a, b)
