"""Cross-request tile batching: coalesce concurrent serving requests into
shared device batches.

The measured serving lesson (PERF.md): at the reference's wf=8 widths the
convs are per-kernel-overhead-bound, so device batch is the dominant
throughput lever (B=8 ~32 Mvox/s vs B=128 ~223 Mvox/s on v5e).  The
reference's production scale-out pattern is many CONCURRENT 64-aligned chunk
requests against the model service (model_cloudrun/transferem.py:66-73 —
Cloud Run fan-out, one cached model, each request predicting its own chunk
serially).  One 64^3 chunk is only 8 tiles (outdimsize 36), so independent
requests run tiny device batches and leave most of the throughput on the
floor.

``TileBatcher`` is the TPU-first fix: ONE device-owning worker thread gathers
tiles from all concurrent requests into shared batches (up to ``max_batch``,
with a short ``linger_ms`` wait for stragglers), pads to a multiple-of-8
bucket ladder (``bucket_granule``) so only a bounded set of program shapes
ever compiles while pad waste stays under 7 slots/batch, runs the fused
uint8->uint8 tile step, and resolves each tile's Future.  Results are
bit-identical to unbatched serving (the tile step is batch-independent);
``serve.ModelService`` uses it by default and exposes the occupancy counters
at ``GET /stats``.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import queue
import threading
import time
from typing import Callable, Optional

import numpy as np

_CLOSE = object()


@dataclasses.dataclass
class _Item:
    tile: np.ndarray
    future: cf.Future


class TileBatcher:
    """Coalesces uint8 tiles submitted from many threads into shared device
    batches executed by one worker thread.

    Args:
      step: the fused device step from ``infer.tiling.make_tile_step`` —
        ``(B, insize, insize, insize) uint8 -> (B, out, out, out) uint8``.
        Called with numpy batches; per-batch-shape jit compilation is the
        step's own business (bucketing below bounds the shape count).
      insize: expected tile side, or None to accept any (callers such as
        ``predict_tiled`` validate their plan against it when set).
      max_batch: device batch ceiling (128 is the measured v5e sweet spot).
      linger_ms: after the first tile of a batch arrives, wait at most this
        long for more before dispatching.  5 ms default — well under the
        ~28 ms per-dispatch latency it saves, invisible next to a request's
        fetch time.
      min_bucket / bucket_granule / multiple: batches are zero-padded up
        to ``max(min_bucket, round_up(k, bucket_granule))`` (clamped to
        ``max_batch``) rounded to a multiple of ``multiple`` (the mesh's
        data-axis size when sharded), so at most
        ``ceil(max_batch / bucket_granule)`` program shapes ever compile.
        Granule 8 (vs the round-1..3 power-of-two ladder) bounds the
        zero-pad waste at 7 slots/batch where pow2 wasted up to ~50%:
        pad slots cost real H2D bytes AND device FLOPs — the round-4
        model-service soak measured 57% occupancy (5.68 MB shipped per
        3.24 MB-of-real-tiles request) under pow2 buckets.
    """

    def __init__(self, step: Callable, *, insize: Optional[int] = None,
                 max_batch: int = 128, linger_ms: float = 5.0,
                 min_bucket: int = 8, bucket_granule: int = 8,
                 multiple: int = 1,
                 outdimsize: Optional[int] = None,
                 buffer: Optional[int] = None,
                 meanstd_x=None, meanstd_y=None, params=None):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1 (got {max_batch})")
        self._step = step
        self.insize = insize
        # Effective (post multiple-of-6 fold) plan geometry, when known.
        # insize alone cannot validate a caller's plan: e.g. (outdimsize 34,
        # buffer 20) folds to 30+2*22 = 74 = the (40, 17) -> 36+2*19 insize,
        # but its step emits 30^3 tiles that would mis-stitch a 36^3 plan.
        self.outdimsize = outdimsize
        self.buffer = buffer
        # Normalization the baked-in step applies, when known — lets
        # predict_tiled reject a request whose meanstd does not match the
        # batcher's (a geometric match alone would silently mis-normalize).
        self.meanstd_x = (tuple(float(v) for v in meanstd_x)
                          if meanstd_x is not None else None)
        self.meanstd_y = (tuple(float(v) for v in meanstd_y)
                          if meanstd_y is not None else None)
        # The params the step bakes in, when known: geometry + meanstd alone
        # cannot catch a wrong-MODEL batcher (two meanstd-less models with
        # the same plan) — predict_tiled checks the caller's params against
        # these (object identity fast path, then the structural fingerprint
        # in tiling._params_equivalent).  Same object the step closure
        # already holds, so this retains nothing extra.
        self.params = params
        self.max_batch = int(max_batch)
        self._linger = float(linger_ms) / 1000.0
        self._min_bucket = max(1, int(min_bucket))
        self._granule = max(1, int(bucket_granule))
        self._multiple = max(1, int(multiple))
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        self._stats = {"batches": 0, "tiles": 0, "padded": 0, "largest": 0,
                       "errors": 0}
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="TileBatcher")
        self._thread.start()

    # -- client side -------------------------------------------------------

    def submit(self, tile_u8: np.ndarray) -> cf.Future:
        """Queue one uint8 tile; the Future resolves to its predicted
        (trimmed, uint8, zyx) output tile.  Raises RuntimeError once the
        batcher is closed (callers fall back to :meth:`run_direct`)."""
        tile = np.asarray(tile_u8, np.uint8)
        if self.insize is not None and tile.shape != (self.insize,) * 3:
            raise ValueError(
                f"tile shape {tile.shape} != expected "
                f"{(self.insize,) * 3} — this batcher was built for a "
                "different tile plan (outdimsize/buffer)")
        fut: cf.Future = cf.Future()
        # The closed-check and the put share the lock close() takes to set
        # _closed and enqueue the sentinel, so no tile can ever land AFTER
        # the sentinel (a tile behind a dead worker would hang its caller).
        with self._lock:
            if self._closed:
                raise RuntimeError("TileBatcher is closed")
            self._q.put(_Item(tile, fut))
        return fut

    def run_direct(self, tile_u8: np.ndarray) -> np.ndarray:
        """Run ONE tile synchronously on the caller's thread, bypassing the
        queue.  Works after close() — the graceful-degradation path when
        this batcher was closed under an in-flight request (model-cache
        eviction, service shutdown); uses the same bucket shapes so no new
        program compiles."""
        tile = np.asarray(tile_u8, np.uint8)
        bucket = self._bucket(1)
        arr = np.zeros((bucket,) + tile.shape, np.uint8)
        arr[0] = tile
        return np.asarray(self._step(arr))[0]

    def stats(self) -> dict:
        """Counters: batches run, tiles served, zero-pad slots, largest
        batch, and occupancy = tiles / (tiles + padded)."""
        with self._lock:
            s = dict(self._stats)
        total = s["tiles"] + s["padded"]
        s["occupancy"] = (s["tiles"] / total) if total else 1.0
        return s

    def close(self, wait: bool = True):
        """Stop the worker.  Idempotent and safe from any thread: pending
        tiles still resolve, submits after close raise (callers degrade to
        :meth:`run_direct`).  ``wait=False`` returns immediately and lets
        the daemon worker drain in the background (the model-cache eviction
        path, which must not stall the evicting request)."""
        with self._lock:
            if not self._closed:
                self._closed = True
                self._q.put(_CLOSE)
        # Join OUTSIDE the lock: the worker needs it for stats updates, so
        # joining under it would deadlock the drain until the timeout.
        if wait:
            self._thread.join(timeout=30)

    # -- worker side -------------------------------------------------------

    def _bucket(self, k: int) -> int:
        b = max(self._min_bucket, -(-k // self._granule) * self._granule)
        b = min(max(b, k), max(self.max_batch, k))
        return -(-b // self._multiple) * self._multiple

    def _gather(self, first: _Item):
        """First tile in hand: wait up to linger for more, then take
        whatever else is already queued, up to max_batch."""
        batch = [first]
        deadline = time.monotonic() + self._linger
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                if remaining > 0:
                    item = self._q.get(timeout=remaining)
                else:
                    item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is _CLOSE:
                self._q.put(_CLOSE)  # re-deliver to the outer loop
                break
            batch.append(item)
        return batch

    def _run(self, batch):
        # Group by shape (insize=None accepts mixed tile plans); zero-pad
        # each group to its bucket so only a few program shapes compile.
        groups: dict = {}
        for item in batch:
            groups.setdefault(item.tile.shape, []).append(item)
        for shape, grp in groups.items():
            # Claim each future first: a caller that cancel()ed its pending
            # future drops out here, and set_result below can no longer
            # raise InvalidStateError (which would kill the worker).
            grp = [it for it in grp
                   if it.future.set_running_or_notify_cancel()]
            if not grp:
                continue
            k = len(grp)
            # The WHOLE assembly+step is guarded: np.zeros can MemoryError
            # just as the step can fail, and an unresolved future hangs its
            # caller's drain — failures must reach the futures, always.
            try:
                bucket = self._bucket(k)
                arr = np.zeros((bucket,) + shape, np.uint8)
                for i, item in enumerate(grp):
                    arr[i] = item.tile
                pred = np.asarray(self._step(arr))
            except BaseException as e:  # noqa: BLE001 — must not hang callers
                for item in grp:
                    item.future.set_exception(e)
                with self._lock:
                    self._stats["errors"] += 1
                continue
            for i, item in enumerate(grp):
                item.future.set_result(pred[i])
            with self._lock:
                self._stats["batches"] += 1
                self._stats["tiles"] += k
                self._stats["padded"] += bucket - k
                self._stats["largest"] = max(self._stats["largest"], k)

    def _worker(self):
        while True:
            item = self._q.get()
            if item is _CLOSE:
                return
            batch = self._gather(item)
            try:
                self._run(batch)
            except BaseException as e:  # noqa: BLE001 — worker must survive
                # _run already routes per-group failures to the futures;
                # this guards anything outside those try blocks so the
                # worker never dies silently (a dead worker hangs every
                # later submit).  Fail whatever futures are still pending.
                for it in batch:
                    if it is not _CLOSE and not it.future.done():
                        try:
                            it.future.set_exception(e)
                        except Exception:  # already claimed/cancelled
                            pass
                with self._lock:
                    self._stats["errors"] += 1


def make_tile_batcher(gen_apply: Callable, params, meanstd_x, meanstd_y,
                      outdimsize: int, buffer: int, *, mesh=None,
                      sharding=None, max_batch: Optional[int] = None,
                      linger_ms: float = 5.0,
                      min_bucket: int = 8,
                      bucket_granule: int = 8) -> TileBatcher:
    """Build a TileBatcher around one model's fused tile step.

    Takes the same (outdimsize, buffer) the model's meta.json records
    (reference utils.py:158-166); the multiple-of-6 trim / tpad fold
    (reference utils.py:70-75) is applied here exactly as ``plan_tiles``
    applies it, so the batcher serves any ``predict_tiled`` request for this
    model.  ``mesh``: shard every batch over the mesh's 'data' axis
    (bucket sizes round up to the axis size).  ``max_batch=None``: width-
    aware default — 128 at the reference's wf=8 widths, scaled down for
    full-width models whose activations would OOM at 128
    (``tiling.default_batch_size``).
    """
    from jax import numpy as jnp

    from ..shapes import tile_plan_outdimsize
    from .tiling import data_sharding, default_batch_size, make_tile_step

    if max_batch is None:
        max_batch = default_batch_size(params)

    multiple = 1
    if mesh is not None:
        if sharding is not None:
            raise ValueError("pass either mesh= or sharding=, not both")
        sharding = data_sharding(mesh)
        multiple = int(mesh.shape["data"])
    eff_out, eff_buf, tpad = tile_plan_outdimsize(outdimsize, buffer)
    step = make_tile_step(gen_apply, params, meanstd_x, meanstd_y, tpad,
                          sharding)
    dev_step = lambda arr: step(jnp.asarray(arr))
    return TileBatcher(dev_step, insize=eff_out + 2 * eff_buf,
                       max_batch=max_batch, linger_ms=linger_ms,
                       min_bucket=min_bucket, bucket_granule=bucket_granule,
                       multiple=multiple,
                       outdimsize=eff_out, buffer=eff_buf,
                       meanstd_x=meanstd_x, meanstd_y=meanstd_y,
                       params=params)
