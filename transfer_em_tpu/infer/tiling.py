"""Tiled large-volume inference with VALID-conv overlap stitching.

Reproduces reference transfer_em/utils.py:41-130 ``predict_ng_cube`` with a
TPU-first execution model:

* same tile plan: output tile forced to a multiple of 6 (40 -> 36, trim
  ``tpad=2`` folded into the halo, buffer 17 -> 19; utils.py:70-75), ROI
  corners at tile-buffer, xyz index -> zyx C-order output buffer
  (utils.py:78-125);
* but the reference's serial ``model.predict`` python loop becomes a jitted
  **batched** map: tiles are batched to a static shape, uint8 in / uint8 out
  (pre/post scaling fused on device, 1 byte/voxel each way), and the batch
  axis shards over the mesh's data axis for multi-chip fan-out.  Remaining
  host work is a memcpy scatter (C++ fast path in native/, numpy fallback).

Stitching is seam-free by construction (VALID convs); verified in
tests/test_tiling.py by predicting a block whole vs tiled.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import functools
import math
import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normalize import postprocess_to_u8, preprocess_u8
from ..shapes import tile_plan_outdimsize


class InferenceCancelled(RuntimeError):
    """Raised by predict_tiled when its ``should_cancel`` callback fires
    (client disconnect / request timeout in the serving layer)."""


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static description of one tiled-inference run."""

    start: Tuple[int, int, int]        # requested xyz start
    size: Tuple[int, int, int]         # requested xyz size
    outdimsize: int                    # effective output tile (multiple of 6)
    buffer: int                        # effective halo (incl. folded tpad)
    tpad: int                          # extra trim per face on model output
    corners: Tuple[Tuple[int, int, int], ...]   # fetch corners (xyz, -buffer)
    indices: Tuple[Tuple[int, int, int], ...]   # output offsets (xyz)
    padded_size: Tuple[int, int, int]  # zyx padded output-buffer shape

    @property
    def insize(self) -> int:
        return self.outdimsize + 2 * self.buffer

    @property
    def num_tiles(self) -> int:
        return len(self.corners)


def plan_tiles(start: Sequence[int], size: Sequence[int], outdimsize: int,
               buffer: int) -> TilePlan:
    """Chunk an xyz request into overlapping tiles (reference utils.py:68-104)."""
    outdimsize, buffer, tpad = tile_plan_outdimsize(outdimsize, buffer)
    corners: List[Tuple[int, int, int]] = []
    indices: List[Tuple[int, int, int]] = []
    for x in range(start[0], start[0] + size[0], outdimsize):
        for y in range(start[1], start[1] + size[1], outdimsize):
            for z in range(start[2], start[2] + size[2], outdimsize):
                corners.append((x - buffer, y - buffer, z - buffer))
                indices.append((x - start[0], y - start[1], z - start[2]))
    padded = []
    for s in size:
        extra = (outdimsize - s % outdimsize) % outdimsize
        padded.append(s + extra)
    padded_zyx = (padded[2], padded[1], padded[0])
    return TilePlan(start=tuple(start), size=tuple(size),
                    outdimsize=outdimsize, buffer=buffer, tpad=tpad,
                    corners=tuple(corners), indices=tuple(indices),
                    padded_size=padded_zyx)


def data_sharding(mesh):
    """NamedSharding over the mesh's 'data' axis for tile batches.

    The host-streaming serving surface takes a Mesh (predict_tiled(mesh=),
    predict_ng_cube(mesh=), ModelService(mesh=)) and fans each tile batch
    out data-parallel — the multi-chip path for requests whose source does
    NOT fit in HBM (HBM-resident volumes use predict_volume(mesh=))."""
    from jax.sharding import NamedSharding, PartitionSpec

    if "data" not in mesh.shape:
        raise ValueError(
            f"tiled inference needs a mesh with a 'data' axis (got axes "
            f"{tuple(mesh.shape)}); for spatially-sharded inference use "
            "parallel.halo_predict")
    return NamedSharding(mesh, PartitionSpec("data"))


@functools.lru_cache(maxsize=64)
def _tile_step_jit(gen_apply: Callable, meanstd_x, meanstd_y, tpad: int,
                   sharding):
    """Module-level jitted step cache (CLAUDE.md: a jax.jit on a per-call
    closure re-traces every call and pays remote compile-cache lookups).
    params is an ARGUMENT so one compiled program serves repeated serving
    requests; keyed on the identity of ``gen_apply`` — callers must pass a
    stable callable, not a fresh lambda per request."""

    def step(params, tiles_u8: jax.Array) -> jax.Array:
        x = preprocess_u8(tiles_u8, meanstd_x)
        y = gen_apply(params, x)
        if tpad > 0:
            nd = y.ndim - 2
            sl = (slice(None),) + (slice(tpad, -tpad),) * nd + (slice(None),)
            y = y[sl]
        return postprocess_to_u8(y, meanstd_y)[..., 0]

    if sharding is not None:
        return jax.jit(step, in_shardings=(None, sharding),
                       out_shardings=sharding)
    return jax.jit(step)


def make_tile_step(gen_apply: Callable, params, meanstd_x, meanstd_y,
                   tpad: int, sharding=None):
    """Jitted fused step: uint8 tile batch -> uint8 prediction batch.

    (B, s, s, s) u8 -> preprocess (scale+standardize, fused affine) ->
    generator -> unstandardize/rescale/round -> trim tpad.  With ``sharding``
    (a NamedSharding over the data axis) the batch fans out across chips.
    """
    ms = lambda v: tuple(map(float, v)) if v is not None else None
    jitted = _tile_step_jit(gen_apply, ms(meanstd_x), ms(meanstd_y),
                            int(tpad), sharding)
    return functools.partial(jitted, params)


def scatter_tiles(out_zyx: np.ndarray, tiles_u8: np.ndarray,
                  indices: Sequence[Tuple[int, int, int]], outdimsize: int):
    """Write predicted tiles (zyx each) into the zyx output buffer at xyz
    indices (reference utils.py:121-125).  Numpy fallback; native/ provides a
    threaded C++ memcpy version for large volumes."""
    from ..native import scatter_blocks
    scatter_blocks(out_zyx, tiles_u8, indices, outdimsize)


def default_batch_size(params, ceiling: int = 128, floor: int = 8) -> int:
    """Width-aware device batch size.

    B=128 is the measured device sweet spot at the reference's default
    widths (wf=8, widest conv 32 channels — PERF.md "Inference"), but
    per-tile activation memory scales ~linearly with channel count, and a
    straight B=128 on a full-width (wf=1, widest 256) model OOMs the chip
    — which on a remotely-attached TPU can also wedge the tunnel for tens
    of minutes (CLAUDE.md).  Scale the ceiling by 32/widest-kernel-output
    and round down to a multiple of 8 (the batcher's bucket granule):
    wf=8 -> 128, wf=4 -> 64, wf=2 -> 32, wf=1 -> 16 (B=16 measured best
    AND safe at wf=1, bench_infer --wf1).  Unrecognizable params fall back
    to the ceiling."""
    try:
        widest = max((int(l.shape[-1]) for l in jax.tree.leaves(params)
                      if hasattr(l, "shape") and len(l.shape) >= 4),
                     default=0)
    except Exception:
        widest = 0
    if widest <= 0:
        return ceiling
    b = (ceiling * 32 // max(widest, 1)) // 8 * 8
    return max(floor, min(ceiling, b))


@functools.lru_cache(maxsize=8)
def _fingerprint_fn(n_leaves):
    """One jitted program gathering first-4 + last-4 elements of EVERY leaf
    into a single small array — one device dispatch + one fetch regardless
    of leaf count (eager per-leaf slicing would pay the ~28 ms tunnel
    round-trip per op, CLAUDE.md)."""
    del n_leaves  # cache key only: retrace per leaf count

    def fp(leaves):
        parts = []
        for l in leaves:
            f = jnp.ravel(l).astype(jnp.float32)
            parts.append(f[:4])
            parts.append(f[-4:])
        return jnp.concatenate(parts)

    return jax.jit(fp)


def _params_equivalent(a, b) -> bool:
    """Cheap structural fingerprint for two params pytrees of the SAME
    model: tree structure, every leaf's shape/dtype, and the exact first-4/
    last-4 elements of EVERY leaf must all match.  Catches a wrong-model
    batcher (different architecture => structure/shape mismatch; same
    architecture, different weights => per-layer samples differ — even a
    fine-tune with some frozen layers changes most leaves) without a
    full-tree fetch: the sample rides one jitted gather + one small fetch."""
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    if ta != tb or len(la) != len(lb):
        return False
    for x, y in zip(la, lb):
        if (tuple(jnp.shape(x)) != tuple(jnp.shape(y))
                or jnp.asarray(x).dtype != jnp.asarray(y).dtype):
            return False
    if not la:
        return True
    fp = _fingerprint_fn(len(la))
    return bool(np.array_equal(np.asarray(fp(tuple(la))),
                               np.asarray(fp(tuple(lb)))))


def predict_tiled(
        fetch_tile: Callable[[Tuple[int, int, int], int], np.ndarray],
        gen_apply: Callable, params,
        start: Sequence[int], size: Sequence[int],
        outdimsize: int, buffer: int,
        meanstd_x, meanstd_y,
        batch_size: int = 8,
        fetch_input: bool = False,
        sharding=None,
        fetch_threads: int = 8,
        mesh=None,
        batcher=None,
        out: Optional[np.ndarray] = None,
        should_cancel: Optional[Callable[[], bool]] = None,
) -> np.ndarray | Tuple[np.ndarray, np.ndarray]:
    """Full tiled inference: fetch -> batched jitted predict -> stitch -> crop.

    Args:
      fetch_tile: (corner_xyz, insize) -> uint8 cube (the data source).
      gen_apply: generator forward (params, float batch) -> float batch.
      batch_size: tiles per device step (reference ran batch=1 serially).
      mesh: optional Mesh with a 'data' axis — each tile batch is sharded
        across it (batch_size is rounded up to a multiple of the axis size).
        ``sharding`` accepts a prebuilt NamedSharding instead.
      batcher: optional ``infer.batcher.TileBatcher`` — tiles are submitted
        to it as they are fetched and may share device batches with OTHER
        concurrent requests against the same model (the serving fast path;
        results are bit-identical).  The batcher carries its own step,
        sharding, and batch sizing, so gen_apply/params/mesh/batch_size are
        unused for compute.
      out: optional preallocated zyx uint8 output of ``size`` (e.g. a
        np.memmap, so gigavoxel requests through the host-tiles route are
        host-RAM-bounded like infer.stream's); tiles are scattered straight
        into it with edge clipping — no padded intermediate buffer.
      should_cancel: optional zero-arg callable; when it returns True the
        run stops and raises ``InferenceCancelled`` (the serving layer's
        client-disconnect / request-timeout hook — no point finishing a
        chunk nobody will read).  Polled per fetched tile, immediately
        before each device dispatch, and — on the batcher path — every
        0.2 s while awaiting shared-batch futures, so cancellation fires
        mid-compute even for small requests whose tiles all fit one batch
        (e.g. the 8-tile 64-cube serving shape).  Granularity: a device
        batch already dispatched is not preempted (its result is
        discarded), but the caller unblocks without waiting for it.
    Returns:
      the prediction as a zyx uint8 array of ``size`` (``out`` if given);
      with ``fetch_input=True``, the tuple ``(input, prediction)`` — input
      FIRST (both zyx uint8).
    """
    from ..data.sources import _parallel_fetch

    if mesh is not None:
        if sharding is not None:
            raise ValueError("pass either mesh= or sharding=, not both")
        sharding = data_sharding(mesh)
        ndev = int(mesh.shape["data"])
        batch_size = -(-batch_size // ndev) * ndev

    plan = plan_tiles(start, size, outdimsize, buffer)
    # Small requests must not pay full-batch padding: an 8-tile 64-cube
    # request at the default batch_size=128 would ship 16x its tiles in
    # zero pad slots (H2D bytes AND device FLOPs).  Clamp to the tile
    # count rounded up to a granule-8 ladder (bounded program shapes, same
    # rule as TileBatcher), re-rounded to the mesh data axis when sharded.
    n_tiles = len(plan.corners)
    ladder = n_tiles if n_tiles <= 8 else -(-n_tiles // 8) * 8
    clamped = min(batch_size, ladder)
    if mesh is not None:
        clamped = -(-clamped // ndev) * ndev
    batch_size = max(1, clamped)
    if out is not None:
        want = (size[2], size[1], size[0])  # zyx
        if tuple(out.shape) != want:
            raise ValueError(f"out shape {out.shape} != request zyx {want}")
        if out.dtype != np.uint8 or not out.flags.c_contiguous:
            raise ValueError("out must be C-contiguous uint8")
    if batcher is not None:
        for attr, planned in (("insize", plan.insize),
                              ("outdimsize", plan.outdimsize),
                              ("buffer", plan.buffer)):
            built = getattr(batcher, attr, None)
            if built is not None and built != planned:
                raise ValueError(
                    f"batcher was built for {attr}={built}, this request "
                    f"plans {planned} — outdimsize/buffer mismatch")
        # Geometry alone cannot catch a wrong-model/wrong-dataset batcher:
        # compare the normalization the batcher's baked-in step applies
        # against the caller's, or the run succeeds with silently
        # mis-normalized voxels.
        for attr, asked in (("meanstd_x", meanstd_x), ("meanstd_y", meanstd_y)):
            built = getattr(batcher, attr, None)
            if built is None or asked is None:
                continue
            asked_t = tuple(float(v) for v in asked)
            if any(not math.isclose(b, a, rel_tol=1e-9, abs_tol=1e-12)
                   for b, a in zip(built, asked_t)):
                raise ValueError(
                    f"batcher was built for {attr}={built}, this request "
                    f"passes {asked_t} — it would be served with the "
                    "batcher's normalization; build a batcher for this "
                    "model/meanstd or drop the batcher")
        # meanstd can be None on BOTH sides (normalization-disabled models):
        # the baked params are the check geometry+meanstd cannot make.
        # make_tile_batcher records the exact object its step closed over;
        # same object => fast-path OK.  A DIFFERENT object is not
        # necessarily a different model (a checkpoint reloaded/device_put/
        # tree-mapped copy is structurally identical — ADVICE round 4), so
        # fall back to a cheap structural fingerprint before rejecting.
        built_params = getattr(batcher, "params", None)
        if (built_params is not None and params is not None
                and built_params is not params
                and not _params_equivalent(built_params, params)):
            raise ValueError(
                "batcher was built over DIFFERENT params than this "
                "request's (tree structure, leaf shapes/dtypes, or sampled "
                "values differ) — its baked-in step would serve the other "
                "model's predictions; build a batcher for these params or "
                "drop the batcher")
        return _predict_tiled_batched(batcher, fetch_tile, plan,
                                      fetch_input, fetch_threads, out=out,
                                      should_cancel=should_cancel)
    step = make_tile_step(gen_apply, params, meanstd_x, meanstd_y, plan.tpad,
                          sharding)

    user_out = out is not None
    if out is None:
        out = np.zeros(plan.padded_size, np.uint8)
    in_out = np.zeros(plan.padded_size, np.uint8) if fetch_input else None

    def fetch(corner):
        return fetch_tile(corner, plan.insize)

    # Bounded sliding-window fetch (2*threads in flight): Executor.map would
    # submit ALL tiles up front and buffer them in host RAM — toward the
    # whole haloed input volume for gigavoxel requests.
    fetched = _parallel_fetch(iter(plan.corners), fetch, fetch_threads)
    batch_tiles: List[np.ndarray] = []
    batch_idx: List[Tuple[int, int, int]] = []

    def flush():
        if not batch_tiles:
            return
        # Last poll before committing a device dispatch: for small requests
        # (one batch) this is the only cancellation point after fetch.
        if should_cancel is not None and should_cancel():
            raise InferenceCancelled("tiled inference cancelled")
        k = len(batch_tiles)
        arr = np.stack(batch_tiles)
        if k < batch_size:  # pad to static shape for jit
            pad = np.zeros((batch_size - k,) + arr.shape[1:], np.uint8)
            arr = np.concatenate([arr, pad])
        pred = np.asarray(step(jnp.asarray(arr)))[:k]
        scatter_tiles(out, pred, batch_idx, plan.outdimsize)
        if fetch_input:
            b = plan.buffer  # tpad is already folded into the buffer geometry
            lo, hi = b, b + plan.outdimsize
            ins = arr[:k, lo:hi, lo:hi, lo:hi]
            scatter_tiles(in_out, ins, batch_idx, plan.outdimsize)
        batch_tiles.clear()
        batch_idx.clear()

    for tile, idx in zip(fetched, plan.indices):
        if should_cancel is not None and should_cancel():
            raise InferenceCancelled("tiled inference cancelled")
        batch_tiles.append(np.asarray(tile, np.uint8))
        batch_idx.append(idx)
        if len(batch_tiles) == batch_size:
            flush()
    flush()

    sx, sy, sz = size
    # user-supplied out is exact-size; scatter_tiles clipped the overhang
    res = out if user_out else out[:sz, :sy, :sx]
    if fetch_input:
        return in_out[:sz, :sy, :sx], res
    return res


def _predict_tiled_batched(batcher, fetch_tile, plan: TilePlan,
                           fetch_input: bool, fetch_threads: int,
                           out: Optional[np.ndarray] = None,
                           should_cancel: Optional[Callable[[], bool]]
                           = None):
    """predict_tiled's compute loop when a shared TileBatcher owns the
    device: submit tiles as they are fetched, scatter as futures resolve.
    In-flight tiles are capped at 4 batches' worth so a slow device bounds
    host RAM the same way the unbatched path's flush() does."""
    from collections import deque

    from ..data.sources import _parallel_fetch

    user_out = out is not None
    if out is None:
        out = np.zeros(plan.padded_size, np.uint8)
    in_out = np.zeros(plan.padded_size, np.uint8) if fetch_input else None
    lo, hi = plan.buffer, plan.buffer + plan.outdimsize

    pending: deque = deque()

    def drain(n):
        for _ in range(n):
            fut, idx, tin = pending.popleft()
            # Bounded wait: the batcher guarantees its futures resolve, but
            # a hang here would wedge the serving thread forever — surface
            # a TimeoutError instead (600 s >> any compile + batch).  While
            # waiting, poll should_cancel every 0.2 s: for the canonical
            # 64-cube request all 8 tiles are submitted in milliseconds and
            # the request then lives HERE for the whole device compute — a
            # client hangup or deadline must unblock this thread (and free
            # its admission slot) without waiting for the batch.
            if should_cancel is None:
                pred = fut.result(timeout=600)
            else:
                t0 = time.monotonic()
                while True:
                    try:
                        pred = fut.result(timeout=0.2)
                        break
                    except cf.TimeoutError:
                        if should_cancel():
                            raise InferenceCancelled(
                                "tiled inference cancelled")
                        if time.monotonic() - t0 > 600:
                            raise
            scatter_tiles(out, pred[None], [idx], plan.outdimsize)
            if fetch_input:
                scatter_tiles(in_out, tin[None], [idx], plan.outdimsize)

    fetched = _parallel_fetch(iter(plan.corners),
                              lambda c: fetch_tile(c, plan.insize),
                              fetch_threads)
    cap = 4 * batcher.max_batch
    for tile, idx in zip(fetched, plan.indices):
        if should_cancel is not None and should_cancel():
            raise InferenceCancelled("tiled inference cancelled")
        t = np.asarray(tile, np.uint8)
        # .copy(): a view would pin the whole insize^3 tile in `pending`
        # (up to cap of them), ~8x the RAM the docstring's bound promises.
        tin = t[lo:hi, lo:hi, lo:hi].copy() if fetch_input else None
        try:
            fut = batcher.submit(t)
        except RuntimeError:
            # Batcher closed under us (model-cache eviction or service
            # shutdown mid-request): degrade gracefully — run this tile
            # synchronously on our own thread and keep going.
            fut = cf.Future()
            fut.set_result(batcher.run_direct(t))
        pending.append((fut, idx, tin))
        if len(pending) > cap:
            drain(len(pending) - cap)
    drain(len(pending))

    sx, sy, sz = plan.size
    res = out if user_out else out[:sz, :sy, :sx]
    if fetch_input:
        return in_out[:sz, :sy, :sx], res
    return res


def predict_ng_cube(location: str, start, size, model, meanstd_x, meanstd_y,
                    cloudrun: Optional[str] = None, fetch_input: bool = False,
                    outdimsize: Optional[int] = None,
                    buffer: Optional[int] = None,
                    batch_size: int = 8, mesh=None, batcher=None,
                    out: Optional[np.ndarray] = None):
    """API-parity tiled inference from ng-precomputed (reference utils.py:41).

    ``model``: an EM2EM instance (uses generator G) or a (gen_apply, params)
    pair with explicit outdimsize/buffer.  ``mesh``: fan tile batches out
    data-parallel over a Mesh 'data' axis (see predict_tiled).  ``batcher``:
    share device batches with concurrent requests (see predict_tiled).
    ``out``: preallocated zyx uint8 output, e.g. np.memmap (see
    predict_tiled).
    """
    from ..data.sources import CloudRunFetcher, open_tensorstore

    if hasattr(model, "outdimsize"):
        outdimsize = outdimsize if outdimsize is not None else model.outdimsize
        buffer = buffer if buffer is not None else model.buffer
        gen_apply = model.gen.apply  # stable bound method keys the jit cache
        params = model.state.gg
    else:
        gen_apply, params = model
        assert outdimsize is not None and buffer is not None

    if cloudrun is None:
        ds = open_tensorstore(location)
        dom_lo = np.asarray(ds.domain.inclusive_min[:3], np.int64)
        dom_hi = np.asarray(ds.domain.exclusive_max[:3], np.int64)

        def fetch_tile(corner, insize):
            # Clamp to the volume domain and zero-fill the rest: every
            # edge-touching request plans halo corners at start-buffer
            # (negative / past the far face).  ONE shared implementation
            # with serve/backends.TensorstoreVolume — an edge-semantics
            # fix must not have to land twice (tiles are zyx throughout;
            # the reference mixes xyz tiles into a zyx buffer,
            # utils.py:121).
            from ..data.sources import read_ts_box_zyx
            return read_ts_box_zyx(ds, corner, (insize,) * 3,
                                   dom_lo, dom_hi)
    else:
        fetcher = CloudRunFetcher(cloudrun, location)

        def fetch_tile(corner, insize):
            return fetcher.fetch(corner, insize)

    return predict_tiled(fetch_tile, gen_apply, params, start, size,
                         outdimsize, buffer, meanstd_x, meanstd_y,
                         batch_size=batch_size, fetch_input=fetch_input,
                         mesh=mesh, batcher=batcher, out=out)
