"""Device-resident tiled inference: gather -> predict -> stitch in ONE jit.

The reference's large-volume path is: fetch tile on host -> predict ->
copy back -> numpy scatter, serially (utils.py:107-126).  infer/tiling.py
batches that; this module goes further for volumes that fit in HBM: the
source volume lives on device as uint8, and a single jitted ``lax.scan``

  1. dynamic-slices each (padded) input tile out of the volume,
  2. runs preprocess + generator + postprocess on the tile batch,
  3. dynamic-update-slices the uint8 result into the output volume,

so the host never touches a voxel between upload and download.  Tile
coordinates are a traced array — one compile serves any request geometry
with the same tile count/shape.  See also infer/slab.py for the whole-slab
variant (fewer, larger forwards).

TPU notes (PERF.md): a vmapped dynamic_slice lowers to a scalar gather
(measured 20x slower) — tiles are gathered with a fori_loop of true slices;
the jitted runner lives at module level with static geometry args so repeat
calls hit the trace cache.

Used by bench configs (3) and (5); equality with the host path is asserted
in tests/test_device_stitch.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normalize import postprocess_to_u8, preprocess_u8
from .tiling import plan_tiles


def device_predict_tiled(
        vol_zyx: np.ndarray | jax.Array,
        gen_apply: Callable, params,
        start: Tuple[int, int, int], size: Tuple[int, int, int],
        outdimsize: int, buffer: int,
        meanstd_x, meanstd_y,
        batch_size: int = 8,
        donate_volume: bool = False,
        as_numpy: bool = True,
        mesh=None,
        prepadded: bool = False):
    """Tiled inference over a device-resident uint8 zyx volume.

    Args/semantics match infer.tiling.predict_tiled with an in-memory source:
    OOB halos read zeros.  Returns the stitched zyx uint8 block of ``size``.
    A numpy ``vol_zyx`` is uploaded via ``jax.device_put``; pass a jax array
    to reuse an already-resident volume.  ``as_numpy=False`` skips the D2H
    copy and returns the device array.

    ``mesh``: a jax Mesh with a "data" axis — tile batches are sharded
    across it (data-parallel inference; volume and params replicated, the
    disjoint per-device partial outputs combined with an all-reduce max).
    This is the multi-chip scaling path for HBM-resident serving; the
    spatial alternative for volumes too large to replicate is
    parallel.halo_predict.

    NOTE (both single-device and mesh paths): the compiled program is cached
    on the IDENTITY of ``gen_apply`` — pass a stable callable held by the
    caller, not a fresh ``lambda p, x: ...`` per request, or every call
    re-traces and pays the remote-compile round trip (CLAUDE.md).
    """
    del donate_volume  # reserved
    plan = plan_tiles(start, size, outdimsize, buffer)
    insize = plan.insize

    corners = np.asarray(plan.corners, np.int64)  # (T, 3) xyz
    corners_zyx0 = corners[:, ::-1]

    # Zero-pad exactly enough that every tile slice [corner, corner+insize)
    # is in range, reproducing gather_blocks' zero-fill OOB semantics —
    # computed from the actual corner extremes, NOT a fixed tile size, so
    # requests reaching arbitrarily far past the volume still read zeros
    # (lax.dynamic_slice CLAMPS out-of-range starts, which would silently
    # substitute shifted volume data).  Interior requests pad 0 and skip the
    # extra HBM copy entirely.  ``prepadded`` callers (infer/stream.py) fetch
    # blocks that already cover every corner read and guarantee in-range.
    if prepadded:
        pad = 0
    else:
        dims = np.asarray(vol_zyx.shape[:3], np.int64)
        need = int(max(0, -corners_zyx0.min(),
                       (corners_zyx0 + insize - dims).max()))
        # Round up to a multiple of insize: padded-volume SHAPES stay few, so
        # a serving fleet's requests against one volume reuse the compiled
        # program (remote compiles cost seconds here, CLAUDE.md) — ordinary
        # halo-past-the-edge requests all land on pad == insize, exactly the
        # pre-existing geometry.
        pad = -(-need // insize) * insize
    if isinstance(vol_zyx, jax.Array):
        vol = vol_zyx.astype(jnp.uint8)
    else:
        vol = jax.device_put(np.ascontiguousarray(vol_zyx, np.uint8))
    if pad:
        vol = _pad3(vol, pad=pad)

    corners_zyx = corners_zyx0 + pad
    indices_zyx = np.asarray(plan.indices, np.int64)[:, ::-1]

    T = plan.num_tiles
    B = min(batch_size, T)
    nb = (T + B - 1) // B
    if mesh is not None and "data" not in mesh.shape:
        raise ValueError(
            f"device_predict_tiled needs a mesh with a 'data' axis (got axes "
            f"{tuple(mesh.shape)}); for spatially-sharded inference use "
            "parallel.halo_predict")
    ndev = int(mesh.shape["data"]) if mesh is not None else 1
    nb = -(-nb // ndev) * ndev  # round batches up to the mesh data size
    padn = nb * B - T
    if padn:  # repeat last tile; duplicate writes are idempotent (max-combine)
        corners_zyx = np.concatenate([corners_zyx,
                                      np.repeat(corners_zyx[-1:], padn, 0)])
        indices_zyx = np.concatenate([indices_zyx,
                                      np.repeat(indices_zyx[-1:], padn, 0)])
    corners_d = jnp.asarray(corners_zyx.reshape(nb, B, 3))
    indices_d = jnp.asarray(indices_zyx.reshape(nb, B, 3))

    sx, sy, sz = size
    static = dict(gen_apply=gen_apply, insize=insize, tpad=plan.tpad,
                  batch=B, out_shape=plan.padded_size, crop=(sz, sy, sx),
                  meanstd_x=(tuple(float(v) for v in meanstd_x)
                             if meanstd_x is not None else None),
                  meanstd_y=(tuple(float(v) for v in meanstd_y)
                             if meanstd_y is not None else None))
    if mesh is None:
        out = _run(vol, params, corners_d, indices_d, **static)
    else:
        out = _dp_runner(mesh, **static)(vol, params, corners_d, indices_d)
    return np.asarray(out) if as_numpy else out


@functools.partial(jax.jit, static_argnames=("pad",))
def _pad3(vol, *, pad):
    return jnp.pad(vol, [(pad, pad)] * 3)


def _make_scan(gen_apply, insize, tpad, batch, out_shape, meanstd_x,
               meanstd_y):
    """(vol, params, corners, indices) -> uncropped stitched volume."""

    def scan_tiles(vol, params, corners_d, indices_d):
        def step(out, batch_args):
            cz, iz = batch_args

            # fori_loop of true dynamic_slices (vmap would lower to a gather)
            def one(i, tiles):
                t = jax.lax.dynamic_slice(
                    vol, (cz[i, 0], cz[i, 1], cz[i, 2]), (insize,) * 3)
                return jax.lax.dynamic_update_slice(tiles, t[None],
                                                    (i, 0, 0, 0))

            tiles0 = jnp.zeros((batch, insize, insize, insize), jnp.uint8)
            tiles = jax.lax.fori_loop(0, batch, one, tiles0)

            x = preprocess_u8(tiles, meanstd_x)
            y = gen_apply(params, x)
            if tpad > 0:
                y = y[:, tpad:-tpad, tpad:-tpad, tpad:-tpad, :]
            pred = postprocess_to_u8(y, meanstd_y)[..., 0]

            def put(i, out):
                return jax.lax.dynamic_update_slice(
                    out, pred[i], (iz[i, 0], iz[i, 1], iz[i, 2]))

            out = jax.lax.fori_loop(0, batch, put, out)
            return out, None

        out0 = jnp.zeros(out_shape, jnp.uint8)
        out, _ = jax.lax.scan(step, out0, (corners_d, indices_d))
        return out

    return scan_tiles


@functools.partial(
    jax.jit,
    static_argnames=("gen_apply", "insize", "tpad", "batch", "out_shape",
                     "crop", "meanstd_x", "meanstd_y"))
def _run(vol, params, corners_d, indices_d, *, gen_apply, insize, tpad,
         batch, out_shape, crop, meanstd_x, meanstd_y):
    out = _make_scan(gen_apply, insize, tpad, batch, out_shape,
                     meanstd_x, meanstd_y)(vol, params, corners_d, indices_d)
    sz, sy, sx = crop
    return out[:sz, :sy, :sx]


@functools.lru_cache(maxsize=32)
def _dp_runner(mesh, *, gen_apply, insize, tpad, batch, out_shape, crop,
               meanstd_x, meanstd_y):
    """Jitted data-parallel tile scan over ``mesh``'s "data" axis.

    Tile batches are sharded across devices; volume/params are replicated.
    Each device stitches its tiles into a local zero-initialized output, and
    the disjoint partials combine with an all-reduce max (idempotent, so the
    duplicated padding tiles are safe).  lru_cached so repeat serving calls
    with the same mesh/geometry reuse the compiled program (CLAUDE.md:
    jit-per-call re-traces).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.halo import shard_map  # single shard_map import point

    scan_tiles = _make_scan(gen_apply, insize, tpad, batch, out_shape,
                            meanstd_x, meanstd_y)

    def local(vol, params, corners_d, indices_d):
        out = scan_tiles(vol, params, corners_d, indices_d)
        return jax.lax.pmax(out, "data")

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(), P("data"), P("data")),
                        out_specs=P(), check_vma=False)

    def run(vol, params, corners_d, indices_d):
        out = sharded(vol, params, corners_d, indices_d)
        sz, sy, sx = crop
        return out[:sz, :sy, :sx]

    return jax.jit(run)
