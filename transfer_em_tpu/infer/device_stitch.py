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
with the same tile count/shape.  The batch axis shards over the mesh's data
axis for multi-chip fan-out.

Used by bench configs (3) and (5); equality with the host path is asserted
in tests/test_device_stitch.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normalize import postprocess_to_u8, preprocess_u8
from .tiling import plan_tiles


def _gather_tile(vol: jax.Array, corner_zyx: jax.Array, insize: int) -> jax.Array:
    """Dynamic-slice one tile; corners may be negative / OOB (zero fill).

    jax clamps dynamic_slice start indices into range, which would shift the
    tile; instead slice from a zero-padded volume with offset corners.
    (The caller pads once — see device_predict_tiled.)
    """
    return jax.lax.dynamic_slice(vol, corner_zyx, (insize,) * 3)


def device_predict_tiled(
        vol_zyx: np.ndarray | jax.Array,
        gen_apply: Callable, params,
        start: Tuple[int, int, int], size: Tuple[int, int, int],
        outdimsize: int, buffer: int,
        meanstd_x, meanstd_y,
        batch_size: int = 8,
        donate_volume: bool = False) -> np.ndarray:
    """Tiled inference over a device-resident uint8 zyx volume.

    Args/semantics match infer.tiling.predict_tiled with an in-memory source:
    OOB halos read zeros.  Returns the stitched zyx uint8 block of ``size``.
    """
    plan = plan_tiles(start, size, outdimsize, buffer)
    insize = plan.insize
    halo = plan.buffer

    # Pad by the halo so every corner index is in range after offsetting;
    # this reproduces gather_blocks' zero-fill OOB semantics for tiles that
    # poke outside the volume.
    pad = insize  # generous: corner can be at most `buffer` outside + tile
    vol = jnp.pad(jnp.asarray(vol_zyx, jnp.uint8),
                  [(pad, pad)] * 3)

    # corners (xyz, absolute) -> padded-volume zyx offsets
    corners = np.asarray(plan.corners, np.int64)  # (T, 3) xyz
    corners_zyx = corners[:, ::-1] + pad
    indices = np.asarray(plan.indices, np.int64)  # (T, 3) xyz output offsets
    indices_zyx = indices[:, ::-1]

    T = plan.num_tiles
    B = min(batch_size, T)
    nb = (T + B - 1) // B
    # pad the tile list to a whole number of batches (repeat last tile; its
    # duplicate writes are idempotent)
    padn = nb * B - T
    if padn:
        corners_zyx = np.concatenate([corners_zyx,
                                      np.repeat(corners_zyx[-1:], padn, 0)])
        indices_zyx = np.concatenate([indices_zyx,
                                      np.repeat(indices_zyx[-1:], padn, 0)])
    corners_d = jnp.asarray(corners_zyx.reshape(nb, B, 3))
    indices_d = jnp.asarray(indices_zyx.reshape(nb, B, 3))

    out_shape = plan.padded_size
    tpad = plan.tpad
    odim = plan.outdimsize

    @jax.jit
    def run(vol, params, corners_d, indices_d):
        def step(out, batch):
            cz, iz = batch

            # Sequential dynamic_slices: a vmapped dynamic_slice lowers to a
            # scalar gather on TPU (measured 20x slower); a fori_loop of true
            # slices stays on the fast DMA path.
            def one(i, tiles):
                t = _gather_tile(vol, (cz[i, 0], cz[i, 1], cz[i, 2]), insize)
                return jax.lax.dynamic_update_slice(
                    tiles, t[None], (i, 0, 0, 0))

            tiles0 = jnp.zeros((B, insize, insize, insize), jnp.uint8)
            tiles = jax.lax.fori_loop(0, B, one, tiles0)   # (B, s, s, s) u8
            x = preprocess_u8(tiles, meanstd_x)            # (B, s, s, s, 1)
            y = gen_apply(params, x)
            if tpad > 0:
                y = y[:, tpad:-tpad, tpad:-tpad, tpad:-tpad, :]
            pred = postprocess_to_u8(y, meanstd_y)[..., 0]  # (B, o, o, o) u8

            def put(out, i):
                return jax.lax.dynamic_update_slice(
                    out, pred[i], (iz[i, 0], iz[i, 1], iz[i, 2]))

            out = jax.lax.fori_loop(0, B, lambda i, o: put(o, i), out)
            return out, None

        out0 = jnp.zeros(out_shape, jnp.uint8)
        out, _ = jax.lax.scan(step, out0, (corners_d, indices_d))
        return out

    out = run(vol, params, corners_d, indices_d)
    sx, sy, sz = size
    return np.asarray(out)[:sz, :sy, :sx]
