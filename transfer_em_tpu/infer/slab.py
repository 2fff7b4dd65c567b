"""Slab inference: large-volume prediction without per-tile overhead.

The reference tiles big volumes into 74^3 inputs (utils.py:41-130) because
GPU memory forced it.  On TPU the generator is fully convolutional and HBM
is large, so a whole (74, Y, X) z-slab runs as ONE forward: for a 360^3
request that is 9 big convolution programs instead of 1000 tiny ones —
per-tile fixed costs vanish and XLA gets large spatial extents to tile.

VALID-conv arithmetic per axis (shapes.is_valid_dimsize generalizes the
74->40 default): the z input extent stays 74 (out 40), y/x take the smallest
valid extent covering the request + halo.  OOB halos read zeros, identical
to gather_blocks/tiled semantics; equality with predict_tiled is asserted in
tests/test_device_stitch.py.

Everything (pad, preprocess, generator, postprocess, stitch) runs in one jit
with a scan over z-chunks; uint8 in HBM, uint8 out.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normalize import postprocess_to_u8, preprocess_u8
from ..shapes import generator_shapes, is_valid_dimsize


def _next_valid(n: int) -> int:
    d = n
    while not is_valid_dimsize(d):
        d += 1
    return d


def slab_predict(vol_zyx: np.ndarray | jax.Array,
                 gen_apply: Callable, params,
                 start: Tuple[int, int, int], size: Tuple[int, int, int],
                 meanstd_x, meanstd_y,
                 z_in: int = 74, as_numpy: bool = True):
    """Predict an xyz ``start``/``size`` region of a zyx uint8 volume.

    Args:
      vol_zyx: source volume (uint8, zyx); OOB halo reads zeros.  A numpy
        array is uploaded with ``jax.device_put`` (measurably faster than
        tracing it as a jnp constant on remotely-attached chips); a jax
        array is used in place — upload once, predict many.
      start, size: xyz request (like predict_ng_cube / predict_tiled).
      z_in: input z extent per slab (a valid dimsize; 74 -> 40 out).
      as_numpy: if False, return the device array (skip the D2H copy; the
        result is exact-``size`` either way).
    Returns:
      zyx uint8 array of ``size``.
    """
    assert is_valid_dimsize(z_in), z_in
    shp = generator_shapes(z_in)
    z_out = shp.out
    buffer = shp.buffer

    sx, sy, sz = size
    x0, y0, z0 = start
    # y/x: one shot at the smallest valid extent covering size + 2*buffer
    y_in = _next_valid(sy + 2 * buffer)
    x_in = _next_valid(sx + 2 * buffer)
    y_out = y_in - 2 * buffer  # >= sy
    x_out = x_in - 2 * buffer
    nz = -(-sz // z_out)

    if isinstance(vol_zyx, jax.Array):
        vol = vol_zyx.astype(jnp.uint8)
    else:
        vol = jax.device_put(np.ascontiguousarray(vol_zyx, np.uint8))
    Z, Y, X = vol.shape
    # Pad so every slab read is in range (zeros outside the volume).
    z_lo = z0 - buffer
    y_lo = y0 - buffer
    x_lo = x0 - buffer
    z_hi = z_lo + nz * z_out + 2 * buffer
    y_hi = y_lo + y_in
    x_hi = x_lo + x_in
    pad_cfg = ((max(0, -z_lo), max(0, z_hi - Z)),
               (max(0, -y_lo), max(0, y_hi - Y)),
               (max(0, -x_lo), max(0, x_hi - X)))
    volp = jnp.pad(vol, pad_cfg)
    z_lo += pad_cfg[0][0]
    y_lo += pad_cfg[1][0]
    x_lo += pad_cfg[2][0]

    zs = jnp.asarray([z_lo + i * z_out for i in range(nz)], jnp.int32)
    origin = jnp.asarray([z_lo, y_lo, x_lo], jnp.int32)

    out = _run(volp, params, zs, origin, gen_apply=gen_apply,
               z_in=z_in, y_in=y_in, x_in=x_in, z_out=z_out,
               y_out=y_out, x_out=x_out, nz=nz, sz=sz, sy=sy, sx=sx,
               meanstd_x=(tuple(float(v) for v in meanstd_x)
                          if meanstd_x is not None else None),
               meanstd_y=(tuple(float(v) for v in meanstd_y)
                          if meanstd_y is not None else None))
    return np.asarray(out) if as_numpy else out


@functools.partial(
    jax.jit,
    static_argnames=("gen_apply", "z_in", "y_in",
                     "x_in", "z_out", "y_out", "x_out", "nz", "sz", "sy",
                     "sx", "meanstd_x", "meanstd_y"))
def _run(volp, params, zs, origin, *, gen_apply, z_in, y_in, x_in,
         z_out, y_out, x_out, nz, sz, sy, sx, meanstd_x, meanstd_y):
    # Module-level jit: repeated slab_predict calls with the same geometry
    # and the same gen_apply object hit the trace cache (an inner closure
    # would re-trace and pay remote-compile-cache lookups every call).
    # The request ORIGIN rides as a traced int32 triple — it only feeds
    # dynamic_slice starts and index math, and making it static would
    # recompile the whole slab scan for every distinct start in a
    # predict loop (5-10 s minimum per remote compile, CLAUDE.md).
    z_lo, y_lo, x_lo = origin[0], origin[1], origin[2]

    def step(out, zstart):
        slab = jax.lax.dynamic_slice(
            volp, (zstart, y_lo, x_lo), (z_in, y_in, x_in))
        xin = preprocess_u8(slab[None], meanstd_x)
        y = gen_apply(params, xin)
        pred = postprocess_to_u8(y, meanstd_y)[0, :, :, :, 0]
        i = (zstart - z_lo) // z_out
        out = jax.lax.dynamic_update_slice(out, pred, (i * z_out, 0, 0))
        return out, None

    out0 = jnp.zeros((nz * z_out, y_out, x_out), jnp.uint8)
    out, _ = jax.lax.scan(step, out0, zs)
    return out[:sz, :sy, :sx]
