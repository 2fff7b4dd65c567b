"""Pallas TPU kernels for the host<->device data boundary.

The train/inference hot loops are convolutions, which XLA already lowers
optimally onto the MXU; the remaining bandwidth-bound edges are the uint8
boundary ops (SURVEY.md §2.3 "Native kernels"):

* ``preprocess_u8``  — uint8 -> f32 scale+standardize, one fused affine pass
  (the device side of the 1-byte/voxel transfer strategy; replaces reference
  host-side scale_tensor + standardize_population, datasets.py:157-202).
* ``postprocess_u8`` — f32 -> uint8 unstandardize+rescale+round+clip
  (reference utils.py:109-118).

Both read each element exactly once from HBM and write once — speed-of-light
for a memory-bound op.  Arbitrary shapes are handled by flattening to lanes
of 128 with a padded tail (masked writes are avoided by padding the source).

On non-TPU backends the kernels run in interpreter mode (tests) — the jnp
implementations in ops.normalize remain the reference semantics; equality is
asserted in tests/test_pallas.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK_ROWS = 512  # rows of 128 lanes per grid step (64 KB f32 per buffer)


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _flatten_pad(x: jax.Array, pad_value) -> Tuple[jax.Array, int, Tuple[int, ...]]:
    """Flatten to (rows, 128) with the tail padded; returns (x2d, n, shape)."""
    shape = x.shape
    n = x.size
    per_block = BLOCK_ROWS * LANES
    total = ((n + per_block - 1) // per_block) * per_block
    flat = jnp.ravel(x)
    if total != n:
        flat = jnp.concatenate(
            [flat, jnp.full((total - n,), pad_value, dtype=x.dtype)])
    return flat.reshape(-1, LANES), n, shape


def _affine_u8_to_f32_kernel(scale_ref, bias_ref, x_ref, o_ref):
    a = scale_ref[0]
    b = bias_ref[0]
    # Mosaic has no direct u8->f32 cast; widen through i32 (free on the VPU).
    o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.float32) * a + b


def preprocess_u8(x_u8: jax.Array, meanstd: Tuple[float, float] | None) -> jax.Array:
    """Pallas version of ops.normalize.preprocess_u8 (adds channel axis)."""
    if meanstd is None:
        a, b = 1.0 / 127.5, -1.0
    else:
        mean, std = meanstd
        a = 1.0 / (127.5 * std)
        b = (-1.0 - mean) / std
    x2d, n, shape = _flatten_pad(x_u8, 0)
    rows = x2d.shape[0]
    grid = rows // BLOCK_ROWS
    out = pl.pallas_call(
        _affine_u8_to_f32_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=not _is_tpu(),
    )(jnp.array([a], jnp.float32), jnp.array([b], jnp.float32), x2d)
    return out.reshape(-1)[:n].reshape(shape)[..., None]


def _affine_f32_to_u8_kernel(scale_ref, bias_ref, x_ref, o_ref):
    a = scale_ref[0]
    b = bias_ref[0]
    y = x_ref[:] * a + b
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    # Mosaic has no direct f32->u8 cast; narrow through i32.
    o_ref[:] = y.astype(jnp.int32).astype(jnp.uint8)


def postprocess_u8(y: jax.Array, meanstd: Tuple[float, float] | None) -> jax.Array:
    """Pallas version of ops.normalize.postprocess_to_u8 (drops nothing —
    caller strips the channel axis if needed)."""
    if meanstd is None:
        a, b = 127.5, 127.5
    else:
        mean, std = meanstd
        # round((y*std + mean + 1) * 127.5) == round(y * (127.5*std) + (mean+1)*127.5)
        a = 127.5 * std
        b = (mean + 1.0) * 127.5
    y2d, n, shape = _flatten_pad(y.astype(jnp.float32), 0.0)
    rows = y2d.shape[0]
    grid = rows // BLOCK_ROWS
    out = pl.pallas_call(
        _affine_f32_to_u8_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
        interpret=not _is_tpu(),
    )(jnp.array([a], jnp.float32), jnp.array([b], jnp.float32), y2d)
    return out.reshape(-1)[:n].reshape(shape)


def leaky_relu_kernel_call(x: jax.Array, negative_slope: float = 0.3) -> jax.Array:
    """Fused LeakyReLU as a standalone Pallas kernel.

    XLA fuses LeakyReLU into the surrounding convs on its own; this exists as
    the building block for future hand-fused conv epilogues and to validate
    the pallas path end-to-end on hardware.
    """

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.where(v >= 0, v, v * negative_slope)

    x2d, n, shape = _flatten_pad(x.astype(jnp.float32), 0.0)
    rows = x2d.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(rows // BLOCK_ROWS,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=not _is_tpu(),
    )(x2d)
    return out.reshape(-1)[:n].reshape(shape)
