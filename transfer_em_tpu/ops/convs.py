"""N-D convolution primitives with TF-exact semantics, tuned for TPU.

The reference leans on Keras ``Conv2D/3D`` (VALID) and ``Conv2DTranspose/
Conv3DTranspose`` (stride 2, SAME) — reference models/utils.py:61,66,109,129.
Here both are thin wrappers over ``lax.conv_general_dilated`` with
channels-last layouts (NHWC / NDHWC), which XLA lowers onto the MXU.

Key subtlety: TF's stride-2 SAME transposed conv places its taps according to
"gradient of a SAME forward conv".  We reproduce that exactly with an
input-dilated forward conv using padding (k-1-p_lo, k-1-p_hi) where
(p_lo, p_hi) is the SAME-split of max(k-s, 0) — verified against TF in
tests/test_models.py.

Compute dtype: convolutions accept a ``precision``/``compute_dtype`` knob;
bfloat16 keeps the MXU at full rate while params stay float32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(ndim: int) -> lax.ConvDimensionNumbers:
    """Channels-last dimension numbers for 1/2/3 spatial dims."""
    if ndim == 2:
        return lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                          ("NHWC", "HWIO", "NHWC"))
    if ndim == 3:
        return lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                          ("NDHWC", "DHWIO", "NDHWC"))
    raise ValueError(f"unsupported spatial ndim {ndim}")


def conv_nd(x: jax.Array, kernel: jax.Array, *,
            stride: int = 1,
            padding: str = "VALID",
            compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """VALID/SAME N-D conv, channels last.

    Args:
      x: (B, *spatial, Cin).
      kernel: (*spatial_k, Cin, Cout)  (HWIO / DHWIO).
    """
    ndim = x.ndim - 2
    dn = _dim_numbers(ndim)
    if compute_dtype is not None:
        # Mixed precision: both operands in compute_dtype; the output STAYS in
        # compute_dtype so activations flow at low precision end-to-end (the
        # model casts once at entry/exit).  No preferred_element_type here —
        # f32-preferred output with bf16 inputs breaks jax's conv transpose
        # (VJP) rule with a dtype mismatch; the MXU accumulates in f32
        # internally regardless.
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        return lax.conv_general_dilated(
            x, kernel, window_strides=(stride,) * ndim, padding=padding,
            dimension_numbers=dn)
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,) * ndim,
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def same_transpose_padding(k: int, s: int) -> Tuple[int, int]:
    """Equivalent forward-conv padding for TF's SAME transposed conv.

    TF SAME transpose (out = in * s) is the input-gradient of a SAME forward
    strided conv; its forward-dilated equivalent pads (k-1-p_lo, k-1-p_hi)
    where p_total = max(k - s, 0), p_lo = p_total//2, p_hi = p_total - p_lo.
    """
    p_total = max(k - s, 0)
    p_lo = p_total // 2
    p_hi = p_total - p_lo
    return (k - 1 - p_lo, k - 1 - p_hi)


def conv_transpose_nd(x: jax.Array, kernel: jax.Array, *,
                      stride: int = 2,
                      compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """TF-exact stride-s SAME transposed conv, channels last.

    Args:
      x: (B, *spatial, Cin).
      kernel: (*spatial_k, Cin, Cout) in the *transpose* direction (i.e. maps
        Cin -> Cout).  TF's ``Conv2DTranspose`` stores (k, k, Cout, Cin); to
        import TF weights, transpose the last two axes.

    Output spatial size = input * stride.
    """
    ndim = x.ndim - 2
    dn = _dim_numbers(ndim)
    k = kernel.shape[0]
    pad = same_transpose_padding(k, stride)
    # Gradient-of-conv == forward conv on the s-dilated input with the
    # spatially-flipped kernel.
    flipped = jnp.flip(kernel, axis=tuple(range(ndim)))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        flipped = flipped.astype(compute_dtype)
        return lax.conv_general_dilated(
            x, flipped, window_strides=(1,) * ndim, padding=[pad] * ndim,
            lhs_dilation=(stride,) * ndim, dimension_numbers=dn)
    return lax.conv_general_dilated(
        x, flipped,
        window_strides=(1,) * ndim,
        padding=[pad] * ndim,
        lhs_dilation=(stride,) * ndim,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def center_crop(x: jax.Array, crop: int | Sequence[int]) -> jax.Array:
    """Center-crop all spatial axes by ``crop`` per face.

    Matches Keras ``Cropping2D/3D(cropping=c)`` (reference cgan.py:160-183).
    """
    ndim = x.ndim - 2
    if isinstance(crop, int):
        crop = [(crop, crop)] * ndim
    slices = [slice(None)]
    for lo, hi in crop:
        slices.append(slice(lo, x.shape[len(slices)] - hi))
    slices.append(slice(None))
    return x[tuple(slices)]


def zero_pad(x: jax.Array, pad: int) -> jax.Array:
    """Zero-pad all spatial axes by ``pad`` per face (Keras ZeroPadding2D/3D)."""
    ndim = x.ndim - 2
    cfg = [(0, 0)] + [(pad, pad)] * ndim + [(0, 0)]
    return jnp.pad(x, cfg)


def asymmetric_center_crop(x: jax.Array, target) -> jax.Array:
    """Crop each spatial axis down to ``target`` (int or per-axis tuple);
    an odd leftover voxel goes to the high side.

    Matches the reference skip-connection crop (generator.py:74-86): crop1 =
    (dim-target)//2, crop2 = crop1 (+1 if odd).  Per-axis targets support
    anisotropic inputs (e.g. spatially-sharded slabs in parallel/halo.py).
    """
    ndim = x.ndim - 2
    if isinstance(target, int):
        target = (target,) * ndim
    crops = []
    for ax in range(ndim):
        total = x.shape[1 + ax] - target[ax]
        lo = total // 2
        crops.append((lo, total - lo))
    return center_crop(x, crops)


def crop_to_match(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Center-crop x's spatial axes to match ref's spatial shape."""
    return asymmetric_center_crop(x, tuple(ref.shape[1:-1]))
