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
                      compute_dtype: Optional[jnp.dtype] = None,
                      phase_decompose: Optional[bool] = None) -> jax.Array:
    """TF-exact stride-s SAME transposed conv, channels last.

    Args:
      x: (B, *spatial, Cin).
      kernel: (*spatial_k, Cin, Cout) in the *transpose* direction (i.e. maps
        Cin -> Cout).  TF's ``Conv2DTranspose`` stores (k, k, Cout, Cin); to
        import TF weights, transpose the last two axes.
      phase_decompose: use the subpixel/phase formulation (one stride-1 k=3
        conv with 2^nd * Cout output channels instead of an input-dilated
        k=4 conv).  Mathematically identical (summation order differs at
        float rounding level).  Measured 1.5-1.8x faster STANDALONE on TPU
        at B=128, but a net loss in-context (train step 237 vs 247 tiles/s,
        device inference 69 vs 73 Mvox/s): the pad/transpose interleave
        breaks XLA's fusion with neighboring ops — same composition failure
        as the Pallas Toeplitz conv (PERF.md).  Default OFF; opt-in knob.

    Output spatial size = input * stride.
    """
    ndim = x.ndim - 2
    if phase_decompose is None:
        phase_decompose = False
    if phase_decompose:
        if stride != 2 or kernel.shape[0] != 4:
            raise ValueError("phase_decompose supports stride=2, k=4 only")
        return _conv_transpose_phase(x, kernel, compute_dtype=compute_dtype)
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


def _conv_transpose_phase(x: jax.Array, kernel: jax.Array, *,
                          compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """Stride-2 SAME k=4 transposed conv via subpixel phase decomposition.

    1D adjoint algebra of the TF SAME stride-2 k=4 forward conv
    (z[i] = sum_t x[2i+t-1] w[t]):

        y[2m]   = x[m-1] w[3] + x[m] w[1]      (even phase)
        y[2m+1] = x[m]   w[2] + x[m+1] w[0]    (odd phase)

    i.e. each output phase is a 2-tap stride-1 conv over x.  All 2^nd phases
    are fused into ONE k=3 VALID conv over x padded by 1 (the odd phase's
    window {m+1, m+2} sits inside the k=3 window) with 2^nd * Cout output
    channels — wide enough to fill MXU lanes — then interleaved by reshape.
    Equivalent to the lhs_dilation formulation to float rounding (verified
    in tests/test_ops.py); 1.5-1.8x faster on TPU at B>=64 (PERF.md).
    """
    import itertools

    ndim = x.ndim - 2
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    nphase = 2 ** ndim
    k3 = jnp.zeros((3,) * ndim + (cin, cout * nphase), kernel.dtype)
    # per-axis: even phase -> taps {offset 0: w[3], 1: w[1]};
    #           odd  phase -> taps {offset 1: w[2], 2: w[0]}
    tapmap = ({0: 3, 1: 1}, {1: 2, 2: 0})
    for phases in itertools.product((0, 1), repeat=ndim):
        pidx = 0
        for p in phases:
            pidx = pidx * 2 + p
        for offs in itertools.product(*[tapmap[p] for p in phases]):
            wtaps = tuple(tapmap[p][o] for p, o in zip(phases, offs))
            k3 = k3.at[offs + (slice(None),
                               slice(pidx * cout, (pidx + 1) * cout))].add(
                kernel[wtaps])
    dn = _dim_numbers(ndim)
    xp = jnp.pad(x, [(0, 0)] + [(1, 1)] * ndim + [(0, 0)])
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        k3 = k3.astype(compute_dtype)
        y = lax.conv_general_dilated(xp, k3, window_strides=(1,) * ndim,
                                     padding="VALID", dimension_numbers=dn)
    else:
        y = lax.conv_general_dilated(xp, k3, window_strides=(1,) * ndim,
                                     padding="VALID", dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    bsz = x.shape[0]
    sp = x.shape[1:-1]
    y = y.reshape((bsz,) + sp + (2,) * ndim + (cout,))
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]  # (m, phase) pairs per axis
    perm += [1 + 2 * ndim]
    y = y.transpose(perm)
    return y.reshape((bsz,) + tuple(2 * s for s in sp) + (cout,))


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
