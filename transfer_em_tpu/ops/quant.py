"""Int8 quantized convolutions — the serving-path quantization probe.

v5e's int8 MXU rate is 2x bf16, serving inputs/outputs are already uint8
end-to-end (infer/tiling.py ships 1 byte/voxel both ways), and the fidelity
bar (40 dB vs the TF reference, BASELINE.md) has ~11 dB of headroom at bf16
— so an int8 conv path is the one unprobed throughput axis on this hardware
(VERDICT r4 weak 5).  This module supplies the kernels; ``UNetGenerator(
int8_conv=True)`` routes every conv through them; ``bench_int8.py`` measures
throughput AND golden PSNR, and PERF.md records the keep-or-close verdict.

Scheme (the standard dynamic-activation / per-channel-weight recipe):

* activations: per-tensor symmetric int8 (scale = max|x| / 127, computed on
  device per call — one reduction, fused by XLA into the preceding op);
* weights: per-output-channel symmetric int8 (scale per Cout — the shape
  that preserves conv linearity: y[..., c] scales by s_x * s_w[c]).
  Weight quantization ALSO runs per traced call: params are jit arguments
  (the serving tile step keys one program across checkpoints), so it
  cannot constant-fold.  The cost is one abs-max reduction + round over
  the param bytes per step — ~1 MB at wf=8 / ~77 MB at wf=1, i.e. ~0.1 ms
  of HBM traffic against a 23-48 ms step, and it does not change the
  bench_int8.py keep-or-close verdict (a separate pre-quantized-params
  pipeline would complicate the API for <1% of step time);
* conv: int8 x int8 -> int32 accumulation (``preferred_element_type``),
  dequantized straight into the requested compute dtype.

No zero-points (symmetric): EM activations here are LeakyReLU outputs and
[-1, 1]-scaled inputs, roughly centered; symmetric keeps the conv a pure
integer dot (no correction terms), which is what the MXU path wants.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .convs import _dim_numbers, same_transpose_padding


def quantize_sym(a: jax.Array, axes: Tuple[int, ...]
                 ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization over ``axes`` (keepdims scales).

    Returns (q_int8, scale) with a ~= q * scale, q in [-127, 127].
    """
    a = a.astype(jnp.float32)
    amax = jnp.max(jnp.abs(a), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
    return q, scale


def conv_nd_int8(x: jax.Array, kernel: jax.Array, *, stride: int = 1,
                 padding: str = "VALID",
                 out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """VALID/SAME N-D conv in int8: quantize both operands, integer conv,
    dequantize.  Same call shape as :func:`..convs.conv_nd`."""
    ndim = x.ndim - 2
    dn = _dim_numbers(ndim)
    qx, sx = quantize_sym(x, tuple(range(x.ndim)))
    qk, sk = quantize_sym(kernel, tuple(range(kernel.ndim - 1)))
    acc = lax.conv_general_dilated(
        qx, qk, window_strides=(stride,) * ndim, padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    # sx: (1,)*x.ndim scalar; sk: (1,)*(ndim+1) + (Cout,) — broadcasts onto
    # the channels-last accumulator.
    y = acc.astype(jnp.float32) * (sx * sk.reshape((1,) * (ndim + 1)
                                                   + (kernel.shape[-1],)))
    return y.astype(out_dtype) if out_dtype is not None else y


def conv_transpose_nd_int8(x: jax.Array, kernel: jax.Array, *,
                           stride: int = 2,
                           out_dtype: Optional[jnp.dtype] = None
                           ) -> jax.Array:
    """TF-exact stride-s SAME transposed conv in int8 (the input-dilated
    formulation of :func:`..convs.conv_transpose_nd`; dilation zeros are
    exact in any symmetric integer scheme)."""
    ndim = x.ndim - 2
    dn = _dim_numbers(ndim)
    k = kernel.shape[0]
    pad = same_transpose_padding(k, stride)
    flipped = jnp.flip(kernel, axis=tuple(range(ndim)))
    qx, sx = quantize_sym(x, tuple(range(x.ndim)))
    qk, sk = quantize_sym(flipped, tuple(range(flipped.ndim - 1)))
    acc = lax.conv_general_dilated(
        qx, qk, window_strides=(1,) * ndim, padding=[pad] * ndim,
        lhs_dilation=(stride,) * ndim, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sk.reshape((1,) * (ndim + 1)
                                                   + (kernel.shape[-1],)))
    return y.astype(out_dtype) if out_dtype is not None else y
