"""Pallas TPU kernel: small-channel 3x3x3 VALID conv as a Toeplitz GEMM.

Why: this model family's convs have 8-32 channels (reference wf=8 widths).
On TPU, a conv's GEMM formulation has N = out_channels, so at C=O=8 only
8/128 MXU lanes do work — measured ~1.8 TFLOP/s for lax.conv (a C8->128 conv
costs the SAME wall time, PERF.md).  This kernel widens N by computing a
strip of WT adjacent W-outputs per GEMM row against a block-Toeplitz weight
matrix:

  A[(wb,h), (kd,kh, ww,c)] = x[d+kd, h+kh, wb*WT+ww, c]      (ww < WT+2)
  B[(kd,kh,ww,c), (wl,o)]  = w[kd,kh, ww-wl, c, o]           (0 <= ww-wl < 3)
  out[(wb,h), (wl,o)]      = A @ B                            N = WT*O lanes

WT is chosen so (WT+2)*C == 128: every (kd,kh) column block of A is exactly
one lane-tile, and A is built from x with 9*NW contiguous 2D copies of the
reshaped input (B, D, H, W*C) — no per-element shuffles.  Real-FLOP density
of the padded GEMM is 27/(9*(WT+2)) (18.75% at C=8) but lane utilization
goes from 6% to 87-100%.

Forward only; training wraps it in jax.custom_vjp with lax.conv backward
(bit-identical gradients to the lax path).  Falls back to lax.conv on
non-TPU backends and for unsupported shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convs import conv_nd

LANE = 128


def supported(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...]) -> bool:
    """3D, k=3, stride 1, C a power of two <= 32, spatial big enough."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    c = x_shape[-1]
    if w_shape[:3] != (3, 3, 3) or w_shape[3] != c:
        return False
    if c not in (1, 2, 4, 8, 16, 32):
        return False
    d, h, w = x_shape[1:4]
    wt = LANE // c - 2
    return d >= 3 and h >= 3 and w >= wt + 2


def _build_toeplitz(w: jax.Array, wt: int) -> jax.Array:
    """(3,3,3,C,O) -> (9*128, wt*O) block-Toeplitz, bf16."""
    c, o = w.shape[3], w.shape[4]
    bt = jnp.zeros((9, wt + 2, c, wt, o), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                for t in range(wt):
                    bt = bt.at[kd * 3 + kh, t + kw, :, t, :].set(wb[kd, kh, kw])
    return bt.reshape(9 * (wt + 2) * c, wt * o)


def _tconv3_kernel(oh: int, nw: int, wt: int, c: int, h8: int, wcp: int,
                   grid_d: int, leaky: float,
                   x_hbm, b_ref, o_ref, xs_ref, a_ref, sems):
    """One (batch, d_out) program: DMA the 3-slab window, build A, one GEMM.

    Double-buffered: while program (b, i) computes from slot i%2, the DMA for
    (b, i+1) is already in flight into slot (i+1)%2 (started by the previous
    program; grid iteration on one core is sequential).

    x_hbm:  (B, D, H, Wp*C)  reshaped input, stays in HBM/ANY
    b_ref:  (9*128, wt*O)    Toeplitz weights (VMEM)
    o_ref:  (1, 1, nw*oh, wt*O) output rows (wb-major, then h)
    xs_ref: (2, 3, H, Wp*C)  double-buffered VMEM scratch for the d-window
    a_ref:  (nw*oh, 9*128)   VMEM scratch (the patch matrix)
    leaky:  if >= 0, apply LeakyReLU(neg_slope=leaky) as the GEMM epilogue
            (absorbs the activation XLA would otherwise fuse).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():  # first program of this batch row: fetch its own window
        pltpu.make_async_copy(x_hbm.at[pl.ds(b, 1), pl.ds(i, 3)],
                              xs_ref.at[pl.ds(slot, 1)], sems.at[slot]).start()

    @pl.when(i + 1 < grid_d)
    def _():  # prefetch the next window into the other slot
        nxt = jax.lax.rem(i + 1, 2)
        pltpu.make_async_copy(x_hbm.at[pl.ds(b, 1), pl.ds(i + 1, 3)],
                              xs_ref.at[pl.ds(nxt, 1)], sems.at[nxt]).start()

    pltpu.make_async_copy(x_hbm.at[pl.ds(b, 1), pl.ds(i, 3)],
                          xs_ref.at[pl.ds(slot, 1)], sems.at[slot]).wait()

    for kd in range(3):
        for kh in range(3):
            col = (kd * 3 + kh) * LANE
            for wb in range(nw):
                a_ref[wb * oh:(wb + 1) * oh, col:col + LANE] = \
                    xs_ref[slot, kd, kh:kh + oh,
                           wb * wt * c:wb * wt * c + LANE]
    y = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    if leaky >= 0:
        y = jnp.where(y >= 0, y, y * leaky)
    o_ref[0, 0] = y.astype(o_ref.dtype)


def tconv3_layout(x: jax.Array) -> jax.Array:
    """The pre-kernel relayout: (B, D, H, W, C) -> padded (B, D, H8, WCP).

    W is padded so the last strip can read WT+2 pixels, H to a multiple of 8
    and the fused W*C lane dim to a multiple of 128 (Mosaic DMA slices must
    align to the (8, 128) tile; the kernel DMAs full padded trailing dims).
    Exposed separately so bench_chain.py can time the GEMM kernel with the
    relayout amortized away (the "chained layers" bound, PERF.md)."""
    bsz, d, h, wdim, c = x.shape
    wt = LANE // c - 2
    nw = -(-(wdim - 2) // wt)
    wp = nw * wt + 2
    xb = x.astype(jnp.bfloat16)
    if wp > wdim:
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, 0), (0, wp - wdim), (0, 0)))
    x2 = xb.reshape(bsz, d, h, wp * c)
    h8 = -(-h // 8) * 8
    wcp = -(-(wp * c) // LANE) * LANE
    return jnp.pad(x2, ((0, 0), (0, 0), (0, h8 - h), (0, wcp - wp * c)))


def tconv3(x: jax.Array, w: jax.Array, leaky: float = -1.0) -> jax.Array:
    """3x3x3 VALID stride-1 conv, channels-last, via the Toeplitz kernel.

    x: (B, D, H, W, C) any float dtype; w: (3,3,3,C,O).  Returns
    (B, D-2, H-2, W-2, O) in x.dtype (compute bf16).
    leaky: >= 0 fuses a LeakyReLU(neg_slope=leaky) epilogue into the GEMM.
    """
    bsz, d, h, wdim, c = x.shape
    o = w.shape[-1]
    od, oh, ow = d - 2, h - 2, wdim - 2
    wt = LANE // c - 2
    nw = -(-ow // wt)  # ceil
    out_dtype = x.dtype

    x2 = tconv3_layout(x)
    bt = _build_toeplitz(w, wt)
    out = _tconv3_call(x2, bt, c=c, o=o, oh=oh, nw=nw, od=od, leaky=leaky)

    # untangle rows (wb, h) and lanes (wl, o) -> (B, OD, OH, OW, O)
    y = out.reshape(bsz, od, nw, oh, wt, o)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, od, oh, nw * wt, o)
    return y[:, :, :, :ow, :].astype(out_dtype)


def _tconv3_call(x2: jax.Array, bt: jax.Array, *, c: int, o: int, oh: int,
                 nw: int, od: int, leaky: float) -> jax.Array:
    """The bare pallas_call on a pre-laid-out input (B, D, H8, WCP).

    Returns the TANGLED (B, OD, NW*OH, WT*O) strip output (rows (wb, h),
    lanes (wl, o)).  Exposed (with tconv3_layout) so bench_chain.py can time
    the GEMM with the relayout amortized away — the per-layer cost a
    perfectly chained multi-layer kernel would pay."""
    bsz, _, h8, wcp = x2.shape
    wt = LANE // c - 2
    kern = functools.partial(_tconv3_kernel, oh, nw, wt, c, h8, wcp, od,
                             leaky)
    return pl.pallas_call(
        kern,
        grid=(bsz, od),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x2 stays in HBM; DMA'd
            pl.BlockSpec((9 * LANE, wt * o), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nw * oh, wt * o),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, od, nw * oh, wt * o),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 3, h8, wcp), jnp.bfloat16),  # double-buffered
            pltpu.VMEM((nw * oh, 9 * LANE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, bt)


@jax.custom_vjp
def tconv3_op(x: jax.Array, w: jax.Array) -> jax.Array:
    """Differentiable Toeplitz conv: pallas forward, lax.conv backward."""
    return tconv3(x, w)


def _fwd(x, w):
    return tconv3(x, w), (x, w)


def _bwd(res, g):
    x, w = res

    # Gradients via the reference lax path: bit-identical to differentiating
    # conv_nd (XLA's conv VJPs), at the cost of one recomputed forward.
    def ref(x_, w_):
        return conv_nd(x_, w_, stride=1, padding="VALID")

    _, vjp = jax.vjp(ref, x.astype(jnp.float32), w.astype(jnp.float32))
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


tconv3_op.defvjp(_fwd, _bwd)

LEAKY_SLOPE = 0.3  # Keras default, matching models.blocks


@jax.custom_vjp
def tconv3_act_op(x: jax.Array, w: jax.Array) -> jax.Array:
    """Conv + fused LeakyReLU(0.3) epilogue; pallas fwd, lax bwd."""
    return tconv3(x, w, leaky=LEAKY_SLOPE)


def _act_fwd(x, w):
    return tconv3(x, w, leaky=LEAKY_SLOPE), (x, w)


def _act_bwd(res, g):
    x, w = res

    def ref(x_, w_):
        y = conv_nd(x_, w_, stride=1, padding="VALID")
        return jnp.where(y >= 0, y, y * LEAKY_SLOPE)

    _, vjp = jax.vjp(ref, x.astype(jnp.float32), w.astype(jnp.float32))
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


tconv3_act_op.defvjp(_act_fwd, _act_bwd)
