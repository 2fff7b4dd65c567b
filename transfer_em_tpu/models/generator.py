"""Fully-VALID-conv U-Net generator (2D/3D), Flax.

Reproduces reference transfer_em/models/generator.py:22-119 layer-for-layer:

    stem 3x3 conv (64/wf) -> LeakyReLU                       74 -> 72
    down1 (64/wf), skip tap at 70                            72 -> 34
    down2 (128/wf), skip tap at 32                           34 -> 15
    up1: UpBlock(128/wf)                                     15 -> 26
    concat center-cropped skip1                              (ch 2*128/wf... see below)
    mid 3x3 conv (256/wf) -> LeakyReLU                       26 -> 24
    up0: UpBlock(64/wf)                                      24 -> 44
    concat center-cropped skip0
    head 3x3 conv (128/wf) -> LeakyReLU                      44 -> 42
    out  3x3 conv (1, no bias)                               42 -> 40

No norm layers are active (matching the reference's commented-out calls), no
bias anywhere, no output nonlinearity (the reference emits raw conv output).

The net is fully convolutional: any spatially "valid" input size works (see
shapes.is_valid_dimsize); 74 -> 40 is the verified default.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convs import crop_to_match
from ..shapes import generator_shapes, is_valid_dimsize
from .blocks import ConvActND, ConvND, DownBlock, UpBlock


class UNetGenerator(nn.Module):
    """U-Net generator; input (B, *spatial, 1) -> output (B, *spatial-2*buffer, 1).

    Attributes:
      wf: width factor dividing the base widths (reference ``wf``; 1..32).
      use_norm: enable the (reference-disabled) InstanceNorm call sites.
      compute_dtype: conv compute dtype (e.g. jnp.bfloat16 on TPU).
    """

    wf: int = 8
    use_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    fast_conv: bool = False
    int8_conv: bool = False  # serve every conv int8 (ops/quant.py probe)
    dropout_impl: str = "ref"  # "rbg8": uint8 hardware-RBG masks (blocks.py)

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cd = self.compute_dtype
        if cd is not None:
            x = x.astype(cd)  # activations flow in compute_dtype end-to-end
        fc, q8 = self.fast_conv, self.int8_conv
        x = ConvActND(64 // self.wf, 3, compute_dtype=cd, fast_conv=fc,
                      int8_conv=q8, name="stem")(x)

        down1, skip0 = DownBlock(64 // self.wf, use_norm=False,
                                 compute_dtype=cd, fast_conv=fc,
                                 int8_conv=q8, name="down1")(x)
        down2, skip1 = DownBlock(128 // self.wf, use_norm=self.use_norm,
                                 compute_dtype=cd, fast_conv=fc,
                                 int8_conv=q8, name="down2")(down1)

        up1 = UpBlock(128 // self.wf, use_norm=self.use_norm,
                      compute_dtype=cd, fast_conv=fc, int8_conv=q8,
                      dropout_impl=self.dropout_impl, name="up1")(
                          down2, deterministic=deterministic)
        skip1c = crop_to_match(skip1, up1)
        x = jnp.concatenate([up1, skip1c], axis=-1)

        x = ConvActND(256 // self.wf, 3, compute_dtype=cd, fast_conv=fc,
                      int8_conv=q8, name="mid")(x)

        up0 = UpBlock(64 // self.wf, use_norm=self.use_norm,
                      compute_dtype=cd, fast_conv=fc, int8_conv=q8,
                      dropout_impl=self.dropout_impl,
                      name="up0")(x, deterministic=deterministic)
        skip0c = crop_to_match(skip0, up0)
        x = jnp.concatenate([up0, skip0c], axis=-1)

        x = ConvActND(128 // self.wf, 3, compute_dtype=cd, fast_conv=fc,
                      int8_conv=q8, name="head")(x)
        x = ConvND(1, 3, compute_dtype=cd, fast_conv=fc, int8_conv=q8,
                   name="out")(x)
        return x.astype(jnp.float32)


def build_generator(dimsize: int, is3d: bool = True, wf: int = 8,
                    use_norm: bool = False,
                    compute_dtype: Optional[jnp.dtype] = None,
                    strict: bool = True):
    """Construct generator + report the output size, like the reference's
    ``unet_generator(dimsize, ...) -> (model, out_dimsize)``.

    ``strict`` enforces validity (reference restricts to VALID_DIMS=[74];
    we accept any size passing shapes.is_valid_dimsize).
    """
    if strict and not is_valid_dimsize(dimsize):
        raise ValueError(
            f"{dimsize} does not allow for valid convolutions "
            f"(see transfer_em_tpu.shapes.valid_dimsizes())")
    model = UNetGenerator(wf=wf, use_norm=use_norm, compute_dtype=compute_dtype)
    out = generator_shapes(dimsize).out
    del is3d  # same module handles 2D/3D; kept for API parity
    return model, out


def unet_generator(dimsize, is3d=True, norm_type="instancenorm", wf=8):
    """Reference-named constructor (models/generator.py:22) ->
    ``(module, out_dimsize)``.  ``norm_type`` is accepted but inert, exactly
    as in the reference (all norm calls are commented out,
    models/utils.py:75-82; cgan.py:47 marks it DEPRECATED).

    Raises ``RuntimeError`` for an invalid ``dimsize``, matching the
    reference's exception type (models/generator.py:38) so migrating code
    that catches it keeps working; the native ``build_generator`` raises
    ``ValueError``."""
    del norm_type
    try:
        return build_generator(dimsize, is3d=is3d, wf=wf)
    except ValueError as e:
        raise RuntimeError(str(e)) from e
