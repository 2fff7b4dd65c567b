"""PatchGAN discriminator (2D/3D), Flax.

Reproduces reference transfer_em/models/discriminator.py:14-106 including its
quirks (kept deliberately — see SURVEY.md §7 "known reference quirks"):

* the "HACK" asymmetry (discriminator.py:44-55): in 3D the extra 3x3 conv
  (16ch) consumes the first downsample's output; in 2D it consumes the *raw
  input* and the first downsample is computed in the reference but unused —
  here the 2D path simply skips down1 (identical function, fewer FLOPs; the
  2D parameter tree intentionally has no ``down1``).
* a second LeakyReLU directly after down3's own trailing LeakyReLU
  (discriminator.py:81-82), i.e. negatives get slope 0.3**2.
* only the final 1x1 conv has a bias (Keras default use_bias=True there).

``disc_prior``: optional frozen feature extractor whose output (matching
down2's spatial grid) is concatenated mid-net (discriminator.py:62-70); pass
as a callable taking/returning channels-last arrays.  Its parameters live
outside this module and receive no gradient (reference freezes via
``trainable=False``, cgan.py:21-29).

For a 40^3 input the output is a 1^3 single-logit patch; 2D/40^2 -> 6^2.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvActND, ConvND, DownBlock, leaky_relu


class Discriminator(nn.Module):
    """Patch discriminator; input (B, *spatial, 1) -> patch logits (B, *, 1)."""

    is3d: bool = True
    wf: int = 8
    use_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    disc_prior: Optional[Callable[[jax.Array], jax.Array]] = None
    fast_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cd = self.compute_dtype
        if cd is not None:
            x = x.astype(cd)
        inp = x

        fc = self.fast_conv
        if self.is3d:
            down1, _ = DownBlock(64 // self.wf, use_norm=False,
                                 compute_dtype=cd, fast_conv=fc,
                                 name="down1")(x)
            h = ConvActND(16, 3, compute_dtype=cd, fast_conv=fc,
                          name="hack")(down1)
        else:
            # 2D HACK path: conv on the raw input; down1 never contributes.
            h = ConvActND(16, 3, compute_dtype=cd, name="hack")(x)

        down2, _ = DownBlock(256 // self.wf, use_norm=self.use_norm,
                             compute_dtype=cd, fast_conv=fc, name="down2")(h)
        x = down2

        if self.disc_prior is not None:
            x2 = self.disc_prior(inp)
            x = jnp.concatenate([x, x2], axis=-1)

        down3, _ = DownBlock(32, use_norm=False, compute_dtype=cd,
                             fast_conv=fc, name="down3")(x)
        x = leaky_relu(down3)  # reference applies LeakyReLU twice here

        x = ConvActND(256 // self.wf, 1, compute_dtype=cd, name="head")(x)
        x = ConvND(1, 1, use_bias=True, compute_dtype=cd, name="out")(x)
        return x.astype(jnp.float32)


def build_discriminator(is3d: bool = True, wf: int = 8, use_norm: bool = False,
                        compute_dtype=None, disc_prior=None) -> Discriminator:
    """API-parity constructor (reference ``discriminator(is3d, ...)``)."""
    return Discriminator(is3d=is3d, wf=wf, use_norm=use_norm,
                         compute_dtype=compute_dtype, disc_prior=disc_prior)


def discriminator(is3d=True, norm_type="instancenorm", wf=8, disc_prior=None):
    """Reference-named constructor (models/discriminator.py:14) — importable
    as ``from transfer_em_tpu.models.discriminator import discriminator``,
    the reference's own path.  ``norm_type`` is accepted but inert, as in the
    reference (norm calls commented out, models/utils.py:75-82)."""
    del norm_type
    return build_discriminator(is3d=is3d, wf=wf, disc_prior=disc_prior)
