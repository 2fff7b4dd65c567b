"""Training state: 4 parameter trees + 4 Adam states, one pytree.

Mirrors reference cgan.py:58-95 (2 generators, 2 discriminators, 4 Adam
optimizers, all checkpointed together) as an immutable flax struct that jit /
pjit / orbax handle natively.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


def make_optimizer(lr: float = 2e-4, b1: float = 0.5) -> optax.GradientTransformation:
    """Adam(2e-4, beta1=0.5) matching reference cgan.py:69-73.

    eps=1e-7 matches tf.keras.optimizers.Adam's default epsilon.
    """
    return optax.adam(lr, b1=b1, b2=0.999, eps=1e-7)


@flax.struct.dataclass
class CycleGANState:
    """All trainable state for the CycleGAN (reference ``tf.train.Checkpoint``
    contents, cgan.py:86-93)."""

    step: jax.Array
    gg: Any           # generator G params (X -> Y)
    gf: Any           # generator F params (Y -> X)
    dx: Any           # discriminator X params
    dy: Any           # discriminator Y params
    opt_gg: Any
    opt_gf: Any
    opt_dx: Any
    opt_dy: Any
