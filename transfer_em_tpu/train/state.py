"""Training state: 4 parameter trees + 4 Adam states, one pytree.

Mirrors reference cgan.py:58-95 (2 generators, 2 discriminators, 4 Adam
optimizers, all checkpointed together) as an immutable flax struct that jit /
pjit / orbax handle natively.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_optimizer(lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                   eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam(2e-4, beta1=0.5) with tf.keras Adam's EXACT update semantics
    (reference cgan.py:69-73; eps=1e-7 is the Keras default).

    Keras applies epsilon to the UNCORRECTED sqrt(v) with bias correction
    folded into the step size:  var -= lr*sqrt(1-b2^t)/(1-b1^t) * m /
    (sqrt(v) + eps)  — whereas optax.adam adds eps to the bias-corrected
    sqrt(v_hat), i.e. an effectively ~sqrt(1-b2^t)-times-smaller epsilon in
    early steps.  The difference only matters where sqrt(v) ~ eps, but this
    package advertises train-step parity, so the update rule is implemented
    exactly.

    Checkpoint-format note: the optimizer state is a bare ScaleByAdamState,
    NOT optax.adam's (ScaleByAdamState, EmptyState) chain tuple — checkpoints
    written by pre-2026-08-16 builds (which used optax.adam) have a different
    opt-state pytree structure and will not StandardRestore into this one.
    No such checkpoints shipped; documented here in case one resurfaces.
    """

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=z, nu=jax.tree.map(jnp.zeros_like,
                                                            params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        c = count.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1 - b2 ** c) / (1 - b1 ** c)
        out = jax.tree.map(lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps),
                           mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
