"""CycleGAN losses: sigmoid focal cross-entropy + the reference's loss recipe.

Replaces ``tfa.losses.SigmoidFocalCrossEntropy`` (reference cgan.py:78-81) with
a pure-JAX implementation matching TensorFlow-Addons semantics bit-for-bit:

* per-element loss = alpha_t * (1 - p_t)**gamma * ce, summed over the channel
  axis (tfa ``call`` does ``reduce_sum(..., axis=-1)``),
* ``Reduction.AUTO`` == SUM_OVER_BATCH_SIZE == mean over the per-sample
  values -> overall: mean over all non-channel elements.

Under `jit` with a batch-sharded mesh the mean is a *global-batch* mean, which
resolves the reference's known MirroredStrategy blocker (cgan.py:8-11,
README.md:93-94: "requires some of the loss calculations to be modified").

The composite losses reproduce reference cgan.py:110-142 exactly, including
the various *2 factors and the ``tconf = 1 - |a-b|/2`` focal trick used for
cycle and identity losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Keras backend epsilon used by binary_crossentropy's probability clipping.
_K_EPSILON = 1e-7


def sigmoid_focal_ce(labels: jax.Array, preds: jax.Array, *,
                     alpha: float = 0.5, gamma: float = 2.0,
                     from_logits: bool = True) -> jax.Array:
    """tfa.losses.sigmoid_focal_crossentropy with SUM_OVER_BATCH_SIZE reduction.

    Args:
      labels: target tensor, same shape as preds; channel axis last.
      preds: logits (from_logits=True) or probabilities.
      alpha: class-balance factor (reference uses 0.5).
      gamma: focusing exponent (reference default 2, configurable via
        ``focal_gamma``, cgan.py:40).
    Returns:
      scalar loss (mean over all non-channel elements of channel-summed focal CE).
    """
    labels = labels.astype(jnp.float32)
    preds = preds.astype(jnp.float32)
    if from_logits:
        # Numerically-stable sigmoid CE: max(x,0) - x*z + log1p(exp(-|x|)).
        ce = jnp.maximum(preds, 0.0) - preds * labels + jnp.log1p(
            jnp.exp(-jnp.abs(preds)))
        p = jax.nn.sigmoid(preds)
    else:
        # Keras-3 binary_crossentropy: clip to [eps, 1-eps], then ANOTHER
        # +eps inside each log (measured against tf.keras 3.13).  The clip is
        # only for the CE term; tfa computes p_t from the RAW probabilities,
        # so out-of-range preds (which the tconf trick produces for badly
        # diverged voxels) keep a gradient through the modulating factor.
        p_clip = jnp.clip(preds, _K_EPSILON, 1.0 - _K_EPSILON)
        ce = -(labels * jnp.log(p_clip + _K_EPSILON)
               + (1.0 - labels) * jnp.log(1.0 - p_clip + _K_EPSILON))
        p = preds
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    focal = alpha_t * jnp.power(1.0 - p_t, gamma) * ce
    # tfa sums over the channel axis; Reduction.AUTO then means over the rest.
    return jnp.mean(jnp.sum(focal, axis=-1))


def generator_adv_loss(disc_fake: jax.Array, *, gamma: float = 2.0) -> jax.Array:
    """Adversarial generator loss (reference cgan.py:119-120): focal-vs-ones * 2."""
    return sigmoid_focal_ce(jnp.ones_like(disc_fake), disc_fake,
                            gamma=gamma, from_logits=True) * 2.0


def discriminator_loss(disc_real: jax.Array, disc_fake: jax.Array, *,
                       gamma: float = 2.0) -> jax.Array:
    """Discriminator loss (reference cgan.py:110-117).

    (real_focal*2 + fake_focal*2) * 0.5, real vs ones, fake vs zeros.
    """
    real_loss = sigmoid_focal_ce(jnp.ones_like(disc_real), disc_real,
                                 gamma=gamma, from_logits=True) * 2.0
    fake_loss = sigmoid_focal_ce(jnp.zeros_like(disc_fake), disc_fake,
                                 gamma=gamma, from_logits=True) * 2.0
    return (real_loss + fake_loss) * 0.5


def _tconf_focal(real: jax.Array, other: jax.Array, *, gamma: float) -> jax.Array:
    """The reference's similarity->confidence focal trick (cgan.py:122-142).

    tconf = 1 - |real - other| / 2 maps agreement in [-1, 1] space onto a
    pseudo-probability in [0, 1]; focal CE against ones then concentrates the
    penalty on the worst-matching voxels.
    """
    tconf = 1.0 - jnp.abs(real - other) / 2.0
    return sigmoid_focal_ce(jnp.ones_like(tconf), tconf,
                            gamma=gamma, from_logits=False) * 2.0


def cycle_loss(real: jax.Array, cycled: jax.Array, *, gamma: float = 2.0) -> jax.Array:
    """Cycle-consistency loss: LAMBDA(=2) * tconf focal (reference cgan.py:133-142)."""
    return 2.0 * _tconf_focal(real, cycled, gamma=gamma)


def identity_loss(real: jax.Array, same: jax.Array, *, gamma: float = 2.0) -> jax.Array:
    """Identity loss: LAMBDA(=2) * 0.5 * tconf focal (reference cgan.py:122-131)."""
    return 2.0 * 0.5 * _tconf_focal(real, same, gamma=gamma)


def rmse(a: jax.Array, b: jax.Array) -> jax.Array:
    """Root mean squared error (reference debug.py:65-71 ``accuracy``)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(jnp.square(a - b)))


def psnr(a: jax.Array, b: jax.Array, peak: float = 2.0) -> jax.Array:
    """PSNR in dB; default peak 2.0 for data scaled to [-1, 1]."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-20))
