"""Synthetic-domain warping: box blur + dilated random holes (jittable).

Reproduces reference transfer_em/debug.py:7-63 ``warp_tensor``: given a
scaled [-1, 1] element from the *target* domain, manufacture an artificial
*source* domain by

1. 3x3(x3) box blur (SAME),
2. selecting voxels with probability 4/128**2, dilating the mask with an
   all-ones 4x4(x4) SAME conv, and
3. filling masked voxels with the element mean.

This is the framework's core self-supervised test fixture: a CycleGAN that
undoes a *known* corruption can be scored against ground truth with plain RMSE
(debug.py:65-71).  Unlike the TF version (tf.random without explicit seeding),
this is a pure function of a PRNG key, so fixtures are exactly reproducible.

On TPU the blur/dilation are tiny depthwise convs; XLA fuses the whole warp
into a couple of VPU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .convs import conv_nd

HOLE_RATE = 4.0 / (128 * 128)


def _box_filter(ndim: int, k: int, normalize: bool) -> jax.Array:
    w = jnp.ones((k,) * ndim + (1, 1), dtype=jnp.float32)
    if normalize:
        w = w / (k ** ndim)
    return w


def warp(x: jax.Array, key: jax.Array) -> jax.Array:
    """Warp one element (*spatial, 1): blur + holes.

    Args:
      x: scaled element with trailing channel axis, 2D or 3D spatial.
      key: PRNG key controlling hole placement.
    """
    ndim = x.ndim - 1
    xb = x[None]  # add batch for conv

    blur = _box_filter(ndim, 3, normalize=True)
    xb = conv_nd(xb, blur, stride=1, padding="SAME")

    u = jax.random.uniform(key, xb.shape)
    mask = (u < HOLE_RATE).astype(jnp.float32)

    dilate = _box_filter(ndim, 4, normalize=False)
    mask = conv_nd(mask, dilate, stride=1, padding="SAME")

    mean = jnp.mean(xb)
    xb = jnp.where(mask > 0, mean, xb)
    return xb[0]


def batch_warp(x: jax.Array, key: jax.Array) -> jax.Array:
    """Warp a batch (B, *spatial, 1) with independent per-element keys."""
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(warp)(x, keys)


def make_warp_map(seed: int = 0):
    """Build a stateless per-element warp map for dataset pipelines.

    Returns ``f(element, index_or_key) -> warped``.  The second argument is
    either an integer stream index (folded with ``seed`` into a key) or a
    PRNG key as passed by the dataset pipelines' custom_map protocol
    (pipeline.py: ``vmap(custom_map)(batch, keys)``); both are reproducible
    — the TPU-native replacement for ``custom_map=warp_tensor`` (reference
    datasets.py:47-49, debug.py:7).
    """
    base = jax.random.PRNGKey(seed)

    def _map(el: jax.Array, index_or_key) -> jax.Array:
        ik = jnp.asarray(index_or_key)
        # New-style typed PRNG keys (jax.random.key) are ndim-0 scalars —
        # dtype, not rank, distinguishes a key from an integer stream
        # index (round-5 review: the rank test alone routed typed keys
        # into fold_in's integer slot, a TypeError).
        if jnp.issubdtype(ik.dtype, jax.dtypes.prng_key):
            k = jax.random.fold_in(ik, seed)      # typed key: mix our seed
        elif ik.ndim == 0:                        # integer stream index
            k = jax.random.fold_in(base, ik)
        else:             # legacy (2,)-uint32 key: mix in our seed
            k = jax.random.fold_in(index_or_key, seed)
        return warp(el, k)

    return _map
