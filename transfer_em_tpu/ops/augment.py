"""Random augmentation: axis transpose + flips + intensity jitter (jittable).

Reproduces reference datasets/datasets.py:123-155 ``augment``:

* random permutation of the spatial axes (isotropic data assumed),
* independent 50% flip per spatial axis,
* intensity jitter: x * U(1, 1.05) + U(-0.05, 0.05).

The reference applies this per-element on the host via tf.data; here it is a
pure function of a PRNG key that runs on device — ``batch_augment`` vmaps it
over the batch so the whole augmentation is one fused VPU pass inside the
training step.  Data-dependent axis permutation is expressed with
``lax.switch`` over the (static) factorial table so everything stays jittable.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp


def _perm_table(ndim: int) -> Tuple[Tuple[int, ...], ...]:
    return tuple(itertools.permutations(range(ndim)))


def augment(x: jax.Array, key: jax.Array) -> jax.Array:
    """Augment one element (*spatial, C): transpose + flips + jitter."""
    ndim = x.ndim - 1
    perms = _perm_table(ndim)
    k_perm, k_flip, k_mean, k_var = jax.random.split(key, 4)

    idx = jax.random.randint(k_perm, (), 0, len(perms))
    branches = [
        (lambda p: (lambda t: jnp.transpose(t, p + (ndim,))))(p) for p in perms
    ]
    x = jax.lax.switch(idx, branches, x)

    flips = jax.random.uniform(k_flip, (ndim,)) < 0.5
    for d in range(ndim):
        x = jnp.where(flips[d], jnp.flip(x, axis=d), x)

    mean_adj = jax.random.uniform(k_mean, (), minval=-0.05, maxval=0.05)
    var_adj = jax.random.uniform(k_var, (), minval=1.0, maxval=1.05)
    return x * var_adj + mean_adj


def batch_augment(x: jax.Array, key: jax.Array) -> jax.Array:
    """Augment a batch (B, *spatial, C) with per-element independent keys."""
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(augment)(x, keys)
