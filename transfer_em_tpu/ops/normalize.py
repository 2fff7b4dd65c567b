"""Intensity scaling / population standardization (jittable).

Mirrors reference transfer_em/datasets/datasets.py:123-202 numerics:

* ``scale_tensor``: uint8 -> float32 in [-1, 1] via x/127.5 - 1, channel added.
* ``standardize_population`` / ``unstandardize_population``: (x - mean)/std and
  inverse.
* ``get_meanstd``: the reference's *mean-of-means / mean-of-variances* over
  dataset elements (datasets.py:173-190) — deliberately NOT the pooled
  variance; kept for parity.

All run on device so the host->device transfer stays 1 byte/voxel.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scale_tensor(x: jax.Array) -> jax.Array:
    """uint8 volume -> float32 in [-1, 1] with a trailing channel axis.

    Reference datasets.py:193-202.
    """
    x = x.astype(jnp.float32)
    x = x / 127.5 - 1.0
    return x[..., None]


def unscale_to_uint8(x: jax.Array) -> jax.Array:
    """Inverse of scale: [-1, 1] float -> rounded uint8 (reference utils.py:109-118)."""
    x = (x + 1.0) * 127.5
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def standardize_population(x: jax.Array, meanstd: Tuple[float, float]) -> jax.Array:
    mean, std = meanstd
    return (x - mean) / std


def unstandardize_population(x: jax.Array, meanstd: Tuple[float, float]) -> jax.Array:
    mean, std = meanstd
    return x * std + mean


@jax.jit
def _elem_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = x.astype(jnp.float32)
    return jnp.mean(x), jnp.var(x)


def get_meanstd(elements: Iterable[np.ndarray]) -> Tuple[float, float]:
    """Population statistics over an iterable of (already scaled) elements.

    Averages per-element means and per-element variances, then takes
    sqrt(mean variance) — matching reference datasets.py:173-190 semantics
    (NOT the pooled std).
    """
    mean_acc = 0.0
    var_acc = 0.0
    count = 0
    for el in elements:
        m, v = _elem_stats(jnp.asarray(el))
        mean_acc += float(m)
        var_acc += float(v)
        count += 1
    if count == 0:
        raise ValueError("empty dataset: cannot compute mean/std")
    mean = mean_acc / count
    std = float(np.sqrt(var_acc / count))
    return mean, std


def preprocess_u8(x_u8: jax.Array, meanstd: Tuple[float, float] | None) -> jax.Array:
    """Fused device-side preprocess: uint8 -> scaled (+ standardized) float.

    The one-pass equivalent of scale_tensor + standardize_population; the whole
    thing is a single affine map a*x + b so XLA folds it into one VPU pass (and
    usually fuses it into the consuming convolution).
    """
    if meanstd is None:
        return scale_tensor(x_u8)
    mean, std = meanstd
    a = 1.0 / (127.5 * std)
    b = (-1.0 - mean) / std
    x = x_u8.astype(jnp.float32) * a + b
    return x[..., None]


def postprocess_to_u8(y: jax.Array, meanstd: Tuple[float, float] | None) -> jax.Array:
    """Fused inverse: model output -> uint8 (unstandardize, *127.5 + 127.5, round).

    Reference utils.py:109-118.
    """
    if meanstd is not None:
        mean, std = meanstd
        y = y * std + mean
    return jnp.clip(jnp.round((y + 1.0) * 127.5), 0, 255).astype(jnp.uint8)
