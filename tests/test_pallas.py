"""Pallas kernels == jnp reference semantics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.ops import normalize
from transfer_em_tpu.ops import pallas_kernels as pk


def test_preprocess_u8_matches_jnp(rng):
    x = rng.integers(0, 256, size=(3, 33, 41), dtype=np.uint8)
    ms = (0.17, 0.83)
    got = np.asarray(pk.preprocess_u8(jnp.asarray(x), ms))
    want = np.asarray(normalize.preprocess_u8(jnp.asarray(x), ms))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_preprocess_u8_no_meanstd(rng):
    x = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    got = np.asarray(pk.preprocess_u8(jnp.asarray(x), None))
    want = np.asarray(normalize.scale_tensor(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_postprocess_u8_matches_jnp(rng):
    y = rng.normal(size=(2, 40, 40, 1)).astype(np.float32)
    ms = (0.05, 1.2)
    got = np.asarray(pk.postprocess_u8(jnp.asarray(y), ms))
    want = np.asarray(normalize.postprocess_to_u8(jnp.asarray(y), ms))
    np.testing.assert_array_equal(got, want)


def test_pre_post_roundtrip(rng):
    x = rng.integers(1, 255, size=(37, 53), dtype=np.uint8)
    ms = (0.3, 0.7)
    y = pk.preprocess_u8(jnp.asarray(x), ms)
    back = np.asarray(pk.postprocess_u8(y[..., 0], ms))
    np.testing.assert_array_equal(back, x)


def test_leaky_relu_kernel(rng):
    x = rng.normal(size=(11, 130)).astype(np.float32)
    got = np.asarray(pk.leaky_relu_kernel_call(jnp.asarray(x)))
    want = np.where(x >= 0, x, 0.3 * x)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
