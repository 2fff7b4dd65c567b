"""Toeplitz-GEMM conv kernel: correctness vs lax (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.ops.convs import conv_nd
from transfer_em_tpu.ops.pallas_conv import supported, tconv3, tconv3_op


def test_supported_table():
    assert supported((1, 18, 18, 18, 8), (3, 3, 3, 8, 8))
    assert supported((1, 10, 10, 10, 32), (3, 3, 3, 32, 16))
    assert supported((1, 12, 12, 128, 1), (3, 3, 3, 1, 8))
    assert not supported((1, 18, 18, 18, 3), (3, 3, 3, 3, 8))   # C not pow2
    assert not supported((1, 18, 18, 8), (3, 3, 8, 8))          # 2D
    assert not supported((1, 18, 18, 18, 8), (4, 4, 4, 8, 8))   # k != 3
    assert not supported((1, 18, 18, 10, 8), (3, 3, 3, 8, 8))   # W < WT+2


@pytest.mark.parametrize("shape", [
    (1, 18, 18, 18, 8, 8),
    (2, 16, 16, 16, 16, 8),
    (1, 10, 10, 10, 32, 16),
])
def test_forward_matches_lax(rng, shape):
    b, d, h, w_, c, o = shape
    x = jnp.asarray(rng.normal(0, 1, (b, d, h, w_, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, c, o)).astype(np.float32))
    y_ref = conv_nd(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    stride=1, padding="VALID")
    y = tconv3(x, w)
    assert y.shape == y_ref.shape
    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y, np.float32)
    rel = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
    assert rel < 0.01, rel  # bf16 accumulation-order noise


def test_gradients_match_lax(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 10, 10, 10, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 8, 8)).astype(np.float32))
    g1 = jax.grad(lambda a, b: jnp.sum(tconv3_op(a, b) ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda a, b: jnp.sum(
        conv_nd(a, b, stride=1, padding="VALID") ** 2), argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        rel = (np.max(np.abs(np.asarray(a) - np.asarray(b)))
               / max(float(jnp.max(jnp.abs(b))), 1e-9))
        assert rel < 0.02, rel


def test_leaky_epilogue(rng):
    import jax.numpy as jnp
    x = jnp.asarray(rng.normal(0, 1, (1, 10, 10, 18, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 8, 8)).astype(np.float32))
    plain = np.asarray(tconv3(x, w), np.float32)
    fused = np.asarray(tconv3(x, w, leaky=0.3), np.float32)
    want = np.where(plain >= 0, plain, plain * 0.3)
    np.testing.assert_allclose(fused, want, atol=2e-2, rtol=2e-2)
