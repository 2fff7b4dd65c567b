"""Unit tests for losses, normalization, augmentation, warping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.ops import augment as aug
from transfer_em_tpu.ops import losses, normalize, warp
from transfer_em_tpu.ops.convs import (
    asymmetric_center_crop, center_crop, conv_nd, conv_transpose_nd,
    same_transpose_padding, zero_pad,
)


# ---------------------------------------------------------------- focal loss

def _np_sigmoid_focal(labels, preds, alpha=0.5, gamma=2.0, from_logits=True):
    """Independent numpy reimplementation of tfa sigmoid_focal_crossentropy
    with Reduction.AUTO (sum over channel, mean over rest)."""
    labels = labels.astype(np.float64)
    preds = preds.astype(np.float64)
    if from_logits:
        p = 1 / (1 + np.exp(-preds))
        ce = np.maximum(preds, 0) - preds * labels + np.log1p(np.exp(-np.abs(preds)))
    else:
        # Keras-3 BCE clips and adds eps inside the log; p_t uses RAW preds
        # (tfa semantics, measured vs tf.keras 3.13 — see losses.py).
        pc = np.clip(preds, 1e-7, 1 - 1e-7)
        ce = -(labels * np.log(pc + 1e-7) + (1 - labels) * np.log(1 - pc + 1e-7))
        p = preds
    p_t = labels * p + (1 - labels) * (1 - p)
    alpha_t = labels * alpha + (1 - labels) * (1 - alpha)
    focal = alpha_t * (1 - p_t) ** gamma * ce
    return np.mean(np.sum(focal, axis=-1))


def test_focal_ce_logits_matches_formula(rng):
    logits = rng.normal(size=(4, 6, 6, 1)).astype(np.float32)
    labels = (rng.uniform(size=logits.shape) > 0.5).astype(np.float32)
    got = losses.sigmoid_focal_ce(jnp.asarray(labels), jnp.asarray(logits))
    want = _np_sigmoid_focal(labels, logits)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_focal_ce_probs_matches_formula(rng):
    probs = rng.uniform(size=(4, 6, 6, 1)).astype(np.float32)
    labels = np.ones_like(probs)
    got = losses.sigmoid_focal_ce(jnp.asarray(labels), jnp.asarray(probs),
                                  from_logits=False)
    want = _np_sigmoid_focal(labels, probs, from_logits=False)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_focal_ce_probs_out_of_range_matches_tf():
    """tconf = 1 - |real-cycled|/2 goes outside [0,1] for badly diverged
    voxels; tfa clips only the CE term and computes p_t from the RAW preds,
    so value AND gradient must survive out-of-range inputs.  Expected values
    measured against tf.keras 3.13 + the tfa stub (2026-08-19)."""
    y_true = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    y_pred = jnp.asarray([[-0.5, 0.5, 1.5, 1.2]])
    got = losses.sigmoid_focal_ce(y_true, y_pred, from_logits=False)
    np.testing.assert_allclose(float(got), 28.479643, rtol=1e-5)
    g = jax.grad(lambda p: losses.sigmoid_focal_ce(y_true, p,
                                                   from_logits=False))(y_pred)
    np.testing.assert_allclose(
        np.asarray(g), [[-23.137423, -0.5965734, 0.0, 18.399887]], rtol=1e-4)


def test_focal_gamma_zero_is_alpha_weighted_ce(rng):
    """With gamma=0, focal CE reduces to alpha-weighted sigmoid CE."""
    logits = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
    labels = np.ones_like(logits)
    got = losses.sigmoid_focal_ce(jnp.asarray(labels), jnp.asarray(logits),
                                  gamma=0.0)
    ce = np.maximum(logits, 0) - logits + np.log1p(np.exp(-np.abs(logits)))
    np.testing.assert_allclose(float(got), 0.5 * ce.mean(), rtol=1e-5)


def test_composite_losses_factors(rng):
    """Check the reference's x2 / LAMBDA factors (cgan.py:110-142)."""
    logit = jnp.asarray(rng.normal(size=(2, 3, 3, 1)).astype(np.float32))
    base_ones = losses.sigmoid_focal_ce(jnp.ones_like(logit), logit)
    base_zeros = losses.sigmoid_focal_ce(jnp.zeros_like(logit), logit)
    np.testing.assert_allclose(float(losses.generator_adv_loss(logit)),
                               float(base_ones) * 2, rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.discriminator_loss(logit, logit)),
        float(base_ones * 2 + base_zeros * 2) * 0.5, rtol=1e-6)
    a = jnp.asarray(rng.uniform(-1, 1, size=(2, 4, 4, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(2, 4, 4, 1)).astype(np.float32))
    tconf = 1 - jnp.abs(a - b) / 2
    base = losses.sigmoid_focal_ce(jnp.ones_like(tconf), tconf,
                                   from_logits=False)
    np.testing.assert_allclose(float(losses.cycle_loss(a, b)),
                               float(base) * 4, rtol=1e-6)
    np.testing.assert_allclose(float(losses.identity_loss(a, b)),
                               float(base) * 2, rtol=1e-6)


def test_identical_images_zero_cycle_loss():
    a = jnp.zeros((1, 8, 8, 1))
    # tconf == 1 everywhere -> CE ~ -log(1-eps) ~ 0
    assert float(losses.cycle_loss(a, a)) < 1e-5


# ---------------------------------------------------------------- normalize

def test_scale_roundtrip(rng):
    x = rng.integers(0, 256, size=(7, 7), dtype=np.uint8)
    scaled = normalize.scale_tensor(jnp.asarray(x))
    assert scaled.shape == (7, 7, 1)
    assert float(scaled.min()) >= -1 and float(scaled.max()) <= 1
    back = normalize.unscale_to_uint8(scaled)
    np.testing.assert_array_equal(np.asarray(back)[..., 0], x)


def test_standardize_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(5, 5, 1)).astype(np.float32))
    ms = (0.3, 1.7)
    y = normalize.standardize_population(x, ms)
    np.testing.assert_allclose(
        np.asarray(normalize.unstandardize_population(y, ms)), np.asarray(x),
        rtol=1e-5, atol=1e-6)


def test_get_meanstd_mean_of_variances_semantics(rng):
    """The reference averages per-element variances (datasets.py:173-190)."""
    els = [rng.normal(loc=i, size=(16, 16, 1)).astype(np.float32)
           for i in range(3)]
    mean, std = normalize.get_meanstd(els)
    want_mean = np.mean([e.mean() for e in els])
    want_std = np.sqrt(np.mean([e.var() for e in els]))
    np.testing.assert_allclose(mean, want_mean, rtol=1e-4)
    np.testing.assert_allclose(std, want_std, rtol=1e-4)


def test_preprocess_u8_matches_two_step(rng):
    x = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    ms = (0.1, 0.9)
    fused = normalize.preprocess_u8(jnp.asarray(x), ms)
    two = normalize.standardize_population(
        normalize.scale_tensor(jnp.asarray(x)), ms)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                               rtol=1e-5, atol=1e-6)


def test_postprocess_inverts_preprocess(rng):
    x = rng.integers(1, 255, size=(6, 6), dtype=np.uint8)
    ms = (0.05, 1.2)
    y = normalize.preprocess_u8(jnp.asarray(x), ms)
    back = normalize.postprocess_to_u8(y, ms)
    np.testing.assert_array_equal(np.asarray(back)[..., 0], x)


# ---------------------------------------------------------------- conv ops

def test_center_crop_and_pad():
    x = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
    c = center_crop(x, 2)
    assert c.shape == (1, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(c)[0, :, :, 0],
                                  np.asarray(x)[0, 2:4, 2:4, 0])
    p = zero_pad(c, 1)
    assert p.shape == (1, 4, 4, 1)
    assert float(p[0, 0, 0, 0]) == 0


def test_asymmetric_crop_odd():
    x = jnp.zeros((1, 7, 7, 1))
    c = asymmetric_center_crop(x, 4)  # total crop 3 -> (1, 2)
    assert c.shape == (1, 4, 4, 1)


def test_same_transpose_padding():
    assert same_transpose_padding(4, 2) == (2, 2)
    # k=3,s=2: p_total=1, lo=0, hi=1 -> (2, 1)
    assert same_transpose_padding(3, 2) == (2, 1)


def test_conv_transpose_doubles_size(rng):
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 4, 2, 3)).astype(np.float32))
    y = conv_transpose_nd(x, k, stride=2)
    assert y.shape == (1, 10, 10, 3)
    x3 = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 2)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(4, 4, 4, 2, 3)).astype(np.float32))
    assert conv_transpose_nd(x3, k3, stride=2).shape == (1, 10, 10, 10, 3)


def test_conv_transpose_is_adjoint_of_same_conv(rng):
    """TF defines convT as the input-gradient of a SAME strided conv; check
    <conv(x), y> == <x, convT(y)> with the tied kernel."""
    from jax import lax
    kernel = jnp.asarray(rng.normal(size=(4, 4, 3, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 5, 5, 2)).astype(np.float32))

    def fwd(v):
        return conv_nd(v, kernel, stride=2, padding="SAME")

    # adjoint via vjp
    _, vjp = jax.vjp(fwd, x)
    adj_y = vjp(y)[0]
    # our convT with kernel mapping Cin=2 -> Cout=3 must equal the adjoint
    # when given the swapped kernel
    k_t = jnp.swapaxes(kernel, -1, -2)  # (4,4,2,3)
    got = conv_transpose_nd(y, k_t, stride=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(adj_y),
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_phase_decomposition_matches(rng):
    """The subpixel/phase formulation (one k=3 conv + interleave, the TPU
    fast path) equals the lhs_dilation formulation, 2D and 3D, values and
    gradients."""
    for shape, kshape in (((2, 5, 5, 3), (4, 4, 3, 2)),
                          ((2, 5, 6, 7, 3), (4, 4, 4, 3, 2))):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        k = jnp.asarray(rng.normal(size=kshape).astype(np.float32))
        ref = conv_transpose_nd(x, k, stride=2, phase_decompose=False)
        got = conv_transpose_nd(x, k, stride=2, phase_decompose=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn):
            return lambda x_, k_: jnp.sum(
                conv_transpose_nd(x_, k_, stride=2, phase_decompose=fn) ** 2)

        gx_r, gk_r = jax.grad(loss(False), argnums=(0, 1))(x, k)
        gx_p, gk_p = jax.grad(loss(True), argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                                   rtol=1e-4, atol=1e-4)


def test_conv_transpose_phase_rejects_unsupported():
    x = jnp.zeros((1, 5, 5, 2))
    k3 = jnp.zeros((3, 3, 2, 2))
    with pytest.raises(ValueError):
        conv_transpose_nd(x, k3, stride=2, phase_decompose=True)


# ---------------------------------------------------------------- augment

def test_augment_deterministic_per_key(rng):
    x = jnp.asarray(rng.normal(size=(8, 8, 1)).astype(np.float32))
    k = jax.random.PRNGKey(3)
    a1 = aug.augment(x, k)
    a2 = aug.augment(x, k)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_augment_is_affine_permutation(rng):
    """Transpose+flip permutes voxels; the jitter is affine — so the sorted
    voxel multiset matches an affine map of the sorted input."""
    x = jnp.asarray(rng.normal(size=(6, 6, 6, 1)).astype(np.float32))
    a = aug.augment(x, jax.random.PRNGKey(7))
    xs = np.sort(np.asarray(x).ravel())
    as_ = np.sort(np.asarray(a).ravel())
    # solve a = v*x + m for the two extreme points, then check all
    v = (as_[-1] - as_[0]) / (xs[-1] - xs[0])
    m = as_[0] - v * xs[0]
    assert 1.0 <= v <= 1.05
    assert -0.051 <= m <= 0.051 + 0.05  # mean_adj bounded
    np.testing.assert_allclose(as_, v * xs + m, rtol=1e-4, atol=1e-5)


def test_batch_augment_shape(rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 1)).astype(np.float32))
    out = aug.batch_augment(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    # elements augmented independently
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


# ---------------------------------------------------------------- warp

def test_warp_blurs_and_preserves_shape(rng):
    x = jnp.asarray(rng.uniform(-1, 1, size=(32, 32, 1)).astype(np.float32))
    w = warp.warp(x, jax.random.PRNGKey(0))
    assert w.shape == x.shape
    # blur reduces total variation
    tv = lambda t: float(jnp.abs(jnp.diff(t[..., 0], axis=0)).sum())
    assert tv(w) < tv(x)


def test_warp_holes_filled_with_mean():
    x = jnp.ones((64, 64, 1), dtype=jnp.float32)
    # Constant image: blur is identity in the interior (SAME zero-padding
    # darkens the 1-voxel border, same as the TF reference); holes fill with
    # the image mean which is ~1, so the interior stays ~mean.
    w = warp.warp(x, jax.random.PRNGKey(1))
    interior = np.asarray(w)[1:-1, 1:-1, :]
    mean = float(np.asarray(w).mean())
    np.testing.assert_allclose(interior, np.full_like(interior, 1.0),
                               atol=1.0 - mean + 1e-5)


def test_warp_3d(rng):
    x = jnp.asarray(rng.uniform(-1, 1, size=(16, 16, 16, 1)).astype(np.float32))
    w = warp.warp(x, jax.random.PRNGKey(2))
    assert w.shape == x.shape


def test_warp_map_reproducible(rng):
    # 128x128 so the expected hole count (rate 4/128^2) is ~4 > 0.
    x = jnp.asarray(rng.uniform(-1, 1, size=(128, 128, 1)).astype(np.float32))
    m1 = warp.make_warp_map(seed=5)
    m2 = warp.make_warp_map(seed=5)
    np.testing.assert_array_equal(np.asarray(m1(x, 3)), np.asarray(m2(x, 3)))
    diff = any(not np.array_equal(np.asarray(m1(x, 3)), np.asarray(m1(x, i)))
               for i in range(4, 12))
    assert diff  # some index in the stream must place holes differently


# ---------------------------------------------------------------- metrics

def test_rmse_and_psnr():
    a = jnp.zeros((4, 4))
    b = jnp.ones((4, 4)) * 0.5
    np.testing.assert_allclose(float(losses.rmse(a, b)), 0.5, rtol=1e-6)
    # PSNR of 0.5 RMSE with peak 2: 10*log10(4/0.25) = 12.04
    np.testing.assert_allclose(float(losses.psnr(a, b)), 12.0412, rtol=1e-4)
