"""Building blocks: VALID conv stacks, TF-exact transposed conv, InstanceNorm.

Reproduces reference transfer_em/models/utils.py as Flax modules:

* ``DownBlock``  == ``downsample`` (utils.py:41-85): 3x3 VALID conv + LeakyReLU
  (the "skip" tap), then 4x4 stride-2 VALID conv + LeakyReLU.
* ``UpBlock``    == ``upsample`` (utils.py:89-137): 3x3 VALID conv (2x filters)
  + LeakyReLU, then 4x4 stride-2 SAME transposed conv + Dropout(0.5) +
  LeakyReLU.
* ``InstanceNorm`` == utils.py:10-38.  NOTE: the reference *defines* the layer
  but comments out every call site (utils.py:75-82,124-131; cgan.py:47 marks
  norm_type DEPRECATED).  We keep the same default-off behavior behind
  ``use_norm`` so checkpoints match the reference capability surface.

All activations use LeakyReLU with Keras' default alpha=0.3.
Weights init: Normal(stddev=0.02) matching tf.random_normal_initializer(0, .02).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convs import conv_nd, conv_transpose_nd

LEAKY_SLOPE = 0.3  # Keras LeakyReLU default
WEIGHT_INIT = nn.initializers.normal(stddev=0.02)


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class ConvND(nn.Module):
    """VALID/SAME N-D conv, channels last, TF-style init.

    Kernel stored as (*spatial, Cin, Cout).

    fast_conv: on TPU in bf16 compute mode, route eligible 3x3x3 stride-1
    VALID convs through the Pallas Toeplitz-GEMM kernel
    (ops/pallas_conv.py; ~2x over lax.conv at these channel widths).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: str = "VALID"
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    fast_conv: bool = False
    int8_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = x.ndim - 2
        kshape = (self.kernel_size,) * ndim + (x.shape[-1], self.features)
        kernel = self.param("kernel", WEIGHT_INIT, kshape, jnp.float32)
        y = None
        if self.int8_conv:
            from ..ops.quant import conv_nd_int8
            y = conv_nd_int8(x, kernel, stride=self.stride,
                             padding=self.padding,
                             out_dtype=self.compute_dtype or jnp.float32)
        elif (self.fast_conv and self.compute_dtype == jnp.bfloat16
                and self.kernel_size == 3 and self.stride == 1
                and self.padding == "VALID" and ndim == 3
                and jax.default_backend() == "tpu"):
            from ..ops import pallas_conv
            if pallas_conv.supported(x.shape, kshape):
                y = pallas_conv.tconv3_op(x.astype(jnp.bfloat16),
                                          kernel.astype(jnp.bfloat16))
        if y is None:
            y = conv_nd(x, kernel, stride=self.stride, padding=self.padding,
                        compute_dtype=self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvActND(nn.Module):
    """Conv + LeakyReLU as one module (same param tree as ConvND: a single
    ``kernel`` under the module name, so checkpoints/goldens are unaffected).

    With fast_conv on TPU/bf16 the activation is fused into the Pallas
    Toeplitz GEMM epilogue; otherwise conv_nd + LeakyReLU (which XLA fuses).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: str = "VALID"
    compute_dtype: Optional[jnp.dtype] = None
    fast_conv: bool = False
    int8_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = x.ndim - 2
        kshape = (self.kernel_size,) * ndim + (x.shape[-1], self.features)
        kernel = self.param("kernel", WEIGHT_INIT, kshape, jnp.float32)
        if self.int8_conv:
            from ..ops.quant import conv_nd_int8
            return leaky_relu(conv_nd_int8(
                x, kernel, stride=self.stride, padding=self.padding,
                out_dtype=self.compute_dtype or jnp.float32))
        if (self.fast_conv and self.compute_dtype == jnp.bfloat16
                and self.kernel_size == 3 and self.stride == 1
                and self.padding == "VALID" and ndim == 3
                and jax.default_backend() == "tpu"):
            from ..ops import pallas_conv
            if pallas_conv.supported(x.shape, kshape):
                return pallas_conv.tconv3_act_op(
                    x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16))
        y = conv_nd(x, kernel, stride=self.stride, padding=self.padding,
                    compute_dtype=self.compute_dtype)
        return leaky_relu(y)


class ConvTransposeND(nn.Module):
    """TF-exact stride-2 SAME transposed conv (see ops.convs).

    Kernel stored as (*spatial, Cin, Cout) in the transpose direction; to load
    TF ``Conv*DTranspose`` weights (shape (*spatial, Cout, Cin)) swap the last
    two axes.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    compute_dtype: Optional[jnp.dtype] = None
    int8_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = x.ndim - 2
        kshape = (self.kernel_size,) * ndim + (x.shape[-1], self.features)
        kernel = self.param("kernel", WEIGHT_INIT, kshape, jnp.float32)
        if self.int8_conv:
            from ..ops.quant import conv_transpose_nd_int8
            return conv_transpose_nd_int8(
                x, kernel, stride=self.stride,
                out_dtype=self.compute_dtype or jnp.float32)
        return conv_transpose_nd(x, kernel, stride=self.stride,
                                 compute_dtype=self.compute_dtype)


class InstanceNorm(nn.Module):
    """Instance normalization over spatial axes (reference utils.py:10-38)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.normal(stddev=0.02), (ch,),
                           jnp.float32)
        offset = self.param("offset", nn.initializers.zeros, (ch,), jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # The reference inits scale ~ N(1, 0.02); flax init above is N(0, 0.02),
        # so shift by +1 here to match.
        return (scale + 1.0) * (x - mean) * inv + offset


class DownBlock(nn.Module):
    """3x3 VALID conv -> LeakyReLU (skip tap) -> 4x4 s2 VALID conv -> LeakyReLU.

    ``__call__`` returns (downsampled, skip); reference ``downsample`` returns
    the same pair as two Keras models sharing weights (utils.py:85).
    """

    features: int
    use_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    fast_conv: bool = False
    int8_conv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.use_norm:
            y = ConvND(self.features, 3, compute_dtype=self.compute_dtype,
                       fast_conv=self.fast_conv, int8_conv=self.int8_conv,
                       name="conv")(x)
            y = InstanceNorm(name="norm1")(y)
            skip = leaky_relu(y)
        else:
            skip = ConvActND(self.features, 3,
                             compute_dtype=self.compute_dtype,
                             fast_conv=self.fast_conv,
                             int8_conv=self.int8_conv, name="conv")(x)
        y = ConvND(self.features, 4, stride=2,
                   compute_dtype=self.compute_dtype,
                   int8_conv=self.int8_conv, name="down")(skip)
        if self.use_norm:
            y = InstanceNorm(name="norm2")(y)
        y = leaky_relu(y)
        return y, skip


class UpBlock(nn.Module):
    """3x3 VALID conv (2x filters) -> LeakyReLU -> 4x4 s2 SAME convT ->
    Dropout(0.5) -> LeakyReLU (reference utils.py:89-137)."""

    features: int
    use_norm: bool = False
    apply_dropout: bool = True
    compute_dtype: Optional[jnp.dtype] = None
    fast_conv: bool = False
    int8_conv: bool = False
    dropout_impl: str = "ref"

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.use_norm:
            y = ConvND(self.features * 2, 3,
                       compute_dtype=self.compute_dtype,
                       fast_conv=self.fast_conv, int8_conv=self.int8_conv,
                       name="conv")(x)
            y = InstanceNorm(name="norm1")(y)
            y = leaky_relu(y)
        else:
            y = ConvActND(self.features * 2, 3,
                          compute_dtype=self.compute_dtype,
                          fast_conv=self.fast_conv,
                          int8_conv=self.int8_conv, name="conv")(x)
        y = ConvTransposeND(self.features, 4, 2,
                            compute_dtype=self.compute_dtype,
                            int8_conv=self.int8_conv, name="up")(y)
        if self.apply_dropout:
            if deterministic:
                pass
            elif self.dropout_impl == "rbg8":
                # Dropout(0.5) mask from ONE random byte per element
                # (128/256 == 0.5 exactly; same iid Bernoulli semantics and
                # 1/keep scaling as nn.Dropout).  With an 'rbg'-impl key the
                # XLA RngBitGenerator emits the bytes at measured ~zero cost
                # where threefry bernoulli costs +35-80% of the convT it
                # rides (bench_epilogue.py, PERF.md lever-4 closure); the
                # train step converts the step key to rbg
                # (train/cgan.py compute_losses).
                key = self.make_rng("dropout")
                keep = jax.random.bits(key, y.shape, jnp.uint8) < 128
                y = jnp.where(keep, y * 2.0, jnp.zeros_like(y))
            else:
                y = nn.Dropout(rate=0.5, deterministic=False)(y)
        return leaky_relu(y)
