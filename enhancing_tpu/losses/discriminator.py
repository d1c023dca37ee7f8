"""StyleGAN2 and PatchGAN discriminators, TPU-native (NHWC, flax).

Parity with reference: enhancing/losses/layers.py:52-377. Equalized-LR layers
apply the He-constant at *runtime* (weight drawn N(0,1), multiplied by
1/sqrt(fan_in) in the forward pass) exactly like the reference
(layers.py:163-211); blur-downsampling runs through ops.upfirdn2d and the
fused bias+leaky-ReLU through ops.fused_act — the Pallas equivalents of the
reference's CUDA extensions.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_act import fused_leaky_relu
from ..ops.upfirdn2d import make_blur_kernel, upfirdn2d

randn_init = nn.initializers.normal(stddev=1.0)


class EqualConv2d(nn.Module):
    """Conv with runtime 1/sqrt(fan_in) scaling (reference layers.py:163-184)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("weight", randn_init,
                            (k, k, c_in, self.out_channels))
        scale = 1.0 / math.sqrt(c_in * k * k)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (kernel * scale).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,))
            out = out + bias.astype(self.dtype)
        return out


class EqualLinear(nn.Module):
    """Linear with runtime scaling and optional fused leaky-ReLU activation
    (reference layers.py:187-211)."""

    out_features: int
    use_bias: bool = True
    bias_init_val: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_features, self.out_features))
        scale = (1.0 / math.sqrt(in_features)) * self.lr_mul
        bias = (self.param("bias",
                           nn.initializers.constant(self.bias_init_val),
                           (self.out_features,))
                if self.use_bias else None)
        out = x.astype(self.dtype) @ (weight * scale).astype(self.dtype)
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(out, bias * self.lr_mul)
        elif bias is not None:
            out = out + (bias * self.lr_mul).astype(self.dtype)
        return out


class ConvLayer(nn.Module):
    """[Blur ->] EqualConv2d [-> FusedLeakyReLU] (reference layers.py:214-243)."""

    out_channels: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            blur_k = make_blur_kernel(list(self.blur_kernel))
            x = upfirdn2d(x, blur_k, pad=(pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2

        x = EqualConv2d(self.out_channels, self.kernel_size, stride=stride,
                        padding=padding,
                        use_bias=self.use_bias and not self.activate,
                        dtype=self.dtype, name="conv")(x)
        if self.activate:
            bias = (self.param("act_bias", nn.initializers.zeros,
                               (self.out_channels,))
                    if self.use_bias else jnp.zeros((self.out_channels,)))
            x = fused_leaky_relu(x, bias)
        return x


class StyleBlock(nn.Module):
    """Residual downsample block, skip scaled by 1/sqrt(2)
    (reference layers.py:246-264)."""

    in_channels: int
    out_channels: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ConvLayer(self.in_channels, 3, blur_kernel=self.blur_kernel,
                        dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(self.out_channels, 3, downsample=True,
                        blur_kernel=self.blur_kernel, dtype=self.dtype,
                        name="conv2")(out)
        skip = ConvLayer(self.out_channels, 1, downsample=True,
                         activate=False, use_bias=False,
                         blur_kernel=self.blur_kernel, dtype=self.dtype,
                         name="skip")(x)
        return (out + skip) / math.sqrt(2.0)


def minibatch_stddev(x: jax.Array, group_size: int = 4,
                     num_new_features: int = 1) -> jax.Array:
    """Append the per-group feature stddev as an extra channel
    (reference layers.py:358-371). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    group = b // (b // group)
    y = x.reshape(group, -1, h, w, num_new_features,
                  c // num_new_features)
    std = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)       # (B/g, H, W, nf, C/nf)
    std = jnp.mean(std, axis=(1, 2, 4), keepdims=True)  # (B/g, 1, 1, nf, 1)
    std = std[..., 0]                                # (B/g, 1, 1, nf)
    std = jnp.tile(std, (group, h, w, 1))            # (B, H, W, nf)
    return jnp.concatenate([x, std.astype(x.dtype)], axis=-1)


class StyleDiscriminator(nn.Module):
    """StyleGAN2 discriminator (reference layers.py:322-377). NHWC input."""

    size: int = 256
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cm = self.channel_multiplier
        channels = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                    128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}
        log_size = int(math.log2(self.size))

        out = ConvLayer(channels[self.size], 1, dtype=self.dtype,
                        name="stem")(x)
        in_ch = channels[self.size]
        for i in range(log_size, 2, -1):
            out_ch = channels[2 ** (i - 1)]
            out = StyleBlock(in_ch, out_ch, self.blur_kernel,
                             dtype=self.dtype, name=f"block_{i}")(out)
            in_ch = out_ch

        out = minibatch_stddev(out)
        out = ConvLayer(channels[4], 3, dtype=self.dtype,
                        name="final_conv")(out)
        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(channels[4], activation="fused_lrelu",
                          dtype=self.dtype, name="final_linear1")(out)
        out = EqualLinear(1, dtype=self.dtype, name="final_linear2")(out)
        return jnp.squeeze(out, axis=-1)


class ActNorm(nn.Module):
    """Activation normalization with data-dependent init
    (reference layers.py:52-137). NHWC.

    The reference mutates its loc/scale parameters in-place on the first
    training batch; functionally that is state, so loc/scale live in the
    ``batch_stats`` collection here, initialized from the first batch seen
    with ``train=True`` and a mutable batch_stats collection.
    """

    num_features: int
    logdet: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]
        shape = (1, 1, 1, self.num_features)
        loc = self.variable("batch_stats", "loc", jnp.zeros, shape)
        scale = self.variable("batch_stats", "scale", jnp.ones, shape)
        initialized = self.variable("batch_stats", "initialized",
                                    lambda: jnp.zeros((), jnp.uint8))

        if train and self.is_mutable_collection("batch_stats") \
                and not self.is_initializing():
            flat = x.transpose(3, 0, 1, 2).reshape(self.num_features, -1)
            mean = jnp.mean(flat, axis=1).reshape(shape)
            std = jnp.std(flat, axis=1, ddof=1).reshape(shape)
            first = initialized.value == 0
            loc.value = jnp.where(first, -mean, loc.value)
            scale.value = jnp.where(first, 1.0 / (std + 1e-6), scale.value)
            initialized.value = jnp.ones((), jnp.uint8)

        h = scale.value * (x + loc.value)
        if squeeze:
            h = h[:, 0, 0, :]
        if self.logdet:
            hw = x.shape[1] * x.shape[2]
            logdet = hw * jnp.sum(jnp.log(jnp.abs(scale.value)))
            return h, logdet * jnp.ones(x.shape[0])
        return h


class PatchDiscriminator(nn.Module):
    """Pix2Pix PatchGAN discriminator (reference layers.py:267-319). NHWC."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv_init = nn.initializers.normal(stddev=0.02)

        def norm(h, features, name):
            if self.use_actnorm:
                return ActNorm(features, name=name)(h, train=train)
            return nn.BatchNorm(use_running_average=not train,
                                scale_init=nn.initializers.normal(1.0, 0.02),
                                dtype=self.dtype, name=name)(h)

        kw, padw = 4, 1
        h = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                    kernel_init=conv_init, dtype=self.dtype, name="conv0")(x)
        h = jnp.where(h >= 0, h, 0.2 * h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=2, padding=padw,
                        use_bias=self.use_actnorm, kernel_init=conv_init,
                        dtype=self.dtype, name=f"conv{n}")(h)
            h = norm(h, self.ndf * nf_mult, f"norm{n}")
            h = jnp.where(h >= 0, h, 0.2 * h)

        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=1, padding=padw,
                    use_bias=self.use_actnorm, kernel_init=conv_init,
                    dtype=self.dtype, name=f"conv{self.n_layers}")(h)
        h = norm(h, self.ndf * nf_mult, f"norm{self.n_layers}")
        h = jnp.where(h >= 0, h, 0.2 * h)

        return nn.Conv(1, (kw, kw), strides=1, padding=padw,
                       kernel_init=conv_init, dtype=self.dtype,
                       name="conv_out")(h)
