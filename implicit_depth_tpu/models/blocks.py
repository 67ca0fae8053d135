"""Shared network blocks (flax.linen, NHWC).

Parity targets in the reference:
- BasicBlock (norm-free, bias convs, LeakyReLU 0.2): modules/layers.py:34-95
- MLP (Linear + LeakyReLU(0.01), optional final act): modules/networks.py:218-233
- InstanceNorm (torch nn.InstanceNorm2d defaults: no affine, eps 1e-5):
  modules/networks.py:281-284
- double_basic_block: modules/networks.py:13-17
- bilinear x2 upsample (utils/generic_utils.py:94-103) and nearest resize.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def leaky_relu02(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


def conv3x3(features: int, stride: int = 1, use_bias: bool = False, name: str | None = None,
            dtype: Any = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1, use_bias=use_bias,
                   name=name, dtype=dtype)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False, name: str | None = None,
            dtype: Any = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding=0, use_bias=use_bias,
                   name=name, dtype=dtype)


class BasicBlock(nn.Module):
    """Norm-free residual block with LeakyReLU(0.2) (modules/layers.py:34-95).

    The reference always instantiates it with norm_layer=Identity, which
    turns on conv biases; stride!=1 or channel change takes a conv
    downsample branch (conv3x3 when strided, conv1x1 otherwise).
    """

    features: int
    stride: int = 1
    dtype: Any = None  # computation dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = conv3x3(self.features, self.stride, use_bias=True, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu02(out)
        out = conv3x3(self.features, 1, use_bias=True, name="conv2", dtype=self.dtype)(out)

        in_ch = x.shape[-1]
        if in_ch != self.features or self.stride != 1:
            ds = conv3x3 if self.stride != 1 else conv1x1
            identity = ds(self.features, self.stride, use_bias=True, name="downsample",
                          dtype=self.dtype)(x)

        return leaky_relu02(out + identity)


class DoubleBasicBlock(nn.Module):
    """BasicBlock x num_repeats (modules/networks.py:13-17)."""

    features: int
    num_repeats: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_repeats):
            x = BasicBlock(self.features, name=f"block{i}", dtype=self.dtype)(x)
        return x


class MLP(nn.Module):
    """Linear stack with LeakyReLU(0.01) between layers
    (modules/networks.py:218-233). Operates on the last axis."""

    channel_list: Sequence[int]  # output features per layer
    disable_final_activation: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = len(self.channel_list)
        for i, ch in enumerate(self.channel_list):
            x = nn.Dense(ch, name=f"fc{i}", dtype=self.dtype)(x)
            if i < n - 1 or not self.disable_final_activation:
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x


def instance_norm(x_bhwc: Array, eps: float = 1e-5) -> Array:
    """torch nn.InstanceNorm2d defaults: per-(sample, channel) over H, W;
    no affine params, biased variance. Statistics always in f32 — a bf16
    spatial variance loses too much precision."""
    x32 = x_bhwc.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x_bhwc.dtype)


def upsample2x_bilinear(x_bhwc: Array) -> Array:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False).

    jax.image.resize's gather lowering measures FASTER on TPU v5e than an
    explicit shift/interleave stencil (decoder section 4.1 ms vs 4.7-5.1;
    roofline r3) — keep the library op."""
    b, h, w, c = x_bhwc.shape
    return jax.image.resize(x_bhwc, (b, 2 * h, 2 * w, c), method="bilinear")


def upsample2x_nearest(x_bhwc: Array) -> Array:
    b, h, w, c = x_bhwc.shape
    return jax.image.resize(x_bhwc, (b, 2 * h, 2 * w, c), method="nearest")


def resize_bilinear(x_bhwc: Array, out_h: int, out_w: int) -> Array:
    """F.interpolate(size=..., mode='bilinear', align_corners=False)."""
    b, _, _, c = x_bhwc.shape
    return jax.image.resize(x_bhwc, (b, out_h, out_w, c), method="bilinear")


def max_pool_same(x_bhwc: Array, window: int, stride: int = 1) -> Array:
    """F.max_pool2d(kernel, stride, padding=kernel//2) used for dilations
    (utils/generic_utils.py:291, binary_metrics_utils.py:26-29)."""
    pad = window // 2
    return nn.max_pool(
        x_bhwc, (window, window), strides=(stride, stride), padding=((pad, pad), (pad, pad))
    )


def sigmoid_custom(x: Array, multiplier: float = 1.0) -> Array:
    """modules/layers.py:138-139."""
    return jax.nn.sigmoid(multiplier * x)
