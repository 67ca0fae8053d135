"""Matching feature encoders (flax.linen, NHWC).

ResnetMatchingEncoder: antialiased ResNet18 stem -> 16-dim features at 1/4
resolution (modules/networks.py:236-287). Structure:
  conv7x7/2 (64) -> BN -> ReLU -> [MaxPool2d(k2, s1) -> BlurPool(filt4, s2)]
  -> layer1 (2x BN BasicBlocks) -> 1x1 conv 128 -> InstanceNorm -> LeakyReLU0.2
  -> 3x3 conv 16 (replicate pad) -> InstanceNorm
The blur-pooled max pool follows antialiased-cnns (Zhang 2019): max pool
with stride 1 (VALID), then a fixed [1,3,3,1] x [1,3,3,1] / 64 depthwise
low-pass with reflect padding and stride 2.

FPNMatchingEncoder (modules/networks.py:290-311): MNASNet-100 backbone +
FeaturePyramidNetwork, output taken at the 1/4-resolution level.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.models.blocks import instance_norm

Array = jnp.ndarray


class BatchNorm(nn.Module):
    """torch-default BatchNorm2d (eps 1e-5, momentum 0.1)."""

    use_running_average: bool = True
    dtype: Any = None  # flax computes half-precision stats in f32 internally

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


def blur_pool(x_bhwc: Array, filt_size: int = 4, stride: int = 2) -> Array:
    """Anti-aliased downsampling: fixed binomial low-pass, depthwise, reflect
    padding, then stride."""
    if filt_size == 4:
        a = np.array([1.0, 3.0, 3.0, 1.0])
    elif filt_size == 3:
        a = np.array([1.0, 2.0, 1.0])
    elif filt_size == 5:
        a = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    else:
        raise ValueError(filt_size)
    k2 = np.outer(a, a)
    k2 = k2 / k2.sum()
    c = x_bhwc.shape[-1]
    kernel = jnp.asarray(k2, x_bhwc.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x_bhwc.dtype)
    pad_l = (filt_size - 1) // 2
    pad_r = int(np.ceil((filt_size - 1) / 2))
    x = jnp.pad(x_bhwc, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class ResnetBlockBN(nn.Module):
    """torchvision-style ResNet BasicBlock: conv-BN-ReLU-conv-BN + skip."""

    features: int
    stride: int = 1
    use_running_average: bool = True
    avg_down: bool = False  # "-d" variant: avg-pool + 1x1 conv shortcut
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        identity = x
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                      use_bias=False, name="conv1", dtype=dt)(x)
        out = BatchNorm(self.use_running_average, dtype=dt, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2",
                      dtype=dt)(out)
        out = BatchNorm(self.use_running_average, dtype=dt, name="bn2")(out)
        if x.shape[-1] != self.features or self.stride != 1:
            identity = x
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
                identity = nn.Conv(self.features, (1, 1), use_bias=False,
                                   name="downsample_conv", dtype=dt)(identity)
            else:
                identity = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                                   use_bias=False, name="downsample_conv", dtype=dt)(identity)
            identity = BatchNorm(self.use_running_average, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResnetMatchingEncoder(nn.Module):
    """ResNet18 stem matching encoder (modules/networks.py:236-287)."""

    num_ch_out: int = 16
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> Array:
        ura, dt = self.use_running_average, self.dtype
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, name="conv1",
                    dtype=dt)(image_bhwc)
        x = BatchNorm(ura, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        # antialiased maxpool: k2 s1 VALID, then blur-pool stride 2
        x = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = blur_pool(x, filt_size=4, stride=2)
        x = ResnetBlockBN(64, use_running_average=ura, dtype=dt, name="layer1_0")(x)
        x = ResnetBlockBN(64, use_running_average=ura, dtype=dt, name="layer1_1")(x)
        x = nn.Conv(128, (1, 1), use_bias=True, name="head_conv1", dtype=dt)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")  # replicate
        x = nn.Conv(self.num_ch_out, (3, 3), padding="VALID", use_bias=True, name="head_conv2",
                    dtype=dt)(xp)
        return instance_norm(x)
