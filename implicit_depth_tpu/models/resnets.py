"""Bottleneck ResNet family for the image-encoder zoo.

Covers the reference's alternatives (experiment_modules/bd_model.py:52-63):
- resnext101_64x4d: grouped bottlenecks (groups=64, width=4)
- seresnextaa101d_32x8d: SE + anti-aliased downsampling (blur pool) +
  deep stem + avg-down shortcuts (groups=32, width=8)
features_only contract: 5 feature maps at strides (2, 4, 8, 16, 32),
channels (64, 256, 512, 1024, 2048) (stem 128 -> 64? deep-stem variants
tap the stem activation, 64 or 128 ch depending on variant).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from implicit_depth_tpu.models.matching import BatchNorm, blur_pool

Array = jnp.ndarray


class SqueezeExciteR(nn.Module):
    """Classic ResNet-style SE (reduction on block output channels)."""

    rd_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.rd_channels, (1, 1), name="fc1", dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), name="fc2", dtype=self.dtype)(s))
        return x * s


class Bottleneck(nn.Module):
    planes: int           # base planes; output = planes * 4
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    antialias: bool = False
    avg_down: bool = False
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ura, dt = self.use_running_average, self.dtype
        out_ch = self.planes * 4
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        h = nn.Conv(width, (1, 1), use_bias=False, name="conv1", dtype=dt)(x)
        h = BatchNorm(ura, dtype=dt, name="bn1")(h)
        h = nn.relu(h)
        # anti-aliased: stride-1 conv then blur pool
        s = 1 if (self.antialias and self.stride > 1) else self.stride
        h = nn.Conv(width, (3, 3), (s, s), padding=1, use_bias=False,
                    feature_group_count=self.groups, name="conv2", dtype=dt)(h)
        h = BatchNorm(ura, dtype=dt, name="bn2")(h)
        h = nn.relu(h)
        if self.antialias and self.stride > 1:
            h = blur_pool(h, stride=self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=dt)(h)
        h = BatchNorm(ura, dtype=dt, name="bn3")(h)
        if self.use_se:
            h = SqueezeExciteR(max(1, out_ch // 16), dtype=dt, name="se")(h)

        identity = x
        if x.shape[-1] != out_ch or self.stride != 1:
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
                identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                                   name="downsample_conv", dtype=dt)(identity)
            else:
                identity = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                                   use_bias=False, name="downsample_conv", dtype=dt)(identity)
            identity = BatchNorm(ura, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNetBottleneckEncoder(nn.Module):
    """features_only bottleneck ResNet. layers=(3,4,23,3) => 101."""

    layers: Sequence[int] = (3, 4, 23, 3)
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    antialias: bool = False
    deep_stem: bool = False
    avg_down: bool = False
    use_running_average: bool = True
    dtype: Any = None

    @property
    def num_ch_enc(self):
        stem = 128 if self.deep_stem else 64
        return (stem, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, image_bhwc: Array) -> list[Array]:
        ura, dt = self.use_running_average, self.dtype
        feats = []
        x = image_bhwc
        if self.deep_stem:
            for i, ch in enumerate((64, 64, 128)):
                x = nn.Conv(ch, (3, 3), (2, 2) if i == 0 else (1, 1), padding=1,
                            use_bias=False, name=f"stem_conv{i}", dtype=dt)(x)
                x = BatchNorm(ura, dtype=dt, name=f"stem_bn{i}")(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, name="conv1", dtype=dt)(x)
            x = BatchNorm(ura, dtype=dt, name="bn1")(x)
            x = nn.relu(x)
        feats.append(x)  # /2
        if self.antialias:
            x = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
            x = blur_pool(x, stride=2)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = (64, 128, 256, 512)
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            for bi in range(n):
                x = Bottleneck(
                    p, stride=2 if (bi == 0 and li > 0) else 1,
                    groups=self.groups, base_width=self.base_width,
                    use_se=self.use_se, antialias=self.antialias,
                    avg_down=self.avg_down, use_running_average=ura,
                    dtype=dt, name=f"layer{li + 1}_{bi}",
                )(x)
            feats.append(x)
        return feats


def ResNeXt101_64x4d(use_running_average: bool = True, dtype: Any = None) -> ResNetBottleneckEncoder:
    return ResNetBottleneckEncoder(
        layers=(3, 4, 23, 3), groups=64, base_width=4,
        use_running_average=use_running_average, dtype=dtype,
    )


def SEResNeXtAA101d_32x8d(use_running_average: bool = True, dtype: Any = None) -> ResNetBottleneckEncoder:
    return ResNetBottleneckEncoder(
        layers=(3, 4, 23, 3), groups=32, base_width=8,
        use_se=True, antialias=True, deep_stem=True, avg_down=True,
        use_running_average=use_running_average, dtype=dtype,
    )
