"""Image prior encoders (features_only pyramids, flax.linen, NHWC).

EfficientNetV2S mirrors timm `tf_efficientnetv2_s_in21ft1k` features_only
(the reference default image encoder, experiment_modules/bd_model.py:46-51):
TF SAME padding, BN eps 1e-3, SiLU, stages

    stem conv3x3/2 24
    s0: ConvBnAct      r2  k3 s1 e1 c24  (skip)
    s1: EdgeResidual   r4  k3 s2 e4 c48
    s2: EdgeResidual   r4  k3 s2 e4 c64
    s3: InvertedResid. r6  k3 s2 e4 c128 se0.25
    s4: InvertedResid. r9  k3 s1 e6 c160 se0.25
    s5: InvertedResid. r15 k3 s2 e6 c256 se0.25

with feature taps after s0, s1, s2, s4, s5 -> channels (24, 48, 64, 160,
256) at strides (2, 4, 8, 16, 32).

ResNet18D mirrors timm `resnet18d` features_only (bd_model.py:65-68):
deep 3x3 stem (32, 32, 64), maxpool 3x3/2, standard BasicBlock layers
with avg-pool downsample; channels (64, 64, 128, 256, 512).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from implicit_depth_tpu.models.matching import ResnetBlockBN

Array = jnp.ndarray


class BatchNormTF(nn.Module):
    """BN with TF-efficientnet eps (1e-3)."""

    use_running_average: bool = True
    dtype: Any = None  # flax computes half-precision stats in f32 internally

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.BatchNorm(
            use_running_average=self.use_running_average, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype,
        )(x)


class SqueezeExcite(nn.Module):
    """EfficientNet SE: reduction relative to the block *input* channels."""

    rd_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), name="conv_reduce", dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand", dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class ConvBnAct(nn.Module):
    features: int
    stride: int = 1
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        skip = x.shape[-1] == self.features and self.stride == 1
        shortcut = x
        x = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn1")(x)
        x = nn.silu(x)
        return x + shortcut if skip else x


class EdgeResidual(nn.Module):
    """Fused-MBConv: expand 3x3 conv + project 1x1."""

    features: int
    exp_ratio: int = 4
    stride: int = 1
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        skip = in_ch == self.features and self.stride == 1
        shortcut = x
        mid = in_ch * self.exp_ratio
        x = nn.Conv(mid, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv_exp", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pwl", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn2")(x)
        return x + shortcut if skip else x


class InvertedResidual(nn.Module):
    """MBConv with SE."""

    features: int
    exp_ratio: int = 4
    stride: int = 1
    se_ratio: float = 0.25
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        skip = in_ch == self.features and self.stride == 1
        shortcut = x
        mid = in_ch * self.exp_ratio
        x = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn1")(x)
        x = nn.silu(x)
        x = nn.Conv(mid, (3, 3), (self.stride, self.stride), padding="SAME",
                    use_bias=False, feature_group_count=mid, name="conv_dw", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn2")(x)
        x = nn.silu(x)
        x = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pwl", dtype=self.dtype)(x)
        x = BatchNormTF(self.use_running_average, dtype=self.dtype, name="bn3")(x)
        return x + shortcut if skip else x


class EfficientNetV2S(nn.Module):
    """features_only EfficientNetV2-S. Returns 5 feature maps."""

    use_running_average: bool = True
    num_ch_enc: Sequence[int] = (24, 48, 64, 160, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> list[Array]:
        ura, dt = self.use_running_average, self.dtype
        feats = []
        x = nn.Conv(24, (3, 3), (2, 2), padding="SAME", use_bias=False, name="conv_stem",
                    dtype=dt)(image_bhwc)
        x = BatchNormTF(ura, dtype=dt, name="bn1")(x)
        x = nn.silu(x)
        for i in range(2):
            x = ConvBnAct(24, 1, ura, dt, name=f"s0_b{i}")(x)
        feats.append(x)  # /2, 24
        for i in range(4):
            x = EdgeResidual(48, 4, 2 if i == 0 else 1, ura, dt, name=f"s1_b{i}")(x)
        feats.append(x)  # /4, 48
        for i in range(4):
            x = EdgeResidual(64, 4, 2 if i == 0 else 1, ura, dt, name=f"s2_b{i}")(x)
        feats.append(x)  # /8, 64
        for i in range(6):
            x = InvertedResidual(128, 4, 2 if i == 0 else 1, 0.25, ura, dt, name=f"s3_b{i}")(x)
        for i in range(9):
            x = InvertedResidual(160, 6, 1, 0.25, ura, dt, name=f"s4_b{i}")(x)
        feats.append(x)  # /16, 160
        for i in range(15):
            x = InvertedResidual(256, 6, 2 if i == 0 else 1, 0.25, ura, dt, name=f"s5_b{i}")(x)
        feats.append(x)  # /32, 256
        return feats


class TinyEncoder(nn.Module):
    """Small 5-level pyramid for tests and fast experimentation (no
    reference counterpart). Same features_only contract as the real
    encoders."""

    use_running_average: bool = True  # unused; kept for a uniform interface
    num_ch_enc: Sequence[int] = (16, 24, 32, 48, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> list[Array]:
        feats = []
        x = image_bhwc
        for i, ch in enumerate(self.num_ch_enc):
            x = nn.Conv(ch, (3, 3), (2, 2), padding=1, name=f"conv{i}", dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            feats.append(x)
        return feats


class ResNet18D(nn.Module):
    """features_only resnet18d. Returns 5 feature maps,
    channels (64, 64, 128, 256, 512) at strides (2, 4, 8, 16, 32)."""

    use_running_average: bool = True
    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> list[Array]:
        from implicit_depth_tpu.models.matching import BatchNorm

        ura, dt = self.use_running_average, self.dtype
        feats = []
        x = image_bhwc
        for i, ch in enumerate((32, 32, 64)):
            x = nn.Conv(ch, (3, 3), (2, 2) if i == 0 else (1, 1), padding=1,
                        use_bias=False, name=f"stem_conv{i}", dtype=dt)(x)
            x = BatchNorm(ura, dtype=dt, name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        feats.append(x)  # /2, 64
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (ch, n, stride) in enumerate(((64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2))):
            for bi in range(n):
                x = ResnetBlockBN(ch, stride if bi == 0 else 1, ura, avg_down=True,
                                  dtype=dt, name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
        return feats
