"""FPN matching encoder (parity: modules/networks.py:290-311).

MNASNet-B1 (timm mnasnet_100) backbone + a FeaturePyramidNetwork over
its 5 feature levels; the 1/4-resolution pyramid level ('feat_1') feeds
LeakyReLU(0.2) -> 1x1 conv to 16ch -> InstanceNorm. Slower but more
accurate than the ResNet stem (per the reference's comments,
bd_model.py:120-122).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from implicit_depth_tpu.models.blocks import instance_norm, upsample2x_nearest
from implicit_depth_tpu.models.matching import BatchNorm

Array = jnp.ndarray


class DepthwiseSeparable(nn.Module):
    features: int
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ura, dt = self.use_running_average, self.dtype
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, use_bias=False,
                    name="conv_dw", dtype=dt)(x)
        h = BatchNorm(ura, dtype=dt, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pw", dtype=dt)(h)
        h = BatchNorm(ura, dtype=dt, name="bn2")(h)
        return h


class MnasInvertedResidual(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: int = 3
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ura, dt = self.use_running_average, self.dtype
        in_ch = x.shape[-1]
        mid = in_ch * self.exp_ratio
        k = self.kernel
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw", dtype=dt)(x)
        h = BatchNorm(ura, dtype=dt, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(mid, (k, k), (self.stride, self.stride), padding=k // 2,
                    feature_group_count=mid, use_bias=False, name="conv_dw", dtype=dt)(h)
        h = BatchNorm(ura, dtype=dt, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pwl", dtype=dt)(h)
        h = BatchNorm(ura, dtype=dt, name="bn3")(h)
        if in_ch == self.features and self.stride == 1:
            h = h + x
        return h


class MNASNet100(nn.Module):
    """features_only mnasnet_100: channels (16, 24, 40, 96, 320) at
    strides (2, 4, 8, 16, 32)."""

    use_running_average: bool = True
    num_ch_enc: Sequence[int] = (16, 24, 40, 96, 320)
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> list[Array]:
        ura, dt = self.use_running_average, self.dtype
        feats = []
        x = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False, name="conv_stem",
                    dtype=dt)(image_bhwc)
        x = BatchNorm(ura, dtype=dt, name="bn_stem")(x)
        x = nn.relu(x)
        x = DepthwiseSeparable(16, ura, dt, name="s0_b0")(x)
        feats.append(x)  # /2, 16
        spec = [
            (3, (24, 3, 2, 3)), (3, (40, 5, 2, 3)), (3, (80, 5, 2, 6)),
            (2, (96, 3, 1, 6)), (4, (192, 5, 2, 6)), (1, (320, 3, 1, 6)),
        ]
        taps = {1: 24, 2: 40, 4: 96, 6: 320}  # stage idx -> record feature
        for si, (n, (ch, k, s, e)) in enumerate(spec, start=1):
            for bi in range(n):
                x = MnasInvertedResidual(ch, k, s if bi == 0 else 1, e, ura,
                                         dtype=dt, name=f"s{si}_b{bi}")(x)
            if si in (1, 2, 4, 6):
                feats.append(x)
        return feats


class FPNMatchingEncoder(nn.Module):
    """MNASNet + FPN -> 16-dim matching features at 1/4 resolution."""

    num_ch_out: int = 16
    fpn_channels: int = 32
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, image_bhwc: Array) -> Array:
        dt = self.dtype
        feats = MNASNet100(self.use_running_average, dtype=dt, name="encoder")(image_bhwc)
        # torchvision FPN: lateral 1x1, top-down nearest add, output 3x3
        laterals = [
            nn.Conv(self.fpn_channels, (1, 1), name=f"lateral_{i}", dtype=dt)(f)
            for i, f in enumerate(feats)
        ]
        x = laterals[-1]
        pyramid = [x]
        for i in range(len(laterals) - 2, -1, -1):
            x = laterals[i] + upsample2x_nearest(x)
            pyramid.insert(0, x)
        out = nn.Conv(self.fpn_channels, (3, 3), padding=1, name="output_1", dtype=dt)(pyramid[1])
        out = nn.leaky_relu(out, negative_slope=0.2)
        out = nn.Conv(self.num_ch_out, (1, 1), name="proj", dtype=dt)(out)
        return instance_norm(out)
