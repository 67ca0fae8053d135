"""DepthNet — the SimpleRecon-style depth regression model.

Reimplements experiment_modules/depth_model.py:280-440: same trunk as
BDNet but decoding straight to log-depth maps at 4 scales
(DepthDecoderPP heads). Used standalone and as pretrained init for BDNet
(train_bd.py:43-58 lazy loading).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.models.bd_net import maybe_flip
from implicit_depth_tpu.models.decoders import CVEncoder, DecoderPP, SkipDecoder
from implicit_depth_tpu.models.image_encoders import EfficientNetV2S, ResNet18D, TinyEncoder
from implicit_depth_tpu.models.fpn_matching import FPNMatchingEncoder
from implicit_depth_tpu.models.matching import ResnetMatchingEncoder
from implicit_depth_tpu.models.resnets import ResNeXt101_64x4d, SEResNeXtAA101d_32x8d
from implicit_depth_tpu.models.volume_mlp import MetadataVolumeMLP
from implicit_depth_tpu.volumes import cost_volume as cv

Array = jnp.ndarray


class DepthNet(nn.Module):
    image_encoder_name: str = "efficientnet"
    feature_volume_type: str = "mlp_feature_volume"
    depth_decoder_name: str = "unet_pp"
    matching_encoder_type: str = "resnet"
    matching_scale: int = 1
    matching_feature_dims: int = 16
    num_depth_bins: int = 64
    num_src_views: int = 7
    min_matching_depth: float = 0.25
    max_matching_depth: float = 5.0
    compute_dtype: Any = jnp.float32
    use_pallas_warp: bool = False  # fused TPU warp kernel (forward-only)
    train_bn: bool = False
    mesh: Any = None  # jax.sharding.Mesh("data","model"): shard_map the warp

    def setup(self):
        # computation dtype for all conv/dense stacks (params stay f32);
        # None preserves flax promotion (f32) for CPU parity tests
        dt = None if self.compute_dtype == jnp.float32 else self.compute_dtype
        ura = not self.train_bn
        if "efficientnet" in self.image_encoder_name:
            self.encoder = EfficientNetV2S(use_running_average=ura, dtype=dt)
        elif "tiny" in self.image_encoder_name:
            self.encoder = TinyEncoder(dtype=dt)
        elif "resnext101" in self.image_encoder_name:
            self.encoder = ResNeXt101_64x4d(use_running_average=ura, dtype=dt)
        elif "seresnextaa101d" in self.image_encoder_name:
            self.encoder = SEResNeXtAA101d_32x8d(use_running_average=ura, dtype=dt)
        elif "resnet" in self.image_encoder_name:
            self.encoder = ResNet18D(use_running_average=ura, dtype=dt)
        else:
            raise ValueError(self.image_encoder_name)
        if self.matching_encoder_type == "fpn":
            self.matching = FPNMatchingEncoder(
                num_ch_out=self.matching_feature_dims, use_running_average=ura, dtype=dt
            )
        else:
            self.matching = ResnetMatchingEncoder(
                num_ch_out=self.matching_feature_dims, use_running_average=ura, dtype=dt
            )
        if self.feature_volume_type == "mlp_feature_volume":
            self.volume_mlp = MetadataVolumeMLP(
                num_src_views=self.num_src_views,
                matching_dim=self.matching_feature_dims,
                compute_dtype=self.compute_dtype,
            )
        self.cv_encoder = CVEncoder(dtype=dt)
        if self.depth_decoder_name == "unet_pp":
            self.decoder = DecoderPP(head_channels=1, dtype=dt)
        elif self.depth_decoder_name == "skip":
            self.decoder = SkipDecoder(regression_heads=True, dtype=dt)
        else:
            raise ValueError(self.depth_decoder_name)

    def __call__(self, cur_data: dict, src_data: dict, flip=False) -> dict:
        cur_image = cur_data["image"]
        src_image = src_data["image"]
        b, k = src_image.shape[0], src_image.shape[1]

        flip = jnp.asarray(flip)
        cur_image = maybe_flip(cur_image, flip, 2)
        src_image = maybe_flip(src_image, flip, 3)

        src_T_cur = jnp.einsum(
            "bkij,bjl->bkil", src_data["cam_T_world"], cur_data["world_T_cam"],
            precision=jax.lax.Precision.HIGHEST,
        )
        cur_T_src = jnp.einsum(
            "bij,bkjl->bkil", cur_data["cam_T_world"], src_data["world_T_cam"],
            precision=jax.lax.Precision.HIGHEST,
        )

        enc_feats = self.encoder(cur_image.astype(self.compute_dtype))

        all_images = jnp.concatenate([cur_image[:, None], src_image], axis=1)
        flat = all_images.reshape((b * (k + 1),) + all_images.shape[2:])
        mfeats = self.matching(flat.astype(self.compute_dtype))
        mfeats = mfeats.reshape((b, k + 1) + mfeats.shape[1:])
        mfeats = maybe_flip(mfeats, flip, 3)
        m_cur, m_src = mfeats[:, 0], mfeats[:, 1:]

        planes = geometry.log_depth_planes(
            self.min_matching_depth, self.max_matching_depth, self.num_depth_bins
        )
        if self.feature_volume_type == "zero_cost_volume":
            h, w = m_cur.shape[1], m_cur.shape[2]
            volume = cv.zero_cost_volume(b, self.num_depth_bins, h, w, m_cur.dtype)
            lowest = cv.lowest_cost_depth(volume, planes)
        else:
            wv = cv.build_warped_views(
                m_cur, m_src,
                src_data[f"K_s{self.matching_scale}"], src_T_cur,
                cur_data[f"invK_s{self.matching_scale}"], cur_T_src,
                planes, compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas_warp, mesh=self.mesh,
            )
            if self.feature_volume_type == "mlp_feature_volume":
                volume = self.volume_mlp(wv, m_cur)
            else:
                volume = cv.dot_cost_volume(wv)
            lowest = cv.lowest_cost_depth(jax.lax.stop_gradient(volume), planes)

        volume_bhwd = maybe_flip(jnp.moveaxis(volume, 1, -1), flip, 2)
        cv_feats = self.cv_encoder(
            volume_bhwd.astype(self.compute_dtype), enc_feats[self.matching_scale:]
        )
        feats = list(enc_feats[: self.matching_scale]) + cv_feats
        dec = self.decoder(feats)

        outputs: dict = {"lowest_cost": lowest}
        for s in range(4):
            log_depth = dec[s] if self.depth_decoder_name == "unet_pp" else dec[f"log_depth_{s}"]
            log_depth = maybe_flip(log_depth.astype(jnp.float32), flip, 2)
            outputs[f"log_depth_pred_{s}"] = log_depth
            outputs[f"depth_pred_{s}"] = jnp.exp(log_depth)
        return outputs
