"""BDNet — the implicit binary-depth model (flax.linen, NHWC).

Reimplements experiment_modules/bd_model.py:38-449 as a functional net:
- image prior encoder (EfficientNetV2-S default, resnet18d alternative)
- matching encoder on all 8 views (batched; JAX eval-mode BN is
  deterministic, so the reference's unbatched test loop
  (bd_model.py:143-173) is unnecessary)
- metadata feature volume (or dot / zero ablations)
- CVEncoder + dense-skip decoder
- per-scale binary MLP head with sparse train queries
  (run_mlp_train, bd_model.py:313-393) and dense val queries
  (run_mlp_val, bd_model.py:412-449)
- depth-from-binary via bisection (bd_model.py:274-292)
- optional temporal prior channel (sample_prior, bd_model.py:395-410)

Flip augmentation follows the reference's "flip through encoders, not the
cost volume" dance (bd_model.py:207-268): images flipped, matching
features unflipped before the volume, volume re-flipped, decoder features
unflipped at the end. Pose math stays fp32 (bd_model.py:196-204).

Batch layout (NHWC everywhere, leading b):
  cur:  image (b,h,w,3), invK_s{m} (b,4,4), K_s0/invK_s0 (b,4,4),
        world_T_cam/cam_T_world (b,4,4), depth (b,hd,wd,1),
        sampled_rays (b,N,2), sampled_depths (b,N,S),
        rendered_depth (b,hd,wd,P)
  src:  image (b,k,h,w,3), K_s{m} (b,k,4,4),
        world_T_cam/cam_T_world (b,k,4,4)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.core.sampling import grid_sample
from implicit_depth_tpu.models.decoders import (
    BinaryMLPNetwork,
    CVEncoder,
    DecoderPP,
    SkipDecoder,
)
from implicit_depth_tpu.models.image_encoders import EfficientNetV2S, ResNet18D, TinyEncoder
from implicit_depth_tpu.models.fpn_matching import FPNMatchingEncoder
from implicit_depth_tpu.models.matching import ResnetMatchingEncoder
from implicit_depth_tpu.models.resnets import ResNeXt101_64x4d, SEResNeXtAA101d_32x8d
from implicit_depth_tpu.models.volume_mlp import MetadataVolumeMLP
from implicit_depth_tpu.volumes import cost_volume as cv

Array = jnp.ndarray

SCALES = (0, 1, 2, 3)


def maybe_flip(x: Array, flip: Array, w_axis: int) -> Array:
    """Reverses the width axis when `flip` (traced bool) is set."""
    return jnp.where(flip, jnp.flip(x, axis=w_axis), x)


class BDNet(nn.Module):
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
    use_prior: bool = False
    bd_sigmoid_multiplier: float = 1.0
    compute_dtype: Any = jnp.float32
    use_pallas_warp: bool = False  # fused TPU warp kernel (fwd + custom-VJP bwd)
    remat_volume: bool = False  # rematerialise the warp+volume block in bwd
    train_bn: bool = False  # update batch stats (training)
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
            raise ValueError(f"Unknown image encoder {self.image_encoder_name}")

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
            self.decoder = DecoderPP(head_channels=0, dtype=dt)
        elif self.depth_decoder_name == "skip":
            self.decoder = SkipDecoder(dtype=dt)
        else:
            raise ValueError(f"Unknown decoder {self.depth_decoder_name}")
        self.binary_mlp = BinaryMLPNetwork(dtype=dt)

    # ---------------- shared trunk ----------------
    def trunk(self, cur_data: dict, src_data: dict, flip, stop_at: str = "",
              fused_volume: bool = False) -> dict:
        """Encoders + cost volume + U-Net. Returns per-scale decoder
        features (unflipped), lowest-cost depth, and the planes."""
        cur_image = cur_data["image"]
        src_image = src_data["image"]
        b, k = src_image.shape[0], src_image.shape[1]

        flip = jnp.asarray(flip)
        cur_image = maybe_flip(cur_image, flip, 2)
        src_image = maybe_flip(src_image, flip, 3)

        # fp32 pose products (bd_model.py:196-204)
        src_T_cur = jnp.einsum(
            "bkij,bjl->bkil", src_data["cam_T_world"], cur_data["world_T_cam"],
            precision=jax.lax.Precision.HIGHEST,
        )
        cur_T_src = jnp.einsum(
            "bij,bkjl->bkil", cur_data["cam_T_world"], src_data["world_T_cam"],
            precision=jax.lax.Precision.HIGHEST,
        )

        # image prior features on the (possibly flipped) current image
        enc_feats = self.encoder(cur_image.astype(self.compute_dtype))
        if stop_at == "encoder":
            return {"features": enc_feats}

        # matching features for all views in one batch
        all_images = jnp.concatenate([cur_image[:, None], src_image], axis=1)
        flat = all_images.reshape((b * (k + 1),) + all_images.shape[2:])
        mfeats = self.matching(flat.astype(self.compute_dtype))
        mfeats = mfeats.reshape((b, k + 1) + mfeats.shape[1:])
        # unflip matching features before MVS (bd_model.py:225-228)
        mfeats = maybe_flip(mfeats, flip, 3)
        m_cur, m_src = mfeats[:, 0], mfeats[:, 1:]
        if stop_at == "matching":
            return {"features": [m_cur, m_src] + list(enc_feats)}

        planes = geometry.log_depth_planes(
            self.min_matching_depth, self.max_matching_depth, self.num_depth_bins
        )

        if self.feature_volume_type == "zero_cost_volume":
            h, w = m_cur.shape[1], m_cur.shape[2]
            volume = cv.zero_cost_volume(b, self.num_depth_bins, h, w, m_cur.dtype)
            lowest = cv.lowest_cost_depth(volume, planes)
        elif (
            fused_volume
            and self.use_pallas_warp
            and self.mesh is None
            and not self.is_initializing()  # init builds params via the XLA
            # path (the fused kernel reads fc1/fc2 params without calling
            # them, and cannot lower on a CPU init device)
            and self.feature_volume_type == "mlp_feature_volume"
            and m_cur.shape[-1] == 16
            and self.volume_mlp.hidden == 128
        ):
            # eval path on TPU: single fused kernel (warp + metadata + MLP),
            # no (k, d, h, w, ...) intermediates. Forward-only (no VJP).
            volume = self.volume_mlp.fused(
                m_cur, m_src,
                src_data[f"K_s{self.matching_scale}"], src_T_cur,
                cur_data[f"invK_s{self.matching_scale}"], cur_T_src, planes,
            )
            lowest = cv.lowest_cost_depth(volume, planes)
            if stop_at == "volume":
                return {"features": [volume] + list(enc_feats)}
        elif (
            self.use_pallas_warp
            and self.mesh is None
            and not self.is_initializing()
            and self.feature_volume_type == "mlp_feature_volume"
            and m_cur.shape[-1] == 16
            and self.volume_mlp.hidden == 128
        ):
            # TPU training path: fused-kernel PRIMAL + custom VJP that
            # rematerialises the unfused chain in the backward pass — only
            # the inputs are saved (strictly less memory than remat over
            # the unfused chain, and the forward pays the fused kernel's
            # cost instead of the warp->HBM->MLP round-trip)
            volume = self.volume_mlp.fused_train(
                m_cur, m_src,
                src_data[f"K_s{self.matching_scale}"], src_T_cur,
                cur_data[f"invK_s{self.matching_scale}"], cur_T_src, planes,
            )
            lowest = cv.lowest_cost_depth(jax.lax.stop_gradient(volume), planes)
            if stop_at == "volume":
                return {"features": [volume] + list(enc_feats)}
        else:
            vol_fn = type(self)._volume
            if self.remat_volume:
                # recompute the warp + metadata MLP in the backward pass:
                # drops ~0.5 GB/sample of residuals (warped feats, h1) for
                # one extra ~11 ms kernel run — required for the reference's
                # batch-12 training config on a single 16 GB chip
                vol_fn = nn.remat(vol_fn)
            volume = vol_fn(
                self, m_cur, m_src,
                src_data[f"K_s{self.matching_scale}"], src_T_cur,
                cur_data[f"invK_s{self.matching_scale}"], cur_T_src, planes,
            )
            lowest = cv.lowest_cost_depth(jax.lax.stop_gradient(volume), planes)
            if stop_at == "volume":
                return {"features": [volume] + list(enc_feats)}

        # re-flip the volume to align with flipped image features
        volume_bhwd = jnp.moveaxis(volume, 1, -1)  # (b, h, w, d)
        volume_bhwd = maybe_flip(volume_bhwd, flip, 2)

        cv_feats = self.cv_encoder(
            volume_bhwd.astype(self.compute_dtype), enc_feats[self.matching_scale:]
        )
        if stop_at == "cv_encoder":
            return {"features": cv_feats}
        feats = list(enc_feats[: self.matching_scale]) + cv_feats
        dec = self.decoder(feats)  # {scale: (b, hs, ws, c)}
        dec = {s: maybe_flip(f, flip, 2) for s, f in dec.items() if isinstance(s, int)}
        return {"features": dec, "lowest_cost": lowest, "depth_planes": planes}

    def _volume(self, m_cur, m_src, src_K, src_T_cur, cur_invK, cur_T_src, planes):
        wv = cv.build_warped_views(
            m_cur, m_src, src_K, src_T_cur, cur_invK, cur_T_src,
            planes, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas_warp, mesh=self.mesh,
        )
        if self.feature_volume_type == "mlp_feature_volume":
            return self.volume_mlp(wv, m_cur)  # (b, d, h, w)
        return cv.dot_cost_volume(wv)

    # ---------------- query heads ----------------
    def run_mlp_train(self, cur_data: dict, features: dict) -> dict:
        """Sparse ray queries (bd_model.py:313-393).

        Requires cur_data: sampled_rays (b,N,2 pixel coords in gt-depth
        space), sampled_depths (b,N,S), gt_depth (b,hg,wg,1) to sample
        targets from. Prior augmentation uses the 'aug' rng stream.
        """
        gt_depth = cur_data["gt_depth"]
        hg, wg = gt_depth.shape[1], gt_depth.shape[2]
        rays = cur_data["sampled_rays"]  # (b, N, 2)
        depths = cur_data["sampled_depths"]  # (b, N, S)
        num_samples = depths.shape[-1]

        grid = jnp.stack(
            [(rays[..., 0] / wg - 0.5) * 2.0, (rays[..., 1] / hg - 0.5) * 2.0], axis=-1
        )  # (b, N, 2) normalized
        target = grid_sample(gt_depth, grid[:, :, None], mode="bilinear")[:, :, 0, 0]
        # (b, N)

        outputs = {"target_depth": target, "query_depth": depths}

        sampled_feats, sub_depths_all, priors = [], [], []
        for scale in SCALES:
            feat = features[scale]
            sub_grid = grid[:, :: (scale + 1)]
            sub_depths = depths[:, :: (scale + 1)]
            sampled_feat = grid_sample(feat, sub_grid[:, :, None], mode="bilinear")[:, :, 0]
            sampled_feats.append(sampled_feat)  # (b, N', C)
            sub_depths_all.append(sub_depths)   # (b, N', S)
            if self.use_prior:
                sub_target = target[:, :: (scale + 1)]
                dt = sampled_feat.dtype
                prior = (sub_depths < sub_target[..., None]).astype(dt)
                rng = self.make_rng("aug")
                r_off, r_aug = jax.random.split(rng)
                offset = jax.random.uniform(r_off, prior.shape, dt) * 0.45
                prior = jnp.where(prior == 1.0, prior - offset, prior + offset)
                p = jax.random.uniform(r_aug, prior.shape, dt)
                prior = jnp.where(p < 0.5, 1.0 - prior, prior)
                prior = jnp.where(p < 0.25, -1.0, prior)
                priors.append(prior)

        if self.is_initializing():
            # materialise params with the reference concat layout
            model_inputs = []
            for i in range(len(SCALES)):
                x = jnp.concatenate(
                    [sub_depths_all[i][..., None].astype(sampled_feats[i].dtype),
                     jnp.broadcast_to(
                         sampled_feats[i][:, :, None, :],
                         sub_depths_all[i].shape + (sampled_feats[i].shape[-1],))],
                    axis=-1)
                if self.use_prior:
                    x = jnp.concatenate([x, priors[i][..., None]], axis=-1)
                model_inputs.append(x)
            preds = self.binary_mlp(model_inputs)
        else:
            # factored fc0: per-ray feature matmul broadcast across the S
            # samples — exact algebra, skips the (b, N, S, C+2) concat.
            # On TPU the remaining per-sample MLP runs as the fused
            # Pallas ray-head kernel (ops/ray_head.py). mesh gating
            # mirrors the fused-volume path: under a device mesh the
            # pallas_call cannot be auto-partitioned, so the XLA chain
            # (which XLA shards trivially over batch) is used instead.
            preds = self.binary_mlp.factored(
                sampled_feats, sub_depths_all,
                priors if self.use_prior else None,
                use_pallas=self.use_pallas_warp and self.mesh is None)
        outputs.update({k: v[..., 0] for k, v in preds.items()})  # (b, N', S)
        return outputs

    def sample_prior(
        self, rendered_depth: Array, prior_prediction: Array,
        cam_to_world: Array, prior_world_to_cam: Array, K: Array, invK: Array,
    ) -> Array:
        """Warps the previous frame's prediction through the rendered depth
        (bd_model.py:395-410). rendered_depth/prior_prediction: (b,h,w,1)."""
        b, h, w = rendered_depth.shape[:3]
        cur_to_prior = jnp.einsum(
            "bij,bjk->bik", prior_world_to_cam, cam_to_world,
            precision=jax.lax.Precision.HIGHEST,
        )
        pts = geometry.backproject_depth(rendered_depth[..., 0], invK)  # (b,h,w,4)
        cam = geometry.project_points(pts.reshape(b, -1, 4), K, cur_to_prior)
        uv = cam[..., :2].reshape(b, h, w, 2)
        grid = jnp.stack([(uv[..., 0] / w - 0.5) * 2, (uv[..., 1] / h - 0.5) * 2], -1)
        sampled = grid_sample(prior_prediction, grid, mode="nearest")
        z = cam[..., 2].reshape(b, h, w, 1)
        valid = (rendered_depth > 0) & (z > 0)
        return jnp.where(valid, sampled, -1.0)

    def run_mlp_val(self, cur_data: dict, features: dict, rendered_depth: Array) -> Array:
        """Dense queries at scale 0 only (bd_model.py:412-449).
        rendered_depth: (b, h0, w0, 1). Returns logits (b, h0, w0)."""
        feat = features[0]
        x = jnp.concatenate([rendered_depth.astype(feat.dtype), feat], axis=-1)
        if self.use_prior:
            if cur_data.get("prior_prediction") is not None:
                prior = self.sample_prior(
                    cur_data["rendered_depth_full"],
                    cur_data["prior_prediction"],
                    cur_data["world_T_cam"],
                    cur_data["prior_cam_T_world"],
                    cur_data["K_s0"],
                    cur_data["invK_s0"],
                )
            else:
                prior = -jnp.ones_like(rendered_depth)
            x = jnp.concatenate([x, prior.astype(feat.dtype)], axis=-1)
        preds = self.binary_mlp([x], max_scale_only=True)
        return preds["pred_0"][..., 0]

    # ---------------- entry points ----------------
    def __call__(self, cur_data: dict, src_data: dict, flip=False) -> dict:
        """Train forward: trunk + sparse ray queries."""
        t = self.trunk(cur_data, src_data, flip)
        out = self.run_mlp_train(cur_data, t["features"])
        out["lowest_cost"] = t["lowest_cost"]
        return out

    def forward_val(self, cur_data: dict, src_data: dict) -> dict:
        """Dense queries for every rendered-depth channel
        (bd_model.py:293-304). rendered_depth: (b, h0, w0, P)."""
        t = self.trunk(cur_data, src_data, False, fused_volume=True)
        rendered = cur_data["rendered_depth"]
        p = rendered.shape[-1]
        logits = []
        for idx in range(p):
            q = rendered[..., idx: idx + 1]
            data = dict(cur_data)
            data["rendered_depth_full"] = q
            logits.append(self.run_mlp_val(data, t["features"], q))
        out = {
            "pred_0": jnp.stack(logits, axis=-1),  # (b, h0, w0, P)
            "lowest_cost": t["lowest_cost"],
        }
        return out

    def forward_infer_depth(
        self, cur_data: dict, src_data: dict,
        threshold_bins: Optional[Array] = None,
        threshold_values: Optional[Array] = None,
        num_iters: int = 12,
    ) -> dict:
        """Depth from the binary oracle by bisection (bd_model.py:274-292)."""
        t = self.trunk(cur_data, src_data, False, fused_volume=True)
        shape = cur_data["rendered_depth"][..., :1].shape

        def threshold_for(depths):
            if threshold_values is None:
                return 0.5
            idx = jnp.searchsorted(threshold_bins, depths)
            return threshold_values[idx]

        def body(_, carry):
            lo, hi, mid = carry
            logits = self.run_mlp_val(cur_data, t["features"], mid)
            pred = jax.nn.sigmoid(self.bd_sigmoid_multiplier * logits)[..., None]
            visible = pred < threshold_for(mid)
            hi = jnp.where(visible, mid, hi)
            lo = jnp.where(visible, lo, mid)
            return lo, hi, (lo + hi) / 2.0

        lo = jnp.full(shape, 0.5)
        hi = jnp.full(shape, 8.0)
        mid = jnp.full(shape, 7.5 / 2.0)
        lo, hi, mid = jax.lax.fori_loop(0, num_iters, body, (lo, hi, mid))
        return {"search_depths": mid[..., 0], "lowest_cost": t["lowest_cost"]}
