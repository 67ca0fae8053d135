"""Loss library (pure jnp, mask-explicit).

Parity targets (NaN-masking in the reference becomes explicit masks here):
- BD losses (BCE + sharpness regulariser): bd_model.py:451-495
- ScaleInvariantLoss (Eigen SI, lambda=0.85): losses.py:104-116
- MSGradientLoss (4-scale pyramid sobel grads): losses.py:77-101
- NormalsLoss (0.5 * (1 - cos)): losses.py:119-140
- MVDepthLoss (log-L1 of projected depth in source views): losses.py:143-261
- regression cocktail ms + grad + normals + 0.2*mv: depth_model.py:527
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.core.sampling import grid_sample
from implicit_depth_tpu.ops import image as image_ops

Array = jnp.ndarray


def masked_mean(x: Array, mask: Array, eps: float = 1e-10) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)


def bce_with_logits(logits: Array, target: Array, pos_weight: float = 1.0) -> Array:
    """BCEWithLogitsLoss(reduction='none', pos_weight) parity."""
    sp_neg = jax.nn.softplus(-logits)   # -log sigmoid(x)
    sp_pos = jax.nn.softplus(logits)    # -log (1 - sigmoid(x))
    return pos_weight * target * sp_neg + (1.0 - target) * sp_pos


def binary_losses(
    query_depth: Array,     # (b, N, S) train ray samples or (b, h, w, P) dense
    gt_depth: Array,        # broadcastable to query_depth
    preds: dict,            # {"pred_{s}": logits}
    *,
    pos_weight: float = 1.0,
    regularisation_weight: float = 0.5,
    edge_mask: Optional[Array] = None,
    sigmoid_multiplier: float = 1.0,
    train: bool = True,
    subsample_axis: int = 1,
) -> dict:
    """BCE + sharpness regulariser over scales (bd_model.py:451-495).

    target = (query < gt); valid where both depths > 0. Lower scales use
    every (s+1)-th ray along `subsample_axis`.
    """
    target = (query_depth < gt_depth).astype(jnp.float32)
    mask = (gt_depth > 0) & (query_depth > 0)

    losses = {}
    total = 0.0
    scales = (0, 1, 2, 3) if train else (0,)
    for s in scales:
        pred = preds[f"pred_{s}"].astype(jnp.float32)
        if train and s > 0:
            sl = [slice(None)] * target.ndim
            sl[subsample_axis] = slice(None, None, s + 1)
            t_s, m_s = target[tuple(sl)], mask[tuple(sl)]
            e_s = edge_mask[tuple(sl)] if edge_mask is not None else None
        else:
            t_s, m_s, e_s = target, mask, edge_mask
        bce = masked_mean(bce_with_logits(pred, t_s, pos_weight), m_s)
        losses[f"binary_loss/{s}"] = bce
        reg_mask = m_s if e_s is None else (e_s > 0) & m_s
        dist = 2.0 * (0.5 - jnp.abs(jax.nn.sigmoid(sigmoid_multiplier * pred) - 0.5))
        reg = masked_mean(dist, reg_mask)
        losses[f"reg_loss/{s}"] = reg
        total = total + bce + regularisation_weight * reg
    losses["binary_loss"] = total / len(scales)
    losses["loss"] = losses["binary_loss"]
    return losses


def scale_invariant_loss(log_gt: Array, log_pred: Array, mask: Array, si_lambda: float = 0.85) -> Array:
    m = mask.astype(log_gt.dtype)
    n = jnp.maximum(m.sum(), 1e-10)
    diff = (log_gt - log_pred) * m
    mean_sq = jnp.sum(diff * diff) / n
    mean = jnp.sum(diff) / n
    return jnp.sqrt(mean_sq - si_lambda * mean * mean)


def ms_gradient_loss(depth_gt: Array, depth_pred: Array, num_scales: int = 4) -> Array:
    """4-scale sobel gradient L1 (losses.py:77-101). Masks non-finite GT
    gradients (NaN-invalid depths)."""
    gt_pyr = image_ops.pyrdown(depth_gt, num_scales)
    pred_pyr = image_ops.pyrdown(depth_pred, num_scales)
    loss = 0.0
    for g, p in zip(gt_pyr, pred_pyr):
        ggx, ggy = image_ops.spatial_gradient(g)
        pgx, pgy = image_ops.spatial_gradient(p)
        g_grad = jnp.stack([ggx, ggy], axis=-1)
        p_grad = jnp.stack([pgx, pgy], axis=-1)
        finite = jnp.isfinite(g_grad).all(axis=-1, keepdims=True)
        finite = jnp.broadcast_to(finite, g_grad.shape)
        err = jnp.abs(jnp.where(finite, p_grad - g_grad, 0.0))
        loss = loss + masked_mean(err, finite)
    return loss


def normals_loss(normals_gt: Array, normals_pred: Array) -> Array:
    """0.5 * (1 - <n_gt, n_pred>) over finite entries (losses.py:119-140)."""
    finite = (
        jnp.isfinite(normals_gt).all(axis=-1, keepdims=True)
        & jnp.isfinite(normals_pred).all(axis=-1, keepdims=True)
    )
    ng = jnp.where(finite, normals_gt, 1.0)
    np_ = jnp.where(finite, normals_pred, 1.0)
    dot = jnp.sum(ng * np_, axis=-1, keepdims=True)
    return masked_mean(0.5 * (1.0 - dot), finite)


def mv_depth_loss(
    depth_pred: Array,          # (b, h, w, 1)
    src_depth: Array,           # (b, k, h, w, 1)
    cur_invK: Array,            # (b, 4, 4)  scale-0 intrinsics
    src_K: Array,               # (b, k, 4, 4)
    cur_world_T_cam: Array,     # (b, 4, 4)
    src_cam_T_world: Array,     # (b, k, 4, 4)
) -> Array:
    """Multi-view depth consistency (losses.py:143-261).

    Projects predicted depth into each source view; log-L1 against the
    sampled source GT where the prediction is not occluded
    (proj < 1.05 * sampled). NaN source depths are masked out.
    """
    b, h, w, _ = depth_pred.shape
    k = src_depth.shape[1]

    pred_pts = geometry.backproject_depth(depth_pred[..., 0], cur_invK)  # (b,h,w,4)
    world = jnp.einsum(
        "bij,bhwj->bhwi", cur_world_T_cam, pred_pts,
        precision=jax.lax.Precision.HIGHEST,
    )

    def per_view(src_depth_k, src_K_k, src_T_k):
        proj = geometry.project_points(world.reshape(b, -1, 4), src_K_k, src_T_k)
        uv = proj[..., :2].reshape(b, h, w, 2)
        z = proj[..., 2].reshape(b, h, w, 1)
        grid = jnp.stack([2 * uv[..., 0] / w - 1, 2 * uv[..., 1] / h - 1], -1)
        src_nan = jnp.nan_to_num(src_depth_k, nan=0.0)
        sampled = grid_sample(src_nan, grid, mode="nearest")
        valid = (z < 1.05 * sampled) & (z > 0) & (sampled > 0)
        err = jnp.abs(jnp.log(jnp.maximum(sampled, 1e-12)) - jnp.log(jnp.maximum(z, 1e-12)))
        return masked_mean(err, valid)

    losses = jax.vmap(per_view, in_axes=(1, 1, 1))(src_depth, src_K, src_cam_T_world)
    return jnp.mean(losses)


def regression_losses(
    cur_data: dict,
    src_data: dict,
    outputs: dict,
    *,
    dataset: str = "scannet",
) -> dict:
    """The SimpleRecon loss cocktail (depth_model.py:442-540).

    cur_data: depth (b,h,w,1) with NaN invalids, mask (b,h,w,1) bool,
    normals (b,h,w,3), invK_s0, world_T_cam.
    outputs: log_depth_pred_{s} (b,hs,ws,1) per scale, depth_pred_0,
    normals_pred.
    """
    depth_gt = cur_data["depth"]
    mask_b = cur_data["mask"]
    gt_safe = jnp.where(mask_b, depth_gt, 1.0)
    log_gt = jnp.log(gt_safe)
    depth_pred = outputs["depth_pred_0"]
    log_pred = outputs["log_depth_pred_0"]

    h, w = depth_gt.shape[1], depth_gt.shape[2]
    ms_loss = 0.0
    for s in range(4):
        key = f"log_depth_pred_{s}"
        if key not in outputs:
            continue
        lp = outputs[key]
        if lp.shape[1] != h:
            bsz, hs, ws, c = lp.shape
            lp = jax.image.resize(lp, (bsz, h, w, c), method="nearest")
        ms_loss = ms_loss + masked_mean(jnp.abs(log_gt - lp), mask_b) / (2**s)

    abs_loss = masked_mean(jnp.abs(gt_safe - depth_pred), mask_b)
    si = scale_invariant_loss(log_gt, log_pred, mask_b)
    mask_lim = mask_b & (depth_pred > 0.1)
    inv_abs = masked_mean(
        jnp.abs(1.0 / gt_safe - 1.0 / jnp.maximum(depth_pred, 1e-6)), mask_lim
    )
    log_l1 = masked_mean(jnp.abs(log_gt - log_pred), mask_b)

    if dataset == "hypersim":
        grad = jnp.asarray(0.0)
        norm_l = jnp.asarray(0.0)
        mv = jnp.asarray(0.0)
    else:
        grad = ms_gradient_loss(depth_gt, depth_pred)
        norm_l = normals_loss(cur_data["normals"], outputs["normals_pred"])
        mv = mv_depth_loss(
            depth_pred,
            src_data["depth"],
            cur_data["invK_s0"],
            src_data["K_s0"],
            cur_data["world_T_cam"],
            src_data["cam_T_world"],
        )

    loss = ms_loss + grad + norm_l + 0.2 * mv
    return {
        "loss": loss,
        "ms_loss": ms_loss,
        "grad_loss": grad,
        "normals_loss": norm_l,
        "mv_loss": mv,
        "si_loss": si,
        "abs_loss": abs_loss,
        "inv_abs_loss": inv_abs,
        "log_l1_loss": log_l1,
    }
