"""Occlusion / binary-depth evaluation (parity: utils/binary_metrics_utils.py).

All score math is jnp and jittable; NaN-masked reductions mirror the
reference exactly (including nan-of-empty IoU bins that the averagers
later skip with nanmean).

Layouts are NHWC-ish: gt depth (b, h, w, 1); query depth and predictions
(b, h, w, d) with d = query planes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.image import max_pool_dilate

Array = jnp.ndarray

DEFAULT_PLANES = tuple(1.5 + 0.5 * x for x in range(8))
DEFAULT_THRESHOLDS = tuple(np.linspace(0.3, 0.7, 5))


def get_boundary_mask(depth_bhw1: Array, rendered_bhwd: Array) -> Array:
    """Dilated occlusion-boundary mask (binary_metrics_utils.py:23-32).
    depth NaN marks invalid; returns float with NaN at invalid pixels
    folded in as 0/NaN like the reference."""
    invalid = jnp.isnan(depth_bhw1)
    target = (rendered_bhwd < depth_bhw1).astype(jnp.float32)
    edges = max_pool_dilate(target, 3) - target
    edges = jnp.where(invalid, 0.0, edges)
    dilated = max_pool_dilate(edges, 7)
    dilated = jnp.where(invalid, jnp.nan, dilated)
    return (dilated > 0).astype(jnp.float32)


def get_surface_mask(depth_bhw1: Array, rendered_bhwd: Array, threshold: float = 0.05) -> Array:
    """|gt - q| / gt < threshold (binary_metrics_utils.py:35-39)."""
    return (jnp.abs(depth_bhw1 - rendered_bhwd) / depth_bhw1 < threshold).astype(jnp.float32)


class Thresholder:
    """Per-depth-bin decision thresholds (binary_metrics_utils.py:42-52)."""

    def __init__(self, planes: Array, thresholds: Array):
        planes = jnp.asarray(planes)
        bins = jnp.zeros_like(planes)
        bins = bins.at[:-1].set((planes[1:] + planes[:-1]) / 2.0)
        bins = bins.at[-1].set(100.0)
        self.bins = bins
        self.thresholds = jnp.asarray(thresholds)

    def get_thresholds(self, query_depth: Array) -> Array:
        idx = jnp.searchsorted(self.bins, query_depth, side="right")
        return self.thresholds[idx]


def _iou_terms(pred_bdN: Array, target_bdN: Array):
    inter = jnp.nansum(pred_bdN * target_bdN, axis=2)
    t_cnt = jnp.nansum(target_bdN, axis=2)
    p_cnt = jnp.nansum(pred_bdN, axis=2)
    union = t_cnt + p_cnt - inter
    return inter / union


def _flatten_dN(x_bhwd: Array) -> Array:
    """(b, h, w, d) -> (b, d, N)."""
    b, h, w, d = x_bhwd.shape
    return jnp.transpose(x_bhwd, (0, 3, 1, 2)).reshape(b, d, h * w)


def plane_scores(
    query_bhwd: Array,
    gt_bhw1: Array,
    pred_bhwd: Array,
    threshold,
    extra_mask_bhwd: Optional[Array] = None,
) -> dict:
    """Pos/neg/harmonic IoU per (batch, plane) at a given threshold
    (binary_metrics_utils.py:59-125 / 127-192). `threshold` may be a
    scalar or a per-element array (Thresholder output). `extra_mask`
    restricts scoring (surface/boundary variants, test_bd.py:286-318).

    Returns {"iou": (b, d), "iou_pos": (b, d), "iou_neg": (b, d)}.
    """
    gt = jnp.broadcast_to(gt_bhw1, query_bhwd.shape)
    valid = (gt > 0) & (query_bhwd > 0) & ~jnp.isnan(gt)
    if extra_mask_bhwd is not None:
        valid = valid & (extra_mask_bhwd > 0) & ~jnp.isnan(extra_mask_bhwd)

    valid_bdN = _flatten_dN(valid.astype(jnp.float32)) > 0
    target_bdN = _flatten_dN((query_bhwd < gt).astype(jnp.float32))
    pred_bdN = _flatten_dN(pred_bhwd)
    if isinstance(threshold, (float, int)):
        thresh_bdN = threshold
    else:
        thresh_bdN = _flatten_dN(jnp.broadcast_to(threshold, query_bhwd.shape))

    target_bdN = jnp.where(valid_bdN, target_bdN, jnp.nan)
    pred_t_bdN = jnp.where(valid_bdN, (pred_bdN > thresh_bdN).astype(jnp.float32), jnp.nan)

    iou_pos = _iou_terms(pred_t_bdN, target_bdN)
    iou_neg = _iou_terms(1.0 - pred_t_bdN, 1.0 - target_bdN)
    iou = 2.0 * iou_pos * iou_neg / (iou_pos + iou_neg)
    return {"iou": iou, "iou_pos": iou_pos, "iou_neg": iou_neg}


def regression_plane_scores(query_bhwd: Array, gt_bhw1: Array, pred_depth_bhw1: Array) -> dict:
    """Scores a regressed depth map as a binary classifier
    (binary_metrics_utils.py:194-244)."""
    pred = (query_bhwd < pred_depth_bhw1).astype(jnp.float32)
    return plane_scores(query_bhwd, gt_bhw1, pred, threshold=0.5)


def scores_to_dict(
    scores: dict,
    thresholds=None,
    depth_planes: Sequence[float] = DEFAULT_PLANES,
    tag: Optional[str] = None,
    is_rendering: bool = False,
    threshold_decimals: int = 1,
) -> dict:
    """Expands (b, d) IoU arrays into the reference's flat key scheme:
    iou[_pos|_neg][_{thr}]_d_{plane} -> (b,) arrays.

    threshold_decimals: the reference formats thresholds with :.1f
    (binary_metrics_utils.py:109-121), which COLLIDES for its own
    17-value validate_bd sweep (0.10 and 0.15 both key as "0.1", the
    later silently overwriting the earlier). Default 1 keeps JSON parity
    for the 5-threshold test protocol; the validation sweep passes 2 so
    every swept threshold keeps its own scores (deliberate divergence
    from the reference's collided sweep output)."""
    out = {}
    prefix = f"{tag}_" if tag else ""
    names = {"iou": "iou", "iou_pos": "iou_pos", "iou_neg": "iou_neg"}
    d = scores["iou"].shape[1]
    td = threshold_decimals
    for key, name in names.items():
        for di in range(d):
            plane = -1 if is_rendering else depth_planes[di]
            if thresholds is None:
                out[f"{prefix}{name}_d_{plane:.1f}"] = scores[key][:, di]
            else:
                out[f"{prefix}{name}_{thresholds:.{td}f}_d_{plane:.1f}"] = scores[key][:, di]
    return out


def legacy_and_new_iou(query_bhwd: Array, gt_bhw1: Array, sigmoid_pred_bhwd: Array, threshold: float = 0.5) -> dict:
    """Training-time IoU logging (bd_model.py:505-556)."""
    gt = jnp.broadcast_to(gt_bhw1, query_bhwd.shape)

    # legacy: single IoU over everything with gt > 0.5 mask
    mask = gt > 0.5
    target = (query_bhwd < gt) & mask
    pred = (sigmoid_pred_bhwd > threshold) & mask
    inter = jnp.sum((target & pred), axis=(0, 1, 2)).astype(jnp.float32)
    union = jnp.sum((target | pred), axis=(0, 1, 2)).astype(jnp.float32)
    legacy = jnp.nanmean(inter / union)

    s = plane_scores(query_bhwd, jnp.where(gt_bhw1 > 0, gt_bhw1, jnp.nan), sigmoid_pred_bhwd, threshold)
    return {
        "iou": legacy,
        "pos_iou": jnp.nanmean(jnp.nanmean(s["iou_pos"], axis=1)),
        "neg_iou": jnp.nanmean(jnp.nanmean(s["iou_neg"], axis=1)),
        "harmonic_iou": jnp.nanmean(jnp.nanmean(s["iou"], axis=1)),
    }
