"""Metric parity vs torch re-derivations of the reference formulas."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.eval import metrics as m


def test_depth_metrics_batched_matches_torch():
    rng = np.random.RandomState(0)
    b, n = 3, 500
    gt = rng.uniform(0.5, 5.0, (b, n)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, (b, n)).astype(np.float32)
    valid = rng.rand(b, n) > 0.2

    ours = m.compute_depth_metrics_batched(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(valid))

    # torch re-derivation (metrics_utils.py:52-120)
    gt_t = torch.from_numpy(gt).clone()
    pr_t = torch.from_numpy(pred).clone()
    vm = torch.from_numpy(valid)
    gt_t[~vm] = torch.nan
    pr_t[~vm] = torch.nan
    thresh = torch.maximum(gt_t / pr_t, pr_t / gt_t)
    for name, lim in (("a5", 1.05), ("a25", 1.25), ("a2", 1.25**2)):
        av = (thresh < lim).float()
        av[~vm] = torch.nan
        np.testing.assert_allclose(np.asarray(ours[name]), torch.nanmean(av, dim=1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours["abs_rel"]),
        torch.nanmean(torch.abs(gt_t - pr_t) / gt_t, dim=1).numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours["rmse"]),
        torch.sqrt(torch.nanmean((gt_t - pr_t) ** 2, dim=1)).numpy(), atol=1e-6,
    )


def _torch_plane_scores(query, gt, pred, threshold):
    """binary_metrics_utils.py:59-125 re-derivation. Inputs (b,d,h,w), gt (b,1,h,w)."""
    valid = (torch.from_numpy(gt).expand(query.shape) > 0) & (torch.from_numpy(query) > 0)
    prediction = torch.from_numpy(pred).flatten(2)
    q = torch.from_numpy(query).flatten(2)
    g = torch.from_numpy(gt).expand(query.shape).flatten(2)
    vm = valid.flatten(2)
    target = (q < g).float()
    target[~vm] = torch.nan
    pt = (prediction > threshold).float()
    pt[~vm] = torch.nan
    inter = (pt * target).nansum(2)
    union = target.nansum(2) + pt.nansum(2) - inter
    pos = inter / union
    inter = ((1 - pt) * (1 - target)).nansum(2)
    union = (1 - target).nansum(2) + (1 - pt).nansum(2) - inter
    neg = inter / union
    return pos, neg, 2 * pos * neg / (pos + neg)


def test_plane_scores_match_torch():
    rng = np.random.RandomState(1)
    b, d, h, w = 2, 8, 24, 32
    gt = rng.uniform(0.0, 5.0, (b, 1, h, w)).astype(np.float32)
    query = np.broadcast_to(
        np.linspace(1.5, 5.0, d, dtype=np.float32)[None, :, None, None], (b, d, h, w)
    ).copy()
    pred = rng.rand(b, d, h, w).astype(np.float32)

    pos_t, neg_t, iou_t = _torch_plane_scores(query, gt, pred, 0.5)

    ours = bm.plane_scores(
        jnp.asarray(query.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)),
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        0.5,
    )
    np.testing.assert_allclose(np.asarray(ours["iou_pos"]), pos_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["iou_neg"]), neg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["iou"]), iou_t.numpy(), atol=1e-5)


def test_boundary_mask_matches_torch():
    rng = np.random.RandomState(2)
    b, d, h, w = 1, 2, 16, 20
    depth = rng.uniform(0.5, 5.0, (b, 1, h, w)).astype(np.float32)
    depth[0, 0, :2, :2] = np.nan
    query = rng.uniform(1.0, 4.0, (b, d, h, w)).astype(np.float32)

    # torch path (binary_metrics_utils.py:23-32)
    dt = torch.from_numpy(depth)
    qt = torch.from_numpy(query)
    invalid = dt != dt
    target = (qt < dt).float()
    edges = F.max_pool2d(target, 3, 1, 1) - target
    edges[invalid.expand(edges.shape)] = 0
    dil = F.max_pool2d(edges, 7, 1, 3)
    dil[invalid.expand(edges.shape)] = torch.nan
    ref = (dil > 0).float()

    ours = bm.get_boundary_mask(
        jnp.asarray(depth.transpose(0, 2, 3, 1)), jnp.asarray(query.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-6)


def test_thresholder_buckets():
    planes = jnp.asarray(np.linspace(1.5, 5.0, 8, dtype=np.float32))
    thr = jnp.asarray(np.linspace(0.3, 0.7, 8, dtype=np.float32))
    t = bm.Thresholder(planes, thr)
    # torch.bucketize default is right=False -> same as searchsorted 'right' boundary handling
    q = jnp.asarray([0.1, 1.5, 1.8, 4.9, 99.0])
    got = np.asarray(t.get_thresholds(q))
    bins = np.asarray(t.bins)
    ref_idx = torch.bucketize(torch.tensor(np.asarray(q)), torch.from_numpy(bins)).numpy()
    np.testing.assert_allclose(got, np.asarray(thr)[ref_idx])


def test_results_averager_roundtrip(tmp_path):
    ra = m.ResultsAverager("exp", "metrics")
    ra.update_results({"iou": 0.5, "abs_rel": 0.1})
    ra.update_results({"iou": 0.7, "abs_rel": 0.3})
    ra.compute_final_average()
    assert abs(ra.final_metrics["iou"] - 0.6) < 1e-9
    p = str(tmp_path / "scores.json")
    ra.output_json(p)
    rb = m.ResultsAverager("x", "y")
    rb.from_json(p)
    assert abs(rb.final_metrics["abs_rel"] - 0.2) < 1e-9
