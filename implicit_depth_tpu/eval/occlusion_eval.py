"""Occlusion (binary-depth) evaluation driver — test_bd.py parity.

The reference loops scenes -> tuples, syncing with CUDA events per batch
(test_bd.py:123-212). Here the entire scoring step (forward + upsample +
all/surface/boundary IoU at every threshold) is ONE jitted device
function; the host loop only feeds batches and collects small metric
dicts. `model_time` mirrors the reference protocol: forward wall time
per frame at steady state.

Score keys match the reference so downstream JSON/tables are drop-in:
  iou[_pos|_neg]_{thr:.1f}_d_{plane:.1f}        (validation sweep)
  [surface_|boundary_]iou[_pos|_neg]_d_{plane}  (test, thresholder)
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.eval.metrics import ResultsAverager, compute_depth_metrics_batched
from implicit_depth_tpu.models.bd_net import BDNet
from implicit_depth_tpu.models.blocks import resize_bilinear

Array = jnp.ndarray


def make_eval_step(
    net: BDNet,
    thresholds: Optional[Sequence[float]] = None,
    thresholder: Optional[bm.Thresholder] = None,
    depth_planes: Sequence[float] = bm.DEFAULT_PLANES,
    sigmoid_multiplier: float = 1.0,
):
    """Builds the jitted per-batch scorer.

    thresholds: sweep mode (validate_bd.py:58-59 / PlaneEvaluator default).
    thresholder: test mode with tuned per-plane thresholds
    (test_bd.py:92-103).
    """

    def step(variables, cur_data, src_data):
        out = net.apply(variables, cur_data, src_data, method=BDNet.forward_val)
        logits = out["pred_0"]  # (b, h0, w0, P)
        pred = jax.nn.sigmoid(sigmoid_multiplier * logits.astype(jnp.float32))

        gt = cur_data["depth"]  # (b, hd, wd, 1) NaN invalid
        query = cur_data["rendered_depth"]

        # upsample pred & queries to GT resolution (test_bd.py:238-264)
        hd, wd = gt.shape[1], gt.shape[2]
        if pred.shape[1] != hd:
            pred = resize_bilinear(pred, hd, wd)
            query = resize_bilinear(query, hd, wd)

        surface = bm.get_surface_mask(gt, query)
        boundary = bm.get_boundary_mask(gt, query)

        scores = {}
        if thresholder is not None:
            thr = thresholder.get_thresholds(query)
            for tag, extra in ((None, None), ("surface", surface), ("boundary", boundary)):
                s = bm.plane_scores(query, gt, pred, thr, extra_mask_bhwd=extra)
                scores.update(bm.scores_to_dict(s, None, depth_planes, tag=tag))
        else:
            for t in (thresholds or bm.DEFAULT_THRESHOLDS):
                s = bm.plane_scores(query, gt, pred, float(t))
                scores.update(bm.scores_to_dict(s, float(t), depth_planes))
        return scores

    return jax.jit(step)


def make_depth_eval_step(net: BDNet, thresholder: Optional[bm.Thresholder] = None):
    """Depth-from-binary eval (test_bd.py:266-285): bisection depths scored
    with the standard depth metrics, valid where gt > 0.5 m."""

    tb = None if thresholder is None else thresholder.bins
    tv = None if thresholder is None else thresholder.thresholds

    def step(variables, cur_data, src_data):
        out = net.apply(
            variables, cur_data, src_data,
            method=BDNet.forward_infer_depth,
            threshold_bins=tb, threshold_values=tv,
        )
        pred = out["search_depths"][..., None]
        gt = cur_data["depth"]
        b = gt.shape[0]
        valid = jnp.nan_to_num(gt, nan=0.0) > 0.5
        return compute_depth_metrics_batched(
            jnp.nan_to_num(gt, nan=1.0).reshape(b, -1),
            pred.reshape(b, -1),
            valid.reshape(b, -1),
        )

    return jax.jit(step)


def evaluate_scenes(
    net: BDNet,
    variables,
    datasets_by_scene: dict,
    output_dir: Optional[str] = None,
    batch_size: int = 4,
    name: str = "implicit_depth_tpu",
    thresholds: Optional[Sequence[float]] = None,
    thresholder: Optional[bm.Thresholder] = None,
    binary_eval_depth: bool = False,
    max_batches_per_scene: Optional[int] = None,
    cache_dir: Optional[str] = None,
    sigmoid_multiplier: float = 1.0,
) -> dict:
    """Runs the full per-scene evaluation loop (test_bd.py:123-499).

    datasets_by_scene: {scene_id: dataset yielding (cur, src)}.
    Returns {"all_scene": ResultsAverager, "scenes": {id: averager},
             "model_time_ms": float}.
    """
    if binary_eval_depth:
        step = make_depth_eval_step(net, thresholder)
    else:
        step = make_eval_step(net, thresholds=thresholds, thresholder=thresholder,
                              sigmoid_multiplier=sigmoid_multiplier)

    pred_fn = None
    if cache_dir is not None:
        # prediction caching (--cache_depths, test_bd.py:406-428)
        if binary_eval_depth:
            pred_fn = jax.jit(lambda v, c, s: {"search_depths": net.apply(
                v, c, s, method=BDNet.forward_infer_depth)["search_depths"]})
        else:
            pred_fn = jax.jit(lambda v, c, s: {"pred_0": jax.nn.sigmoid(
                sigmoid_multiplier * net.apply(v, c, s, method=BDNet.forward_val)["pred_0"])})

    all_avg = ResultsAverager(name, "frame metrics")
    per_scene = {}
    fwd_time, fwd_frames = 0.0, 0

    from implicit_depth_tpu.data.loader import BatchLoader

    for scene_id, ds in datasets_by_scene.items():
        scene_avg = ResultsAverager(name, f"scene {scene_id}")
        # threaded prefetch decodes the next batch while the TPU scores the
        # current one (the reference's DataLoader role, test_bd.py:143-152)
        loader = BatchLoader(ds, batch_size, shuffle=False, num_workers=4,
                             prefetch=2, drop_last=False, epochs=1)
        for bi, (cur, src) in enumerate(iter(loader)):
            if max_batches_per_scene is not None and bi >= max_batches_per_scene:
                loader.stop()
                break
            idxs = range(bi * batch_size,
                         min((bi + 1) * batch_size, len(ds)))
            cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
            src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}

            t0 = time.perf_counter()
            scores = step(variables, cur, src)
            scores = {k: np.asarray(v) for k, v in scores.items()}  # sync
            dt = time.perf_counter() - t0
            nb = len(list(idxs))
            if bi > 0:  # skip compile batch
                fwd_time += dt
                fwd_frames += nb

            for ei in range(nb):
                elem = {k: v[ei] for k, v in scores.items()}
                elem["model_time"] = dt / nb * 1000.0
                scene_avg.update_results(elem)
                all_avg.update_results(elem)

            if pred_fn is not None:
                from implicit_depth_tpu.utils.caching import cache_model_outputs

                preds = {k: np.asarray(v) for k, v in pred_fn(variables, cur, src).items()}
                cache_model_outputs(
                    os.path.join(cache_dir, str(scene_id)), preds,
                    {**{k: np.asarray(v) for k, v in cur.items()},
                     "frame_id_string": [f"{i:06d}" for i in idxs]},
                    {}, bi, batch_size,
                )

        scene_avg.compute_final_average(ignore_nans=True)
        per_scene[scene_id] = scene_avg
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            scene_avg.output_json(os.path.join(output_dir, f"{scene_id}_metrics.json"))

    all_avg.compute_final_average(ignore_nans=True)
    if output_dir:
        all_avg.output_json(os.path.join(output_dir, "all_scenes_metrics.json"))

    return {
        "all_scene": all_avg,
        "scenes": per_scene,
        "model_time_ms": (fwd_time / max(fwd_frames, 1)) * 1000.0,
    }
