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


def make_forward_fn(
    net: BDNet,
    binary_eval_depth: bool = False,
    thresholder: Optional[bm.Thresholder] = None,
    sigmoid_multiplier: float = 1.0,
):
    """Jitted model-only forward — the timed unit of the reference's
    `model_time` protocol (CUDA events around the forward,
    test_bd.py:196-212). Returns {"pred": ..., "sync": scalar}; the
    scalar is read back on the host to synchronise the timer (plain
    block_until_ready is unreliable under the axon tunnel)."""
    if binary_eval_depth:
        tb = None if thresholder is None else thresholder.bins
        tv = None if thresholder is None else thresholder.thresholds

        def fwd(variables, cur_data, src_data):
            out = net.apply(
                variables, cur_data, src_data,
                method=BDNet.forward_infer_depth,
                threshold_bins=tb, threshold_values=tv,
            )
            pred = out["search_depths"][..., None].astype(jnp.float32)
            return {"pred": pred, "sync": jnp.sum(pred)}
    else:

        def fwd(variables, cur_data, src_data):
            out = net.apply(variables, cur_data, src_data, method=BDNet.forward_val)
            pred = jax.nn.sigmoid(
                sigmoid_multiplier * out["pred_0"].astype(jnp.float32))
            return {"pred": pred, "sync": jnp.sum(pred)}

    return jax.jit(fwd)


def make_score_fn(
    binary_eval_depth: bool = False,
    thresholds: Optional[Sequence[float]] = None,
    thresholder: Optional[bm.Thresholder] = None,
    depth_planes: Sequence[float] = bm.DEFAULT_PLANES,
    threshold_decimals: int = 1,
):
    """Jitted scorer over an already-computed prediction (the part the
    reference runs un-timed after the forward, test_bd.py:238-318)."""

    def score(pred, cur_data):
        gt = cur_data["depth"]  # (b, hd, wd, 1) NaN invalid
        if binary_eval_depth:
            b = gt.shape[0]
            valid = jnp.nan_to_num(gt, nan=0.0) > 0.5
            return compute_depth_metrics_batched(
                jnp.nan_to_num(gt, nan=1.0).reshape(b, -1),
                pred.reshape(b, -1),
                valid.reshape(b, -1),
            )

        query = cur_data["rendered_depth"]
        hd, wd = gt.shape[1], gt.shape[2]
        if pred.shape[1] != hd:
            pred_r = resize_bilinear(pred, hd, wd)
            query = resize_bilinear(query, hd, wd)
        else:
            pred_r = pred

        surface = bm.get_surface_mask(gt, query)
        boundary = bm.get_boundary_mask(gt, query)
        scores = {}
        if thresholder is not None:
            thr = thresholder.get_thresholds(query)
            for tag, extra in ((None, None), ("surface", surface), ("boundary", boundary)):
                s = bm.plane_scores(query, gt, pred_r, thr, extra_mask_bhwd=extra)
                scores.update(bm.scores_to_dict(s, None, depth_planes, tag=tag))
        else:
            for t in (thresholds or bm.DEFAULT_THRESHOLDS):
                s = bm.plane_scores(query, gt, pred_r, float(t))
                scores.update(bm.scores_to_dict(
                    s, float(t), depth_planes,
                    threshold_decimals=threshold_decimals))
        return scores

    return jax.jit(score)


def _pad_batch(arrays: dict, target: int) -> dict:
    """Pads every array's leading dim to `target` by repeating the last
    element, so remainder batches reuse the compiled executable instead of
    triggering a fresh XLA compile (static shapes, SURVEY §7.1)."""
    out = {}
    for k, v in arrays.items():
        n = v.shape[0]
        if n < target:
            v = np.concatenate([v, np.repeat(v[-1:], target - n, axis=0)])
        out[k] = v
    return out


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
    threshold_decimals: int = 1,
) -> dict:
    """Runs the full per-scene evaluation loop (test_bd.py:123-499).

    datasets_by_scene: {scene_id: dataset yielding (cur, src)}.
    Returns {"all_scene": ResultsAverager, "scenes": {id: averager},
             "model_time_ms": float}.
    """
    # commit the params once — host-resident params re-cross the
    # host->device link on EVERY jitted dispatch otherwise
    variables = jax.device_put(variables, jax.local_devices()[0])
    fwd = make_forward_fn(net, binary_eval_depth=binary_eval_depth,
                          thresholder=thresholder,
                          sigmoid_multiplier=sigmoid_multiplier)
    score = make_score_fn(binary_eval_depth=binary_eval_depth,
                          thresholds=thresholds, thresholder=thresholder,
                          threshold_decimals=threshold_decimals)
    # the ~100 per-frame metrics leave the device as ONE stacked (b, n)
    # array — per-key readbacks cost a host round-trip each, which
    # dominates wall time through a remote-device tunnel
    score_keys: list = []
    stacked_score = None

    def _make_stacked(pred, cur_j):
        nonlocal score_keys, stacked_score
        score_keys = sorted(jax.eval_shape(score, pred, cur_j).keys())
        stacked_score = jax.jit(lambda p, c: jnp.stack(
            [score(p, c)[k] for k in score_keys], axis=-1))

    all_avg = ResultsAverager(name, "frame metrics")
    per_scene = {}
    fwd_time, fwd_frames = 0.0, 0
    step_time = 0.0

    from implicit_depth_tpu.data.loader import BatchLoader

    first_batch = True
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
            frame_ids = cur.get("frame_id_string")
            cur_np = {k: v for k, v in cur.items() if k != "frame_id_string"}
            src_np = {k: v for k, v in src.items() if k != "frame_id_string"}
            nb = next(iter(cur_np.values())).shape[0]
            if frame_ids is None:
                frame_ids = [f"{bi * batch_size + i:06d}" for i in range(nb)]
            # pad remainder batches to the fixed batch shape: one compile
            # per eval, not one per odd-sized scene tail
            cur_np = _pad_batch(cur_np, batch_size)
            src_np = _pad_batch(src_np, batch_size)
            cur_j = {k: jnp.asarray(v) for k, v in cur_np.items()}
            src_j = {k: jnp.asarray(v) for k, v in src_np.items()}

            t0 = time.perf_counter()
            out = fwd(variables, cur_j, src_j)
            float(out["sync"])  # device sync (scalar readback)
            dt = time.perf_counter() - t0

            if stacked_score is None:
                _make_stacked(out["pred"], cur_j)
            arr = np.asarray(stacked_score(out["pred"], cur_j))  # (b, n) sync
            scores = {k: arr[:, i] for i, k in enumerate(score_keys)}
            dt_step = time.perf_counter() - t0
            if not first_batch:  # skip compile batch
                fwd_time += dt
                step_time += dt_step
                fwd_frames += nb
            first_batch = False

            for ei in range(nb):
                elem = {k: v[ei] for k, v in scores.items()}
                elem["model_time"] = dt / batch_size * 1000.0
                scene_avg.update_results(elem)
                all_avg.update_results(elem)

            if cache_dir is not None:
                # prediction caching (--cache_depths, test_bd.py:406-428),
                # keyed by the dataset's true frame_id_string when available
                from implicit_depth_tpu.utils.caching import cache_model_outputs

                pred_key = "search_depths" if binary_eval_depth else "pred_0"
                preds = {pred_key: np.asarray(out["pred"])[:nb]}
                cache_model_outputs(
                    os.path.join(cache_dir, str(scene_id)), preds,
                    {**{k: v[:nb] for k, v in cur_np.items()},
                     "frame_id_string": list(frame_ids)[:nb]},
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

    # executable count per jitted fn — static shapes mean exactly ONE
    # compile each for the whole eval, regardless of per-scene remainder
    # batch sizes (asserted by tests/test_eval_driver.py)
    try:
        n_compiles = fwd._cache_size() + (
            stacked_score._cache_size() if stacked_score is not None else 0
        )
    except AttributeError:  # private API; tolerate jax changes
        n_compiles = -1

    return {
        "all_scene": all_avg,
        "scenes": per_scene,
        # forward-only, the reference's protocol (test_bd.py:196-212)
        "model_time_ms": (fwd_time / max(fwd_frames, 1)) * 1000.0,
        # forward + upsample + IoU scoring, all on device
        "step_time_ms": (step_time / max(fwd_frames, 1)) * 1000.0,
        "n_compiles": n_compiles,
    }
