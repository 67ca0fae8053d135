"""Temporal-evaluation driver loop (parity: test_bd.py --temporal_eval,
:109-116, 157-236, 451-473).

Per scene (batch 1, sequential): every `eval_length` frames a new plane
is anchored at the current camera; each frame queries the model with the
rendered plane depth, feeding back the previous sigmoid map + pose as
the temporal prior; visible GT-mesh vertices collect binarised
predictions and flips are counted per window.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.eval.temporal import TemporalEvaluator
from implicit_depth_tpu.models.bd_net import BDNet


def evaluate_temporal(
    net: BDNet,
    variables,
    datasets_by_scene: dict,
    mesh_paths_by_scene: dict,
    eval_length: int = 15,
    warmup: int = 2,
    frame_multiplier: int = 8,
    sigmoid_multiplier: float = 1.0,
    height: int = 192,
    width: int = 256,
    max_frames_per_scene: Optional[int] = None,
    regression: bool = False,
) -> dict:
    """With regression=True the net is a DepthNet and the occlusion
    probability is the hard classifier (rendered < predicted depth)
    (test_reg.py:145-187 temporal path)."""
    ev = TemporalEvaluator(height=height, width=width)

    if regression:
        @jax.jit
        def step(variables, cur, src):
            out = net.apply(variables, cur, src)
            return (cur["rendered_depth"] < out["depth_pred_0"]).astype(jnp.float32)
    else:
        @jax.jit
        def step(variables, cur, src):
            out = net.apply(variables, cur, src, method=BDNet.forward_val)
            return jax.nn.sigmoid(sigmoid_multiplier * out["pred_0"].astype(jnp.float32))

    frame_times: list = []
    for scene_id, ds in datasets_by_scene.items():
        ev.initialise_new_scene(gt_mesh_path=mesh_paths_by_scene[scene_id])
        prior_pred = None
        prior_pose = None
        n = len(ds) if max_frames_per_scene is None else min(len(ds), max_frames_per_scene)
        for i in range(n):
            t_frame = time.perf_counter()
            cur, src = collate([ds[i]])
            cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
            src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}

            if i % eval_length == 0:
                if i > 0:
                    ev.compute_vertex_occlusion_changes()
                depth_np = np.asarray(cur["depth"])[0, ..., 0]
                ev.initialise_new_plane(depth_np, np.asarray(cur["world_T_cam"])[0])
                # -1 is the model's invalid-prior sentinel (sample_prior
                # output); an all--1 prior with the current pose is the
                # no-prior case without switching the jitted program's
                # pytree structure (None -> array would force a retrace).
                # Committed to the device so its sharding signature matches
                # the fed-back prediction (uncommitted vs committed args
                # compile two distinct executables).
                prior_pred = jax.device_put(
                    -jnp.ones((1, height, width, 1), jnp.float32), jax.devices()[0])
                prior_pose = cur["cam_T_world"]

            rendered = ev.render_plane(cur["cam_T_world"][0], cur["K_s0"][0])
            cur["rendered_depth"] = rendered[None, ..., None]
            if not regression and net.use_prior:
                cur["prior_prediction"] = prior_pred
                cur["prior_cam_T_world"] = prior_pose

            pred = step(variables, cur, src)  # (1, h, w, 1)
            pred_np = np.asarray(pred)[0, ..., 0]
            ev.update_vertex_predictions(pred_np, np.asarray(cur["cam_T_world"])[0],
                                         np.asarray(cur["K_s0"])[0])
            prior_pred = pred
            prior_pose = cur["cam_T_world"]
            # wall time of the full per-frame pipeline (decode + plane
            # render + model forward + rasterise + vertex update)
            frame_times.append(time.perf_counter() - t_frame)
        ev.compute_vertex_occlusion_changes()

    score = ev.temporal_score(len(datasets_by_scene), eval_length, warmup, frame_multiplier)
    # steady-state throughput = 1 / median frame time (robust against the
    # XLA-compile frames)
    med = sorted(frame_times)[len(frame_times) // 2] if frame_times else 0.0
    return {"temporal_score": score, "total_diffs": ev.total_diffs,
            "total_verts": ev.total_verts,
            "frames_per_sec": (1.0 / med) if med else 0.0,
            "n_frames": len(frame_times), "frame_times": frame_times}
