"""Occlusion-matte inference (parity: inference/inference.py).

Per frame of a dense-tuple sequence: query the BD model with a rendered
virtual-asset depth map (loaded per frame, hole-filled with a 7x7 max
pool, inference/inference.py:115-128; or a fixed 2 m plane :129-131),
feed the previous prediction back as the temporal prior (:139-157), save
sigmoid mattes as .npy (:159-162).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.mvs_dataset import collate
from implicit_depth_tpu.models.bd_net import BDNet
from implicit_depth_tpu.ops.image import max_pool_dilate

Array = jnp.ndarray


def load_rendered_depth(load_dir: Optional[str], frame_id: str, h: int, w: int) -> np.ndarray:
    """Rendered asset depth with hole filling, or a fixed 2 m plane."""
    if load_dir is None:
        return np.full((h, w, 1), 2.0, np.float32)
    path = os.path.join(load_dir, f"{frame_id}.npy")
    depth = np.load(path).astype(np.float32)
    if depth.ndim == 2:
        depth = depth[..., None]
    filled = np.asarray(max_pool_dilate(jnp.asarray(depth)[None], 7))[0]
    depth = np.where(depth > 0, depth, filled)
    return depth


def run_inference(
    net: BDNet,
    variables,
    dataset,
    output_dir: str,
    rendered_depth_load_dir: Optional[str] = None,
    sigmoid_multiplier: float = 1.0,
    use_prior: bool = False,
    max_frames: Optional[int] = None,
) -> list[str]:
    """Sequential per-frame matting; returns saved file paths."""
    os.makedirs(output_dir, exist_ok=True)
    # commit the params once — host-resident params re-cross the
    # host->device link on EVERY jitted dispatch otherwise
    variables = jax.device_put(variables, jax.local_devices()[0])

    @jax.jit
    def step(variables, cur, src):
        out = net.apply(variables, cur, src, method=BDNet.forward_val)
        return jax.nn.sigmoid(sigmoid_multiplier * out["pred_0"].astype(jnp.float32))

    saved = []
    prior_pred = None
    prior_pose = None
    n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
    for i in range(n):
        cur, src = collate([dataset[i]])
        frame_id = cur.get("frame_id_string", [str(i)])[0]
        h, w = cur["depth"].shape[1:3]
        rendered = load_rendered_depth(rendered_depth_load_dir, frame_id, h, w)
        cur = {k: jnp.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
        src = {k: jnp.asarray(v) for k, v in src.items() if k != "frame_id_string"}
        cur["rendered_depth"] = jnp.asarray(rendered)[None]
        if use_prior:
            cur["prior_prediction"] = prior_pred
            cur["prior_cam_T_world"] = prior_pose

        pred = step(variables, cur, src)  # (1, h, w, 1)
        matte = np.asarray(pred)[0, ..., 0]
        # zero-padded like the reference (inference/inference.py:162
        # saves f"{frame_idx:05d}.npy") so composite_capture's padded
        # mask lookup (inference/composite.py:99) finds the mattes
        fid = f"{int(frame_id):05d}" if str(frame_id).isdigit() else str(frame_id)
        path = os.path.join(output_dir, f"{fid}.npy")
        np.save(path, matte)
        saved.append(path)

        if use_prior:
            prior_pred = pred
            prior_pose = cur["cam_T_world"]
    return saved
