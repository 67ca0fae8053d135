"""Temporal-evaluation driver loop (parity: test_bd.py --temporal_eval,
:109-116, 157-236, 451-473).

Per scene (batch 1, sequential): every `eval_length` frames a new plane
is anchored at the current camera; each frame queries the model with the
rendered plane depth, feeding back the previous sigmoid map + pose as
the temporal prior; visible GT-mesh vertices collect binarised
predictions and flips are counted per window.

Pipeline (VERDICT r2 item 7). Sequential dense tuples share 6-7 of their
8 frames, so the driver keeps a device-resident per-frame image cache:
each frame's RGB crosses the host->device link ONCE (bf16 on TPU) and
the 8-view source stack is assembled on device. A background thread
decodes the next tuple's new frames while the device computes, and the
host-side vertex-visibility update for frame i-1 (C++ rasterize +
sampling, the host floor at ~0.15 s / 1M faces) runs while the TPU
executes frame i's forward. Steady-state rate ~= max(vertex update,
new-frame decode+upload), not their sum plus a 20 MB tuple re-upload.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.keyframes import pose_distance_np
from implicit_depth_tpu.eval.temporal import TemporalEvaluator
from implicit_depth_tpu.models.bd_net import BDNet

# keys a forward_val / regression step actually consumes (fixed pytree
# structure across frames — anything else would force retraces)
_CUR_KEYS = ("world_T_cam", "cam_T_world", "K_s0", "invK_s0", "K_s1", "invK_s1")
_SRC_KEYS = ("world_T_cam", "cam_T_world", "K_s0", "K_s1")


class _TupleStager:
    """Decode-once / upload-once tuple assembly for sequential eval.

    Host LRU: frame_id -> the dataset's per-frame dict (decode cost paid
    once per frame, not once per tuple membership). Device LRU:
    frame_id -> committed image array (upload paid once). `prefetch(i)`
    decodes tuple i's missing frames on a background thread.
    """

    def __init__(self, dataset, dtype=jnp.float32, capacity: int = 64):
        self.ds = dataset
        self.dtype = dtype
        self.capacity = capacity
        self._host: OrderedDict = OrderedDict()
        self._dev: OrderedDict = OrderedDict()
        self._thread: Optional[threading.Thread] = None
        self._device = jax.devices()[0]

    def _tuple_ids(self, idx: int) -> tuple[str, list]:
        scan_id, *frame_ids = self.ds.frame_tuples[idx].split(" ")
        if self.ds.num_images_in_tuple is not None:
            frame_ids = frame_ids[: self.ds.num_images_in_tuple]
        return scan_id, frame_ids

    def _host_frame(self, scan_id: str, fid) -> dict:
        key = (scan_id, fid)
        if key not in self._host:
            self._host[key] = self.ds.get_frame(scan_id, fid, flip=False,
                                                bd_info=False)
            while len(self._host) > self.capacity:
                self._host.popitem(last=False)
        else:
            self._host.move_to_end(key)
        return self._host[key]

    def _dev_image(self, scan_id: str, fid) -> jax.Array:
        key = (scan_id, fid)
        if key not in self._dev:
            img = self._host_frame(scan_id, fid)["image"].astype(self.dtype)
            self._dev[key] = jax.device_put(jnp.asarray(img), self._device)
            while len(self._dev) > self.capacity:
                self._dev.popitem(last=False)
        else:
            self._dev.move_to_end(key)
        return self._dev[key]

    def prefetch(self, idx: int) -> None:
        """Decodes tuple idx's frames on a background thread (PIL/numpy
        release the GIL for the heavy parts)."""
        if idx >= len(self.ds.frame_tuples):
            return
        self.join()
        scan_id, ids = self._tuple_ids(idx)

        def work():
            for fid in ids:
                self._host_frame(scan_id, fid)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def get(self, idx: int) -> tuple[dict, dict, np.ndarray]:
        """-> (cur_device_dict, src_device_dict, cur_depth_host_hw).

        Source views are DVMVS-pose-ordered like
        GenericMVSDataset.__getitem__; images are assembled on device
        from the cache."""
        self.join()
        scan_id, ids = self._tuple_ids(idx)
        frames = [self._host_frame(scan_id, fid) for fid in ids]
        cur_h, src_h = frames[0], frames[1:]
        src_ids = ids[1:]

        pens = [
            pose_distance_np(
                np.eye(4),
                cur_h["cam_T_world"].astype(np.float64) @ s["world_T_cam"].astype(np.float64),
            )[0]
            for s in src_h
        ]
        order = np.argsort(pens)
        src_h = [src_h[i] for i in order]
        src_ids = [src_ids[i] for i in order]

        cur = {k: jnp.asarray(cur_h[k])[None] for k in _CUR_KEYS}
        cur["image"] = self._dev_image(scan_id, ids[0])[None]
        cur["depth"] = jnp.asarray(cur_h["depth"])[None]
        src = {k: jnp.asarray(np.stack([s[k] for s in src_h]))[None]
               for k in _SRC_KEYS}
        src["image"] = jnp.stack(
            [self._dev_image(scan_id, fid) for fid in src_ids])[None]
        return cur, src, cur_h["depth"][..., 0]


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

    on_tpu = jax.default_backend() not in ("cpu",)
    frame_times: list = []
    for scene_id, ds in datasets_by_scene.items():
        ev.initialise_new_scene(gt_mesh_path=mesh_paths_by_scene[scene_id])
        stager = _TupleStager(ds, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        prior_pred = None
        prior_pose = None
        # deferred vertex update: frame i-1's host-side rasterize+sample
        # runs while the device executes frame i's forward
        pending: Optional[tuple] = None
        n = len(ds) if max_frames_per_scene is None else min(len(ds), max_frames_per_scene)
        stager.prefetch(0)
        for i in range(n):
            t_frame = time.perf_counter()
            cur, src, depth_host = stager.get(i)

            if i % eval_length == 0:
                if pending is not None:
                    ev.update_vertex_predictions(*pending)
                    pending = None
                if i > 0:
                    ev.compute_vertex_occlusion_changes()
                ev.initialise_new_plane(depth_host, np.asarray(cur["world_T_cam"])[0])
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

            pred = step(variables, cur, src)  # async dispatch, (1, h, w, 1)
            # overlap the TPU forward with host work: decode of the next
            # tuple's new frames + frame i-1's vertex-visibility update
            stager.prefetch(i + 1)
            if pending is not None:
                ev.update_vertex_predictions(*pending)
            pred_np = np.asarray(pred)[0, ..., 0]  # sync
            pending = (pred_np, np.asarray(cur["cam_T_world"])[0],
                       np.asarray(cur["K_s0"])[0])
            prior_pred = pred
            prior_pose = cur["cam_T_world"]
            # wall time of the full per-frame pipeline (staging + plane
            # render + model forward + overlapped rasterise/vertex update)
            frame_times.append(time.perf_counter() - t_frame)
        if pending is not None:
            ev.update_vertex_predictions(*pending)
        ev.compute_vertex_occlusion_changes()

    score = ev.temporal_score(len(datasets_by_scene), eval_length, warmup, frame_multiplier)
    # steady-state throughput = 1 / median frame time (robust against the
    # XLA-compile frames)
    med = sorted(frame_times)[len(frame_times) // 2] if frame_times else 0.0
    return {"temporal_score": score, "total_diffs": ev.total_diffs,
            "total_verts": ev.total_verts,
            "frames_per_sec": (1.0 / med) if med else 0.0,
            "n_frames": len(frame_times), "frame_times": frame_times}
