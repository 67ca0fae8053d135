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
def _frame_keys(matching_scale: int) -> tuple[tuple, tuple]:
    """(cur_keys, src_keys) the jitted frame program consumes: poses,
    scale-0 intrinsics (plane render / prior sampling / upsampling) and
    the model's matching-scale intrinsics. Fixed tuples per net so the
    packed-upload layout and the jit pytree structure are static."""
    ms = matching_scale
    cur = tuple(dict.fromkeys((
        "world_T_cam", "cam_T_world", "K_s0", "invK_s0",
        f"K_s{ms}", f"invK_s{ms}")))
    src = tuple(dict.fromkeys(("world_T_cam", "cam_T_world", "K_s0", f"K_s{ms}")))
    return cur, src


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
        self.prefetch_many((idx,))

    def prefetch_many(self, indices) -> None:
        """Decodes several tuples' frames on ONE background thread — used
        by the scan driver to stage the whole NEXT window while the device
        executes the current window's scan."""
        items = [self._tuple_ids(i) for i in indices
                 if 0 <= i < len(self.ds.frame_tuples)]
        if not items:
            return
        self.join()

        def work():
            for scan_id, ids in items:
                for fid in ids:
                    self._host_frame(scan_id, fid)
                    # commit the image too: the device transfer (tunnel
                    # IO, not CPU) overlaps the running window scan
                    # instead of blocking the next window's staging
                    self._dev_image(scan_id, fid)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def get(self, idx: int):
        """-> (cur_host_dict, src_host_dicts, cur_image_dev,
        src_image_devs, cur_depth_host_hw).

        Source views are DVMVS-pose-ordered like
        GenericMVSDataset.__getitem__. Only the images live on the
        device (upload-once cache); all pose/intrinsics stay host-side
        so the frame loop can ship them in ONE packed upload."""
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

        cur_img = self._dev_image(scan_id, ids[0])
        src_imgs = tuple(self._dev_image(scan_id, fid) for fid in src_ids)
        return cur_h, src_h, cur_img, src_imgs, cur_h["depth"][..., 0]


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
    use_scan: bool = False,
    collect_preds: bool = False,
    device_scoring: Optional[bool] = None,
) -> dict:
    """With regression=True the net is a DepthNet and the occlusion
    probability is the hard classifier (rendered < predicted depth)
    (test_reg.py:145-187 temporal path).

    use_scan=True runs each plane window as a device-resident
    jax.lax.scan (ONE dispatch per eval_length frames, prior feedback in
    the scan carry) instead of one dispatch per frame.

    device_scoring (scan mode only; default on unless collect_preds):
    the vertex project+sample and the window flip count run ON DEVICE
    (eval/vertex_scorer.py) — the host only rasterizes the (h, w)
    z-buffers (C++), and per window a single flip-count scalar crosses
    back, one window late. Removes the (L, h, w) prediction download and
    the million-vertex host sampling loop from the steady-state path."""
    ev = TemporalEvaluator(height=height, width=width)
    cur_keys, src_keys = _frame_keys(getattr(net, "matching_scale", 1))
    # Commit the params to the device ONCE. Host-resident params (e.g.
    # flax from_bytes output) would re-cross the host->device link on
    # every jitted dispatch — ~200 MB per window through a remote tunnel
    # dominated the measured frame time (6-8 s/window) before this.
    variables = jax.device_put(variables, jax.local_devices()[0])

    # ---- whole-frame jitted program: ONE dispatch per frame.
    # Everything except the (cached, upload-once) images and the fed-back
    # prior prediction arrives in one packed f32 vector: per-frame camera
    # data, the plane anchor, and the prior pose. The plane render, the
    # cur/src dict assembly and the forward all trace into a single
    # executable — the per-frame eager-op chain (~30 tunnel round-trips,
    # ~2.5 s/frame through the axon dev link) collapses to
    # upload + launch + download.
    from implicit_depth_tpu.eval.rasterizer import render_plane_depth

    def _frame_fn(cur_image, src_stack, pack):
        k = src_stack.shape[0]
        n_cur = len(cur_keys) * 16
        n_src = len(src_keys) * k * 16
        cur_m = pack[:n_cur].reshape(len(cur_keys), 4, 4)
        src_m = pack[n_cur:n_cur + n_src].reshape(len(src_keys), k, 4, 4)
        anchor = pack[n_cur + n_src:n_cur + n_src + 16].reshape(4, 4)
        dist = pack[n_cur + n_src + 16]
        prior_cam = pack[n_cur + n_src + 17:n_cur + n_src + 33].reshape(4, 4)

        cur = {key: cur_m[i][None] for i, key in enumerate(cur_keys)}
        cur["image"] = cur_image[None]
        rendered = render_plane_depth(anchor, dist, cur_m[1], cur_m[2],
                                      height, width)
        cur["rendered_depth"] = rendered[None, ..., None]
        src = {key: src_m[i][None] for i, key in enumerate(src_keys)}
        src["image"] = src_stack[None]
        return cur, src, prior_cam

    def _predict(variables, cur, src, prior_pred, prior_cam):
        if regression:
            out = net.apply(variables, cur, src)
            return (cur["rendered_depth"] < out["depth_pred_0"]).astype(jnp.float32)
        if net.use_prior:
            cur["prior_prediction"] = prior_pred
            cur["prior_cam_T_world"] = prior_cam[None]
        out = net.apply(variables, cur, src, method=BDNet.forward_val)
        return jax.nn.sigmoid(sigmoid_multiplier * out["pred_0"].astype(jnp.float32))

    @jax.jit
    def frame_step(variables, cur_image, src_images, pack, prior_pred):
        cur, src, prior_cam = _frame_fn(cur_image, jnp.stack(src_images), pack)
        return _predict(variables, cur, src, prior_pred, prior_cam)

    # ---- whole-WINDOW jitted program: the eval_length-frame sequence
    # loop as a lax.scan carry (SURVEY §5 "long-context"). The fed-back
    # prior prediction + prior pose live in the scan carry, so an entire
    # plane window (model forward x L, plane renders, prior feedback)
    # runs device-resident in ONE dispatch; the host gets all L
    # prediction maps in a single download and spends its time only on
    # the C++ vertex-visibility updates, pipelined against the next
    # window's scan. Distinct window lengths (the scene tail) compile
    # once each via the static tuple arity.
    @jax.jit
    def window_step(variables, cur_images, src_images, packs,
                    init_prior_pred, init_prior_cam):
        cur_stack = jnp.stack(cur_images)                       # (L,h,w,3)
        src_stack = jnp.stack([jnp.stack(s) for s in src_images])  # (L,k,h,w,3)

        def body(carry, xs):
            prior_pred, prior_cam = carry
            cur_image, src_st, pack = xs
            cur, src, _ = _frame_fn(cur_image, src_st, pack)
            pred = _predict(variables, cur, src, prior_pred, prior_cam)
            new_cam = pack[16:32].reshape(4, 4)  # cur cam_T_world (cur_keys[1])
            return (pred, new_cam), pred[0, ..., 0]

        (_, _), preds = jax.lax.scan(
            body, (init_prior_pred, init_prior_cam),
            (cur_stack, src_stack, packs))
        return preds  # (L, h, w) f32

    on_tpu = jax.default_backend() not in ("cpu",)
    frame_times: list = []
    # collect_preds: per-frame (h, w) sigmoid maps, in frame order — the
    # scan-vs-frame-mode parity oracle (tests + on-chip verification)
    collected: list = []
    import os as _os
    trace_stages = _os.environ.get("IDT_TEMPORAL_TRACE", "") in ("1", "2")

    if use_scan:
        if device_scoring is None:
            device_scoring = not collect_preds
        from implicit_depth_tpu.eval.rasterizer import rasterize_mesh_depth
        from implicit_depth_tpu.eval.vertex_scorer import DeviceVertexScorer

        # window-granular pipeline: while the device scans window W, the
        # host applies window W-1's vertex-visibility updates (host
        # scoring) or rasterizes window W's z-buffers (device scoring).
        def apply_window(preds_np, metas, depth0, world_T_cam0):
            ev.initialise_new_plane(depth0, world_T_cam0)
            for pred_hw, (cam_T_world, K_s0) in zip(preds_np, metas):
                ev.update_vertex_predictions(pred_hw, cam_T_world, K_s0)
            ev.compute_vertex_occlusion_changes()

        for scene_id, ds in datasets_by_scene.items():
            ev.initialise_new_scene(gt_mesh_path=mesh_paths_by_scene[scene_id])
            stager = _TupleStager(ds, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
            scorer = (DeviceVertexScorer(ev.verts, height, width)
                      if device_scoring else None)
            n = len(ds) if max_frames_per_scene is None else min(len(ds), max_frames_per_scene)
            no_prior = jax.device_put(
                -jnp.ones((1, height, width, 1), jnp.float32), jax.devices()[0])
            pending: Optional[tuple] = None
            pending_flips = None  # device scalar, drained one window late
            stager.prefetch(0)
            i = 0
            while i < n:
                t_win = time.perf_counter()
                l_w = min(eval_length, n - i)
                frames = []
                for j in range(i, i + l_w):
                    frames.append(stager.get(j))
                    if scorer is None:
                        stager.prefetch(j + 1)
                cur_h0, _, _, _, depth0 = frames[0]
                anchor = np.asarray(cur_h0["world_T_cam"], np.float64)
                dist = float(np.nanquantile(depth0, 0.75))
                packs, metas, cur_imgs, src_imgs = [], [], [], []
                for cur_h, src_h, cur_img, src_im, _d in frames:
                    packs.append(np.concatenate([
                        np.stack([cur_h[k] for k in cur_keys]).reshape(-1),
                        np.stack([np.stack([s[k] for s in src_h])
                                  for k in src_keys]).reshape(-1),
                        anchor.astype(np.float32).reshape(-1),
                        np.asarray([dist], np.float32),
                        # prior pose comes from the scan carry; this pack
                        # slot keeps the frame-mode layout (unused here)
                        np.asarray(cur_h["cam_T_world"], np.float32).reshape(-1),
                    ]).astype(np.float32))
                    metas.append((cur_h["cam_T_world"], cur_h["K_s0"]))
                    cur_imgs.append(cur_img)
                    src_imgs.append(src_im)
                # pad the tail window to eval_length by repeating the
                # last frame, so EVERY window runs the same executable:
                # a distinct tail arity would re-trace + re-lower the
                # whole scan program (~25 s host CPU) for <=1 window per
                # scene. Predictions are sliced back to l_w below; the
                # pad frames never feed scoring.
                while len(packs) < eval_length and l_w < eval_length:
                    packs.append(packs[-1])
                    cur_imgs.append(cur_imgs[-1])
                    src_imgs.append(src_imgs[-1])
                t_staged = time.perf_counter()
                preds = window_step(
                    variables, tuple(cur_imgs), tuple(src_imgs),
                    jnp.asarray(np.stack(packs)), no_prior,
                    jnp.asarray(np.asarray(cur_h0["cam_T_world"], np.float32)))
                preds = preds[:l_w]
                t_dispatch = time.perf_counter()
                if scorer is not None:
                    # decode the NEXT window's frames while the device
                    # scans this one; rasterize this window's z-buffers
                    # (the only remaining host compute) meanwhile
                    stager.prefetch_many(range(i + l_w, i + 2 * l_w))
                    zbufs = np.stack([
                        rasterize_mesh_depth(ev.verts, ev.faces, m[0], m[1],
                                             height, width)
                        for m in metas])
                    t_raster = time.perf_counter()
                    flips = (scorer.window_flips(
                        preds.reshape(l_w, height, width)
                        if preds.ndim != 3 else preds,
                        zbufs,
                        np.stack([np.asarray(m[0], np.float32) for m in metas]),
                        np.stack([np.asarray(m[1], np.float32) for m in metas]))
                        if l_w >= 2 else None)
                    # drain LAST window's flip count: a one-deep pipeline —
                    # this waits only for work that overlapped this
                    # window's staging, never for the current window
                    if pending_flips is not None:
                        ev.total_diffs += float(pending_flips)
                    pending_flips = flips
                    if l_w >= 2:
                        ev.total_verts += scorer.n_verts
                    t_score = time.perf_counter()
                    if collect_preds:
                        collected.extend(
                            list(np.asarray(preds).astype(np.float32)))
                    frame_times.extend([(time.perf_counter() - t_win) / l_w] * l_w)
                    if trace_stages:
                        print(
                            f"window {i}..{i + l_w}: stage={t_staged - t_win:.3f} "
                            f"dispatch={t_dispatch - t_staged:.3f} "
                            f"raster={t_raster - t_dispatch:.3f} "
                            f"score_drain={t_score - t_raster:.3f} "
                            f"per_frame={(time.perf_counter() - t_win) / l_w:.3f}",
                            flush=True)
                    i += l_w
                    continue
                if pending is not None:
                    apply_window(*pending)
                t_visupd = time.perf_counter()
                preds_np = np.asarray(preds).astype(np.float32)  # sync
                t_sync = time.perf_counter()
                if collect_preds:
                    collected.extend(list(preds_np))
                pending = (preds_np, metas, depth0, cur_h0["world_T_cam"])
                frame_times.extend([(time.perf_counter() - t_win) / l_w] * l_w)
                if trace_stages:
                    print(
                        f"window {i}..{i + l_w}: stage={t_staged - t_win:.3f} "
                        f"dispatch={t_dispatch - t_staged:.3f} "
                        f"visupd={t_visupd - t_dispatch:.3f} "
                        f"sync={t_sync - t_visupd:.3f} "
                        f"per_frame={(time.perf_counter() - t_win) / l_w:.3f}",
                        flush=True)
                i += l_w
            if pending is not None:
                apply_window(*pending)
            if pending_flips is not None:
                ev.total_diffs += float(pending_flips)

        score = ev.temporal_score(len(datasets_by_scene), eval_length, warmup,
                                  frame_multiplier)
        med = sorted(frame_times)[len(frame_times) // 2] if frame_times else 0.0
        return {"temporal_score": score, "total_diffs": ev.total_diffs,
                "total_verts": ev.total_verts,
                "frames_per_sec": (1.0 / med) if med else 0.0,
                "n_frames": len(frame_times), "frame_times": frame_times,
                **({"preds": collected} if collect_preds else {})}

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
        # the no-prior sentinel (-1 everywhere, sample_prior's invalid
        # value) is a constant: committed once, reused at every re-anchor
        no_prior = jax.device_put(
            -jnp.ones((1, height, width, 1), jnp.float32), jax.devices()[0])
        for i in range(n):
            t_frame = time.perf_counter()
            cur_h, src_h, cur_img, src_imgs, depth_host = stager.get(i)
            t_staged = time.perf_counter()

            if i % eval_length == 0:
                if pending is not None:
                    ev.update_vertex_predictions(*pending)
                    pending = None
                if i > 0:
                    ev.compute_vertex_occlusion_changes()
                ev.initialise_new_plane(depth_host, cur_h["world_T_cam"])
                prior_pred = no_prior
                prior_pose = cur_h["cam_T_world"]

            t_plane = time.perf_counter()
            pack_np = np.concatenate([
                np.stack([cur_h[k] for k in cur_keys]).reshape(-1),
                np.stack([np.stack([s[k] for s in src_h])
                          for k in src_keys]).reshape(-1),
                np.asarray(ev.anchor_pose, np.float32).reshape(-1),
                np.asarray([ev.plane_distance], np.float32),
                np.asarray(prior_pose, np.float32).reshape(-1),
            ]).astype(np.float32)

            t_render = time.perf_counter()
            pred = frame_step(variables, cur_img, src_imgs,
                              jnp.asarray(pack_np), prior_pred)
            t_dispatch = time.perf_counter()
            # overlap the TPU forward with host work: decode of the next
            # tuple's new frames + frame i-1's vertex-visibility update
            stager.prefetch(i + 1)
            if pending is not None:
                ev.update_vertex_predictions(*pending)
            t_visupd = time.perf_counter()
            pred_np = np.asarray(pred)[0, ..., 0]  # sync
            t_sync = time.perf_counter()
            if collect_preds:
                collected.append(pred_np.astype(np.float32))
            pending = (pred_np, cur_h["cam_T_world"], cur_h["K_s0"])
            prior_pred = pred
            prior_pose = cur_h["cam_T_world"]
            # wall time of the full per-frame pipeline (staging + plane
            # render + model forward + overlapped rasterise/vertex update)
            frame_times.append(time.perf_counter() - t_frame)
            if trace_stages:
                extra = ""
                if _os.environ.get("IDT_TEMPORAL_TRACE") == "2":
                    t_r = time.perf_counter()
                    np.asarray(frame_step(variables, cur_img, src_imgs,
                                          jnp.asarray(pack_np), prior_pred))
                    extra = f" repeat_call={time.perf_counter() - t_r:.3f}"
                print(
                    f"frame {i}: stage={t_staged - t_frame:.3f} "
                    f"plane_init={t_plane - t_staged:.3f} "
                    f"pack={t_render - t_plane:.3f} "
                    f"dispatch={t_dispatch - t_render:.3f} "
                    f"visupd={t_visupd - t_dispatch:.3f} "
                    f"sync={t_sync - t_visupd:.3f} "
                    f"total={frame_times[-1]:.3f}{extra}", flush=True)
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
            "n_frames": len(frame_times), "frame_times": frame_times,
            **({"preds": collected} if collect_preds else {})}
