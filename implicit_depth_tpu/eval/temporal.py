"""Temporal (flicker) evaluation.

Parity: utils/binary_metrics_utils.py:247-388 + the driver plumbing in
test_bd.py:109-116,157-236,451-473. Per scene: every `eval_length` frames
a fresh synthetic plane is placed at the 75th percentile of GT depth in
front of the camera; the model predicts occlusion of that plane with the
previous frame's prediction as prior; GT-mesh vertices visible in the
frame collect binarised predictions; the score counts per-vertex
occlusion flips across each window.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from implicit_depth_tpu.eval.rasterizer import (
    load_ply,
    project_mesh_vertices,
    rasterize_mesh_depth,
    render_plane_depth,
)

Array = jnp.ndarray


class TemporalEvaluator:
    def __init__(self, height: int = 192, width: int = 256):
        self.height = height
        self.width = width
        self.total_diffs = 0.0
        self.total_verts = 0
        self.verts: Optional[np.ndarray] = None
        self.faces: Optional[np.ndarray] = None
        self.anchor_pose: Optional[np.ndarray] = None
        self.plane_distance: Optional[float] = None
        self.vertex_predictions: list[np.ndarray] = []

    # ---- scene / window lifecycle --------------------------------------
    def initialise_new_scene(self, gt_mesh_path: Optional[str] = None,
                             verts: Optional[np.ndarray] = None,
                             faces: Optional[np.ndarray] = None) -> None:
        if gt_mesh_path is not None:
            verts, faces = load_ply(gt_mesh_path)
        self.verts, self.faces = verts, faces
        self.vertex_predictions = []

    def initialise_new_plane(self, depth_gt_hw: np.ndarray, world_T_cam_44: np.ndarray) -> None:
        """Plane at q75 of GT depth in front of this camera
        (binary_metrics_utils.py:257-261)."""
        self.anchor_pose = np.asarray(world_T_cam_44, np.float64)
        self.plane_distance = float(np.nanquantile(depth_gt_hw, 0.75))
        self.vertex_predictions = []

    def render_plane(self, cam_T_world_44, K_44) -> Array:
        """(h, w) rendered plane depth for the current camera."""
        return render_plane_depth(
            jnp.asarray(self.anchor_pose, jnp.float32),
            jnp.float32(self.plane_distance),
            jnp.asarray(cam_T_world_44, jnp.float32),
            jnp.asarray(K_44, jnp.float32),
            self.height, self.width,
        )

    # ---- per-frame update ----------------------------------------------
    @staticmethod
    def mask_prediction_edges(pred_hw: np.ndarray, edge_size: int = 4) -> np.ndarray:
        out = np.full_like(pred_hw, -1.0)
        out[edge_size:-edge_size, edge_size:-edge_size] = pred_hw[
            edge_size:-edge_size, edge_size:-edge_size
        ]
        return out

    def update_vertex_predictions(self, pred_hw: np.ndarray,
                                  cam_T_world_44: np.ndarray, K_44: np.ndarray) -> None:
        """Samples the (edge-masked) prediction at visible GT-mesh vertices
        (binary_metrics_utils.py:360-388). One fused C++ call: rasterize +
        project + sample, no million-element host temporaries (the host
        per-frame floor of the temporal pipeline)."""
        from implicit_depth_tpu.eval.rasterizer import sample_vertex_predictions

        out = sample_vertex_predictions(
            self.verts, self.faces, np.asarray(cam_T_world_44),
            np.asarray(K_44)[:3, :3], np.asarray(pred_hw, np.float32),
        )
        self.vertex_predictions.append(out)

    def _update_vertex_predictions_py(self, pred_hw: np.ndarray,
                                      cam_T_world_44: np.ndarray, K_44: np.ndarray) -> None:
        """Unfused numpy composition of the same update — the parity
        oracle for the fused C++ path (tests/test_temporal.py)."""
        pred = self.mask_prediction_edges(np.asarray(pred_hw, np.float32))
        zbuf = rasterize_mesh_depth(
            self.verts, self.faces, np.asarray(cam_T_world_44), np.asarray(K_44),
            self.height, self.width,
        )
        uvz = project_mesh_vertices(self.verts, np.asarray(cam_T_world_44), np.asarray(K_44))
        u = np.round(uvz[:, 0] - 0.5).astype(int)
        v = np.round(uvz[:, 1] - 0.5).astype(int)
        z = uvz[:, 2]
        inb = (u >= 0) & (u < self.width) & (v >= 0) & (v < self.height)
        uc, vc = np.clip(u, 0, self.width - 1), np.clip(v, 0, self.height - 1)
        sampled_pred = pred[vc, uc]
        sampled_z = zbuf[vc, uc]
        valid = inb & (sampled_z > 0) & (z > 0) & (np.abs(z - sampled_z) < 0.05) & (sampled_pred > 0)
        out = np.where(valid, sampled_pred, -1.0)
        self.vertex_predictions.append(out.astype(np.float32))

    def compute_vertex_occlusion_changes(self) -> None:
        """Counts binarised per-vertex flips across the window
        (binary_metrics_utils.py:273-279)."""
        if len(self.vertex_predictions) < 2:
            return
        preds = np.stack(self.vertex_predictions).astype(np.float64)
        preds[preds == -1] = np.nan
        preds[preds > 0.5] = 1.0
        preds[preds < 0.5] = 0.0
        diffs = np.abs(preds[1:] - preds[:-1])
        self.total_diffs += float(np.nansum(diffs))
        self.total_verts += diffs.shape[1]

    def temporal_score(self, n_scans: int, eval_length: int = 15,
                       warmup: int = 2, frame_multiplier: int = 8) -> float:
        """test_bd.py:451-459 normalisation."""
        denom = (eval_length - warmup) * frame_multiplier * n_scans
        return self.total_diffs / max(denom, 1)
