"""Procedural synthetic MVS dataset (test fixture + e2e smoke training).

No reference counterpart (the reference has no test suite, SURVEY.md §4);
this fills that gap: a scene of textured axis-aligned rectangles in front
of a background wall, rendered analytically (exact depth, multi-view
consistent color), with cameras on a jittered arc. Serves unit/e2e tests,
the eval-driver harness, and profiling without ScanNet on disk.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from implicit_depth_tpu.data.mvs_dataset import BDSamplingConfig, GenericMVSDataset


def _camera_rays(K: np.ndarray, h: int, w: int) -> np.ndarray:
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    pix = np.stack([xs, ys, np.ones_like(xs)], -1)  # (h, w, 3)
    invK = np.linalg.inv(K[:3, :3])
    return pix @ invK.T  # (h, w, 3), z = 1


class SyntheticScene:
    """A wall at z=z_far plus `num_rects` floating textured rectangles."""

    def __init__(self, seed: int = 0, num_rects: int = 6, z_far: float = 4.5):
        rng = np.random.RandomState(seed)
        self.z_far = z_far
        self.rects = []  # (z, x0, x1, y0, y1, color_seed)
        for i in range(num_rects):
            z = rng.uniform(1.0, 3.8)
            cx, cy = rng.uniform(-1.2, 1.2), rng.uniform(-0.9, 0.9)
            sx, sy = rng.uniform(0.3, 1.0), rng.uniform(0.3, 1.0)
            self.rects.append((z, cx - sx, cx + sx, cy - sy, cy + sy, rng.uniform(0, 10, 3)))

    def _texture(self, x, y, seed3):
        r = 0.5 + 0.5 * np.sin(3.1 * x * (1 + seed3[0]) + seed3[1])
        g = 0.5 + 0.5 * np.sin(2.7 * y * (1 + seed3[1]) + seed3[2])
        b = 0.5 + 0.5 * np.sin(2.3 * (x + y) * (1 + seed3[2]) + seed3[0])
        return np.stack([r, g, b], -1)

    def render(self, world_T_cam: np.ndarray, K: np.ndarray, h: int, w: int):
        """Returns (color (h,w,3) in [0,1], depth (h,w) camera z-depth)."""
        rays_cam = _camera_rays(K, h, w)
        R = world_T_cam[:3, :3]
        o = world_T_cam[:3, 3]
        rays_w = rays_cam @ R.T  # world direction, scaled so cam-z == 1

        depth = np.full((h, w), np.inf)
        color = np.zeros((h, w, 3))

        surfaces = [(self.z_far, -1e9, 1e9, -1e9, 1e9, np.array([1.0, 2.0, 3.0]))] + self.rects
        for z0, x0, x1, y0, y1, cseed in surfaces:
            dz = rays_w[..., 2]
            t = (z0 - o[2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
            px = o[0] + t * rays_w[..., 0]
            py = o[1] + t * rays_w[..., 1]
            hit = (t > 0.05) & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1) & (t < depth)
            depth = np.where(hit, t, depth)
            tex = self._texture(px, py, cseed)
            color = np.where(hit[..., None], tex, color)

        depth = np.where(np.isinf(depth), np.nan, depth)
        return color.astype(np.float32), depth.astype(np.float32)


class SyntheticDataset(GenericMVSDataset):
    """GenericMVSDataset over SyntheticScene; frames indexed 0..n-1 along a
    camera arc. Tuples: each frame + its num_views-1 predecessors."""

    def __init__(
        self,
        num_frames: int = 16,
        num_views: int = 8,
        image_height: int = 64,
        image_width: int = 96,
        split: str = "train",
        scene_seed: int = 0,
        full_res_scale: int = 2,
        bd_config: Optional[BDSamplingConfig] = None,
        **kwargs,
    ):
        super().__init__(
            dataset_path="<synthetic>",
            split=split,
            image_height=image_height,
            image_width=image_width,
            bd_config=bd_config,
            **kwargs,
        )
        self.scene = SyntheticScene(seed=scene_seed)
        self.num_frames = num_frames
        self.full_res_scale = full_res_scale
        self.frame_tuples = []
        for i in range(num_views - 1, num_frames):
            ids = [str(i)] + [str(i - j - 1) for j in range(num_views - 1)]
            self.frame_tuples.append("scene0 " + " ".join(ids))

        rng = np.random.RandomState(scene_seed + 1)
        self.poses = []
        for i in range(num_frames):
            ang = 0.04 * (i - num_frames / 2)
            c, s = np.cos(ang), np.sin(ang)
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            T[:3, 3] = [
                0.25 * np.sin(0.5 * i) + 0.02 * rng.randn(),
                0.05 * np.cos(0.7 * i),
                -0.05 * i / num_frames,
            ]
            self.poses.append(T)

        fx = 0.9 * image_width
        self.K_full = np.eye(4, dtype=np.float64)
        self.K_full[0, 0] = fx
        self.K_full[1, 1] = fx
        self.K_full[0, 2] = image_width / 2
        self.K_full[1, 2] = image_height / 2

        self._cache: dict = {}

    # ---- loaders -------------------------------------------------------
    def _render(self, frame_id: int, h: int, w: int):
        key = (frame_id, h, w)
        if key not in self._cache:
            K = self.K_full.copy()
            K[0] *= w / self.image_width
            K[1] *= h / self.image_height
            self._cache[key] = self.scene.render(self.poses[frame_id], K, h, w)
        return self._cache[key]

    def load_color(self, scan_id, frame_id):
        color, _ = self._render(int(frame_id), self.image_height, self.image_width)
        return color

    def load_pose(self, scan_id, frame_id):
        T = self.poses[int(frame_id)].astype(np.float32)
        return T, np.linalg.inv(T).astype(np.float32)

    def load_intrinsics(self, scan_id, frame_id, flip: bool = False) -> dict:
        out = {}
        K44 = self.K_full.copy()
        if flip:
            K44[0, 2] = self.image_width - K44[0, 2]
        for s in range(5):
            Ks = K44.copy()
            scale = 2.0 ** (s + 1)
            Ks[0] /= scale
            Ks[1] /= scale
            out[f"K_s{s}"] = Ks.astype(np.float32)
            out[f"invK_s{s}"] = np.linalg.inv(Ks).astype(np.float32)
        return out

    def load_depth(self, scan_id, frame_id):
        _, depth = self._render(int(frame_id), self.depth_height, self.depth_width)
        return depth

    def load_full_res_depth(self, scan_id, frame_id):
        _, depth = self._render(
            int(frame_id),
            self.image_height * self.full_res_scale // 2,
            self.image_width * self.full_res_scale // 2,
        )
        return depth

    def get_valid_frame_ids(self, scan_id=None, store_computed: bool = False):
        """All synthetic frames are valid; dist-to-last-valid is 0."""
        return [f"scene0 {i} 0" for i in range(self.num_frames)]
