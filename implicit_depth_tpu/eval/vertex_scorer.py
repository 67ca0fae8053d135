"""Device-side vertex-visibility scoring for temporal evaluation.

Moves the per-frame vertex project+sample and the per-window flip count
onto the accelerator (the host floor of the temporal pipeline): per
frame only the (h, w) C++ z-buffer crosses host->device (~200 KB), and
per window only ONE scalar (the flip count) crosses back — the
(L, 192, 256) prediction download and the million-vertex host sampling
loop both disappear from the steady-state loop. The z-buffer visibility
test itself stays in C++ (csrc/rasterizer.cpp::rasterize_depth): a
triangle rasterize is branchy scalar work the host does well, and its
output is tiny.

Numerics are an exact re-implementation of
csrc/rasterizer.cpp::sample_vertex_predictions (itself the fused form of
reference utils/binary_metrics_utils.py:360-388) followed by
TemporalEvaluator.compute_vertex_occlusion_changes
(binary_metrics_utils.py:273-279): round-half-to-even pixel lookup,
5 cm z-agreement, edge masking, -1 -> NaN binarisation at 0.5, |diff|
nansum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class DeviceVertexScorer:
    """Per-window occlusion-flip counting with the GT mesh device-resident.

    Usage per scene: construct once (uploads the vertices); per plane
    window call `window_flips(preds, zbufs, cams, Ks)` with the window's
    device-resident (L, h, w) sigmoid maps, the host-rasterized (L, h, w)
    z-buffers, and the per-frame (L, 4, 4) cam_T_world / K_s0 packs.
    Returns a DEVICE scalar — float() it one window late to keep a
    one-deep pipeline without ever blocking on the current window.
    """

    def __init__(self, verts_n3: np.ndarray, height: int, width: int,
                 edge_size: int = 4):
        self.n_verts = int(verts_n3.shape[0])
        self.height, self.width = int(height), int(width)
        self.edge_size = int(edge_size)
        self.verts = jax.device_put(
            jnp.asarray(np.ascontiguousarray(verts_n3, np.float32)))
        self._fn = jax.jit(self._window_flips)

    def _frame_values(self, verts: Array, pred_hw: Array, zbuf_hw: Array,
                      cam_T_world: Array, K: Array) -> Array:
        """(n_verts,) sampled prediction at visible vertices, -1 elsewhere
        (parity: csrc/rasterizer.cpp::sample_vertex_predictions)."""
        h, w, e = self.height, self.width, self.edge_size
        # camera transform in f32 elementwise ops (same op order as the
        # C++: T[r,0]*x + T[r,1]*y + T[r,2]*z + T[r,3])
        x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
        cxp = cam_T_world[0, 0] * x + cam_T_world[0, 1] * y \
            + cam_T_world[0, 2] * z + cam_T_world[0, 3]
        cyp = cam_T_world[1, 0] * x + cam_T_world[1, 1] * y \
            + cam_T_world[1, 2] * z + cam_T_world[1, 3]
        czp = cam_T_world[2, 0] * x + cam_T_world[2, 1] * y \
            + cam_T_world[2, 2] * z + cam_T_world[2, 3]
        front = czp > 1e-6
        zs = jnp.where(front, czp, 1.0)
        uf = K[0, 0] * cxp / zs + K[0, 2]
        vf = K[1, 1] * cyp / zs + K[1, 2]
        # np.round / std::nearbyint: round-half-to-even == jnp.round
        u = jnp.round(uf - 0.5).astype(jnp.int32)
        v = jnp.round(vf - 0.5).astype(jnp.int32)
        inb = front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        uc = jnp.clip(u, 0, w - 1)
        vc = jnp.clip(v, 0, h - 1)
        lin = vc * w + uc
        sampled_z = zbuf_hw.reshape(-1)[lin]
        sampled_p = pred_hw.astype(jnp.float32).reshape(-1)[lin]
        masked = (uc < e) | (uc >= w - e) | (vc < e) | (vc >= h - e)
        p = jnp.where(masked, -1.0, sampled_p)
        valid = inb & (sampled_z > 0) & (jnp.abs(czp - sampled_z) < 0.05) \
            & (p > 0)
        return jnp.where(valid, p, -1.0)

    def _window_flips(self, verts: Array, preds: Array, zbufs: Array,
                      cams: Array, Ks: Array) -> Array:
        vals = jax.vmap(
            lambda p, zb, T, K: self._frame_values(verts, p, zb, T, K)
        )(preds, zbufs, cams, Ks)                                 # (L, n)
        # binarise (compute_vertex_occlusion_changes): -1 -> NaN,
        # > 0.5 -> 1, < 0.5 -> 0 (exactly 0.5 passes through; the host
        # path's float64 cast is exact for these values in f32 too)
        nanv = jnp.where(vals < 0, jnp.nan, vals)
        binv = jnp.where(nanv > 0.5, 1.0, jnp.where(nanv < 0.5, 0.0, nanv))
        diffs = jnp.abs(binv[1:] - binv[:-1])
        # nansum: flips only where both frames saw the vertex
        return jnp.nansum(diffs)

    def window_flips(self, preds, zbufs, cams, Ks) -> Array:
        """preds: (L, h, w) device or host; zbufs/cams/Ks host np arrays.
        Returns a device scalar (async)."""
        return self._fn(
            self.verts, preds,
            jnp.asarray(np.ascontiguousarray(zbufs, np.float32)),
            jnp.asarray(np.ascontiguousarray(cams, np.float32)),
            jnp.asarray(np.ascontiguousarray(Ks, np.float32)))

    def frame_values(self, pred_hw, zbuf_hw, cam_T_world, K) -> np.ndarray:
        """Single-frame sampled values (host np) — the parity oracle hook
        against the C++ sample_vertex_predictions path."""
        out = jax.jit(self._frame_values)(
            self.verts, jnp.asarray(np.asarray(pred_hw, np.float32)),
            jnp.asarray(np.asarray(zbuf_hw, np.float32)),
            jnp.asarray(np.asarray(cam_T_world, np.float32)),
            jnp.asarray(np.asarray(K, np.float32)[:3, :3] if
                        np.asarray(K).shape[0] == 4 else np.asarray(K, np.float32)))
        return np.asarray(out)
