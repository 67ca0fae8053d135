"""Plane-sweep cost / feature volume builders (pure jnp, all-planes-at-once).

Reimplements the behaviour of modules/cost_volume.py from the reference,
TPU-style:

- No per-plane Python loop (reference CostVolumeManager.build_cost_volume,
  modules/cost_volume.py:287-313) and no separate "fast" variant
  (modules/cost_volume.py:718-1146): there is exactly one vectorised path,
  equivalent to the reference's FastFeatureVolumeManager which is
  mathematically identical to the slow one.
- The warp is driven by closed-form per-(view, plane) homographies
  (core.geometry.plane_homographies) instead of materialised world points.
- Metadata channels are returned as *groups* (WarpedViews) rather than a
  concatenated 202-channel tensor; the metadata MLP consumes the groups
  with per-group matmuls against slices of its first-layer kernel, so the
  giant concat never hits HBM. Channel order of the reference concat
  (modules/cost_volume.py:1117-1135) is preserved by the MLP slicing --
  see models/volume_mlp.py.

Faithful quirks preserved (required for pretrained-weight parity):
- Project3D clamps z at 1e-5 *before* the validity compare, so the
  reference's mask `depths > 0` (modules/cost_volume.py:917) is
  identically 1.0; out-of-frustum samples are killed by zeros padding in
  grid_sample instead (documented at modules/cost_volume.py:596-599).
  We reproduce mask == 1 and feed clamped z as the depth metadata.
- Ray "cosine similarity" is a plain dot of the two unit rays
  (F.cosine_similarity with eps=1e-5 on already-normalised inputs).
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp

from implicit_depth_tpu.core import geometry
from implicit_depth_tpu.core.sampling import sample_bilinear_idx

Array = jnp.ndarray

_logger = logging.getLogger(__name__)
_warned_fallback: set = set()


def _warn_pallas_fallback(h: int, w: int, c: int) -> None:
    """Warns once per shape when the fused warp kernel is requested but the
    ~18x-slower XLA gather path runs instead (VERDICT r1: the silent cliff)."""
    key = (h, w, c)
    if key not in _warned_fallback:
        _warned_fallback.add(key)
        _logger.warning(
            "pallas warp kernel unavailable for matching shape h=%d w=%d c=%d "
            "(requires 16 matching channels); falling back to the XLA gather "
            "path (~18x slower on TPU)", h, w, c,
        )


class WarpedViews(NamedTuple):
    """All per-(view, plane) warp products + metadata groups.

    Shapes: b=batch, k=source views, d=depth planes, h/w=matching res,
    c=matching feature channels.
    """

    feats: Array        # (b, k, d, h, w, c) warped source features
    depths: Array       # (b, k, d, h, w) clamped source-view depth of the warp
    mask: Array         # (b, k, d, h, w) parity mask (identically 1.0)
    dot: Array          # (b, k, d, h, w) <warped src, cur> feature dot
    cur_rays: Array     # (b, h, w, 3) unit rays of the current view (d-invariant)
    src_rays: Array     # (b, k, d, h, w, 3) unit rays from source origins
    ray_angle: Array    # (b, k, d, h, w) cos angle between cur and src rays
    pose_dist: Array    # (b, k, 3) DVMVS (combined, r, t) pose distances
    depth_planes: Array  # (d,)


def _sample_one(img_hwc: Array, x_idx: Array, y_idx: Array) -> Array:
    return sample_bilinear_idx(img_hwc, x_idx, y_idx)


def build_warped_views(
    cur_feats_bhwc: Array,
    src_feats_bkhwc: Array,
    src_K_bk44: Array,
    src_T_cur_bk44: Array,
    cur_invK_b44: Array,
    src_poses_bk44: Array,
    depth_planes_d: Array,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
) -> WarpedViews:
    """Warps all source views onto the current view at every depth plane.

    Args:
        cur_feats_bhwc: (b, h, w, c) current matching features.
        src_feats_bkhwc: (b, k, h, w, c) source matching features.
        src_K_bk44: source intrinsics at matching resolution.
        src_T_cur_bk44: current-cam -> source-cam transforms
            (reference `src_extrinsics`, src_cam_T_cur_cam).
        cur_invK_b44: current inverse intrinsics at matching resolution.
        src_poses_bk44: source-cam -> current-cam transforms
            (reference `src_poses`, cur_cam_T_src_cam).
        depth_planes_d: (d,) plane depths.
        compute_dtype: dtype for feature sampling / dots (bf16 on TPU).
        mesh: optional jax.sharding.Mesh("data", "model"); the warp then
            runs under shard_map with batch on `data` and views on
            `model` (parallel.sharded_warp) — required for the Pallas
            kernel to shard instead of being gathered by GSPMD.
    """
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_d.shape[0]
    # the fused kernel lane-tiles any (h, w) by internal zero-padding; the
    # only remaining constraint is the 16-channel matching dim (8 rows x
    # 16 ch = 128 sublanes per MXU operand)
    pallas_ok = use_pallas and c == 16
    if use_pallas and not pallas_ok:
        _warn_pallas_fallback(h, w, c)
    flat_warp = pallas_ok or mesh is not None

    # ---- coordinates (fp32 always; pose math parity w/ bd_model.py:196-204)
    M_bkd33 = geometry.plane_homographies(
        src_K_bk44, src_T_cur_bk44, cur_invK_b44, depth_planes_d
    )
    grid_hw3 = geometry.pixel_grid(h, w)
    if flat_warp:
        # the kernel computes its own sample coords; only the source-view
        # depth (z) metadata is needed here -> single-row einsum, 3x less
        # HBM than full xyz
        z = jnp.einsum(
            "bkdj,hwj->bkdhw", M_bkd33[..., 2, :], grid_hw3,
            precision=jax.lax.Precision.HIGHEST,
        )
        z = jnp.maximum(z, 1e-5)
    else:
        xyz = jnp.einsum(
            "bkdij,hwj->bkdhwi", M_bkd33, grid_hw3,
            precision=jax.lax.Precision.HIGHEST,
        )  # (b, k, d, h, w, 3)
        z = jnp.maximum(xyz[..., 2], 1e-5)
        # +0.5-centre pixel coords -> sampler index space is u - 0.5
        # (tests/test_sampling.py::test_index_space_matches_plus_half_convention)
        x_idx = jnp.clip(xyz[..., 0] / z - 0.5, -2.0 * w, 2.0 * w)
        y_idx = jnp.clip(xyz[..., 1] / z - 0.5, -2.0 * h, 2.0 * h)

    # ---- bilinear gather of source features at all (d, h, w) points
    src_feats_c = src_feats_bkhwc.astype(compute_dtype)
    if flat_warp:
        A_bk33, b_bk3 = geometry.homography_components(
            src_K_bk44, src_T_cur_bk44, cur_invK_b44
        )
        # fold batch into the warp's view axis (vmap-of-pallas compiles
        # pathologically slowly; a flat grid does not). Under a mesh the
        # flat axis is split over ("data", "model").
        src_flat = src_feats_c.reshape((b * k,) + src_feats_c.shape[2:])
        A_flat = A_bk33.reshape(b * k, 3, 3)
        b_flat = b_bk3.reshape(b * k, 3)
        if mesh is not None:
            from implicit_depth_tpu.parallel.sharded_warp import sharded_warp

            feats = sharded_warp(
                mesh, src_flat, A_flat, b_flat, depth_planes_d,
                use_pallas=pallas_ok,
            )
        else:
            # fused MXU one-hot warp kernel with a custom-VJP transpose
            # kernel (~18x faster than the XLA gather on TPU).
            from implicit_depth_tpu.ops.warp_kernel import warp_planes_diff

            feats = warp_planes_diff(src_flat, A_flat, b_flat, depth_planes_d)
        feats = feats.reshape((b, k, d, h, w, c))
    else:
        feats = jax.vmap(jax.vmap(_sample_one))(src_feats_c, x_idx, y_idx)
    # (b, k, d, h, w, c)

    # ---- metadata
    mask = jnp.ones_like(z, dtype=compute_dtype)  # parity: always valid
    cur = cur_feats_bhwc.astype(compute_dtype)
    dot = jnp.einsum(
        "bkdhwc,bhwc->bkdhw", feats, cur, preferred_element_type=compute_dtype
    ) * mask

    # current-view rays: normalize(d * K^-1 p) == normalize(K^-1 p)
    rays = jnp.einsum(
        "bij,hwj->bhwi", cur_invK_b44[:, :3, :3], grid_hw3,
        precision=jax.lax.Precision.HIGHEST,
    )
    cur_rays = geometry.normalize(rays, axis=-1)

    # source-view rays: world point minus source camera origin (in cur
    # frame). The big (b, k, d, h, w, 3) intermediates run in compute_dtype
    # (bf16 on TPU) — the reference computes these under fp16 AMP too.
    world_pts = (
        rays.astype(compute_dtype)[:, None, None]
        * depth_planes_d.astype(compute_dtype)[None, None, :, None, None, None]
    )
    src_origin = src_poses_bk44[:, :, :3, 3].astype(compute_dtype)  # (b, k, 3)
    src_rays = geometry.normalize(
        world_pts - src_origin[:, :, None, None, None, :], axis=-1
    )  # (b, k, d, h, w, 3)

    ray_angle = jnp.einsum("bhwi,bkdhwi->bkdhw", cur_rays.astype(compute_dtype),
                           src_rays, preferred_element_type=compute_dtype)

    pd, rm, tm = geometry.pose_distance(src_poses_bk44)
    pose_dist = jnp.stack([pd, rm, tm], axis=-1)  # (b, k, 3)

    return WarpedViews(
        feats=feats,
        depths=z.astype(compute_dtype),
        mask=mask,
        dot=dot,
        cur_rays=cur_rays.astype(compute_dtype),
        src_rays=src_rays.astype(compute_dtype),
        ray_angle=ray_angle.astype(compute_dtype),
        pose_dist=pose_dist.astype(compute_dtype),
        depth_planes=depth_planes_d,
    )


def dot_cost_volume(wv: WarpedViews) -> Array:
    """Plain dot-product cost volume summed over views -> (b, d, h, w).

    Parity: modules/cost_volume.py:301-315 (and its vectorised twin
    EfficientCostVolumeManager, :1295-1304).
    """
    return jnp.sum(wv.dot, axis=1)


def zero_cost_volume(batch: int, num_planes: int, h: int, w: int, dtype=jnp.float32) -> Array:
    """Ablation volume of zeros (modules/cost_volume.py:1307-1384)."""
    return jnp.zeros((batch, num_planes, h, w), dtype=dtype)


def lowest_cost_depth(cost_bdhw: Array, depth_planes_d: Array) -> Array:
    """Argmax-plane depth map for visualisation
    (modules/cost_volume.py:319-356)."""
    idx = jnp.argmax(cost_bdhw, axis=1)
    return depth_planes_d[idx]


def overall_source_mask(
    wv: WarpedViews,
    src_K_bk44: Array,
    src_T_cur_bk44: Array,
    cur_invK_b44: Array,
    h: int,
    w: int,
) -> Array:
    """True where any source view has usable info at the *last* depth plane
    (fast-path semantics, modules/cost_volume.py:1058-1063 + get_mask
    :75-96: strictly inside a 2px border and in front of the view)."""
    M_bk33 = geometry.plane_homographies(
        src_K_bk44, src_T_cur_bk44, cur_invK_b44, wv.depth_planes[-1:]
    )[:, :, 0]
    grid_hw3 = geometry.pixel_grid(h, w)
    xyz = jnp.einsum(
        "bkij,hwj->bkhwi", M_bk33, grid_hw3, precision=jax.lax.Precision.HIGHEST
    )
    z = xyz[..., 2]
    zc = jnp.maximum(z, 1e-5)
    u = xyz[..., 0] / zc
    v = xyz[..., 1] / zc
    bounds = (u > 2) & (u < w - 2) & (v > 2) & (v < h - 2)
    # reference: depth_mask is any(mask)==True always (clamped z), so the
    # effective condition is the bounds check.
    return jnp.any(bounds, axis=1)  # (b, h, w)
