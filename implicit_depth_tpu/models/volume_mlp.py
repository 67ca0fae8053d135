"""Metadata feature-volume MLP (the SimpleRecon "metadata cost volume").

Reference: modules/cost_volume.py:369-434 (FeatureVolumeManager) and its
vectorised twin :718-1146. The reference concatenates a 202-channel input
per (pixel, plane) -- visual features of all 8 views plus geometric
metadata -- and runs MLP([202, 128, 128, 1]) with LeakyReLU(0.01)
(modules/networks.py:218-233).

TPU design: the 202-channel concat is never materialised. The first
Dense layer is applied *per metadata group* by slicing its kernel rows
and summing the partial matmuls; groups that are constant along the
plane (current-view visual features, current rays, pose distances) or
constant along space (plane depth) are computed once and broadcast.
This is exact (same linear map), saves the dominant HBM round-trip, and
keeps checkpoint-conversion trivial: the kernel is stored as one
(202, hidden) parameter in the reference's channel order
(modules/cost_volume.py:1117-1135):

    [ src visual k*c | cur visual c | mask k | depths k | plane 1 |
      dot k | ray_angle k | cur ray 3 | src rays k*3 |
      pose_penalty k | r_measure k | t_measure k ]

Two execution paths share the same parameters:
- __call__: XLA path over a WarpedViews bundle (train + CPU), grouped
  einsums against the fc0 row slices.
- fused:    single Pallas kernel (ops/fused_volume.py) computing warp +
  metadata + the full MLP without materialising any (k, d, h, w, ...)
  intermediate. Eval path on TPU (no VJP).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.volumes.cost_volume import WarpedViews

Array = jnp.ndarray


def metadata_input_channels(num_src_views: int, matching_dim: int) -> int:
    """modules/cost_volume.py:405-423."""
    k, c = num_src_views, matching_dim
    return (
        c * (1 + k)   # visual
        + (1 + k)     # depths (+ plane)
        + 3 * (1 + k) # rays
        + k           # ray angle
        + k           # mask
        + k           # dot
        + 3 * k       # pose penalties
    )


class MetadataVolumeMLP(nn.Module):
    """Produces the (b, d, h, w) feature volume from warped views."""

    num_src_views: int = 7
    matching_dim: int = 16
    hidden: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cin = metadata_input_channels(self.num_src_views, self.matching_dim)
        self.fc0_kernel = self.param(
            "fc0_kernel", nn.initializers.lecun_normal(), (cin, self.hidden)
        )
        self.fc0_bias = self.param(
            "fc0_bias", nn.initializers.zeros_init(), (self.hidden,)
        )
        dt = self.compute_dtype
        self.fc1 = nn.Dense(self.hidden, dtype=dt, name="fc1")
        self.fc2 = nn.Dense(1, dtype=dt, name="fc2")

    def _fc0_slices(self, dtype=None):
        """Row slices of the fc0 kernel in the reference concat order."""
        k, c, hdim = self.num_src_views, self.matching_dim, self.hidden
        w1 = self.fc0_kernel if dtype is None else self.fc0_kernel.astype(dtype)
        o = 0
        out = {}

        def take(name, n):
            nonlocal o
            out[name] = w1[o : o + n]
            o += n

        take("vis_src", k * c)
        take("vis_cur", c)
        take("mask", k)
        take("depths", k)
        take("plane", 1)
        take("dot", k)
        take("angle", k)
        take("ray_cur", 3)
        take("ray_src", k * 3)
        take("pen", k)
        take("rm", k)
        take("tm", k)
        assert o == w1.shape[0]
        out["vis_src"] = out["vis_src"].reshape(k, c, hdim)
        out["ray_src"] = out["ray_src"].reshape(k, 3, hdim)
        out["plane"] = out["plane"][0]
        return out

    def __call__(self, wv: WarpedViews, cur_feats_bhwc: Array) -> Array:
        dt = self.compute_dtype
        w = self._fc0_slices(dtype=dt)
        cur = cur_feats_bhwc.astype(dt)

        # (b, d, h, w, hidden) accumulator. Three grouped matmuls instead of
        # six: the four scalar-per-view metadata channels (depths, mask,
        # dot, ray-angle) stack into one contraction, and all plane/pixel/
        # batch-constant groups collapse into broadcast adds. Keeps HBM
        # traffic on the (b,d,h,w,128) accumulator to a minimum.
        h1 = jnp.einsum("bkdhwc,kcf->bdhwf", wv.feats.astype(dt), w["vis_src"],
                        preferred_element_type=dt)
        meta4 = jnp.stack(
            [wv.depths.astype(dt), wv.mask.astype(dt), wv.dot.astype(dt),
             wv.ray_angle.astype(dt)], axis=-1,
        )  # (b, k, d, h, w, 4)
        w_meta4 = jnp.stack([w["depths"], w["mask"], w["dot"], w["angle"]], axis=1)
        h1 += jnp.einsum("bkdhwi,kif->bdhwf", meta4, w_meta4,
                         preferred_element_type=dt)
        h1 += jnp.einsum("bkdhwi,kif->bdhwf", wv.src_rays.astype(dt), w["ray_src"],
                         preferred_element_type=dt)

        # plane-constant: (d, hidden) broadcast over b, h, w
        h1 += (wv.depth_planes.astype(dt)[:, None] * w["plane"])[None, :, None, None, :]
        # space/plane-constant: (b, h, w, hidden) broadcast over d
        per_pix = jnp.einsum("bhwc,cf->bhwf", cur, w["vis_cur"])
        per_pix += jnp.einsum("bhwi,if->bhwf", wv.cur_rays.astype(dt), w["ray_cur"])
        h1 += per_pix[:, None]
        # batch-constant over d, h, w: pose distances, (b, hidden)
        w_pose = jnp.stack([w["pen"], w["rm"], w["tm"]], axis=-2)  # (k, 3, hidden)
        per_b = jnp.einsum("bki,kif->bf", wv.pose_dist.astype(dt), w_pose)
        h1 += per_b[:, None, None, None, :]

        h1 = nn.leaky_relu(h1 + self.fc0_bias.astype(dt), negative_slope=0.01)
        h2 = nn.leaky_relu(self.fc1(h1), negative_slope=0.01)
        out = self.fc2(h2)
        return out[..., 0]  # (b, d, h, w)

    def fused(
        self,
        cur_feats_bhwc: Array,
        src_feats_bkhwc: Array,
        src_K_bk44: Array,
        src_T_cur_bk44: Array,
        cur_invK_b44: Array,
        cur_T_src_bk44: Array,
        planes_d: Array,
        interpret: bool = False,
    ) -> Array:
        """Single-kernel warp + metadata + MLP (eval path, no VJP).

        Mathematically the same map as build_warped_views + __call__; see
        ops/fused_volume.py for the kernel-side closed forms.
        """
        from implicit_depth_tpu.core import geometry
        from implicit_depth_tpu.ops.fused_volume import fused_metadata_volume

        k, F = self.num_src_views, self.hidden
        b, h, w = cur_feats_bhwc.shape[:3]
        sl = self._fc0_slices()  # f32 slices

        A_bk33, b_bk3 = geometry.homography_components(
            src_K_bk44, src_T_cur_bk44, cur_invK_b44
        )
        origins = cur_T_src_bk44[:, :, :3, 3]
        invK3 = cur_invK_b44[:, :3, :3]

        # --- first-layer constants folded into one (b, h, F, w) base map
        grid_hw3 = geometry.pixel_grid(h, w)
        rays = jnp.einsum("bij,hwj->bhwi", invK3, grid_hw3,
                          precision=jax.lax.Precision.HIGHEST)
        cur_rays = geometry.normalize(rays, axis=-1)
        per_pix = jnp.einsum("bhwc,cf->bhwf",
                             cur_feats_bhwc.astype(jnp.float32), sl["vis_cur"])
        per_pix += jnp.einsum("bhwi,if->bhwf", cur_rays, sl["ray_cur"])
        pd, rm, tm = geometry.pose_distance(cur_T_src_bk44)
        pose = jnp.stack([pd, rm, tm], axis=-1)  # (b, k, 3)
        w_pose = jnp.stack([sl["pen"], sl["rm"], sl["tm"]], axis=-2)
        per_b = jnp.einsum("bki,kif->bf", pose.astype(jnp.float32), w_pose)
        base = (
            per_pix
            + per_b[:, None, None, :]
            + jnp.sum(sl["mask"], axis=0)  # mask metadata is identically 1
            + self.fc0_bias
        )
        base = jnp.moveaxis(base, -1, 2)  # (b, h, F, w)

        # --- weight repacks for the kernel
        c = self.matching_dim
        w_visT = sl["vis_src"].reshape(k * c, F).T  # (F, k*c), row = k*C + c
        w_meta = jnp.stack(
            [sl["depths"], sl["dot"], sl["angle"],
             sl["ray_src"][:, 0], sl["ray_src"][:, 1], sl["ray_src"][:, 2],
             jnp.zeros_like(sl["depths"]), jnp.zeros_like(sl["depths"])],
            axis=1,
        )  # (k, 8, F)
        w_metaT = w_meta.reshape(k * 8, F).T  # (F, k*8)

        fc1_p = self.fc1.variables["params"]
        fc2_p = self.fc2.variables["params"]
        return fused_metadata_volume(
            cur_feats_bhwc, src_feats_bkhwc,
            A_bk33, b_bk3, origins, invK3, planes_d,
            base,
            w_visT, w_metaT, sl["plane"][:, None],
            fc1_p["kernel"].T, fc1_p["bias"][:, None],
            fc2_p["kernel"][:, 0][:, None], fc2_p["bias"],
            hidden=F, interpret=interpret,
        )
