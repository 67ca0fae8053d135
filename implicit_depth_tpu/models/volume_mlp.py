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
"""

from __future__ import annotations

import flax.linen as nn
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

    @nn.compact
    def __call__(self, wv: WarpedViews, cur_feats_bhwc: Array) -> Array:
        k, c, hdim = self.num_src_views, self.matching_dim, self.hidden
        cin = metadata_input_channels(k, c)
        dt = self.compute_dtype

        w1 = self.param("fc0_kernel", nn.initializers.lecun_normal(), (cin, hdim))
        b1 = self.param("fc0_bias", nn.initializers.zeros_init(), (hdim,))

        # row offsets into w1, reference concat order
        o = 0
        def take(n):
            nonlocal o
            sl = w1[o : o + n]
            o += n
            return sl.astype(dt)

        w_vis_src = take(k * c).reshape(k, c, hdim)
        w_vis_cur = take(c)
        w_mask = take(k)
        w_depths = take(k)
        w_plane = take(1)[0]
        w_dot = take(k)
        w_angle = take(k)
        w_ray_cur = take(3)
        w_ray_src = take(k * 3).reshape(k, 3, hdim)
        w_pen = take(k)
        w_rm = take(k)
        w_tm = take(k)
        assert o == cin

        cur = cur_feats_bhwc.astype(dt)

        # (b, d, h, w, hidden) accumulator. Three grouped matmuls instead of
        # six: the four scalar-per-view metadata channels (depths, mask,
        # dot, ray-angle) stack into one contraction, and all plane/pixel/
        # batch-constant groups collapse into broadcast adds. Keeps HBM
        # traffic on the (b,d,h,w,128) accumulator to a minimum.
        h1 = jnp.einsum("bkdhwc,kcf->bdhwf", wv.feats.astype(dt), w_vis_src,
                        preferred_element_type=dt)
        meta4 = jnp.stack(
            [wv.depths.astype(dt), wv.mask.astype(dt), wv.dot.astype(dt),
             wv.ray_angle.astype(dt)], axis=-1,
        )  # (b, k, d, h, w, 4)
        w_meta4 = jnp.stack([w_depths, w_mask, w_dot, w_angle], axis=1)  # (k, 4, f)
        h1 += jnp.einsum("bkdhwi,kif->bdhwf", meta4, w_meta4,
                         preferred_element_type=dt)
        h1 += jnp.einsum("bkdhwi,kif->bdhwf", wv.src_rays.astype(dt), w_ray_src,
                         preferred_element_type=dt)

        # plane-constant: (d, hidden) broadcast over b, h, w
        h1 += (wv.depth_planes.astype(dt)[:, None] * w_plane)[None, :, None, None, :]
        # space/plane-constant: (b, h, w, hidden) broadcast over d
        per_pix = jnp.einsum("bhwc,cf->bhwf", cur, w_vis_cur)
        per_pix += jnp.einsum("bhwi,if->bhwf", wv.cur_rays.astype(dt), w_ray_cur)
        h1 += per_pix[:, None]
        # batch-constant over d, h, w: pose distances, (b, hidden)
        w_pose = jnp.stack([w_pen, w_rm, w_tm], axis=-2)  # (k, 3, hidden)
        per_b = jnp.einsum("bki,kif->bf", wv.pose_dist.astype(dt), w_pose)
        h1 += per_b[:, None, None, None, :]

        h1 = nn.leaky_relu(h1 + b1.astype(dt), negative_slope=0.01)
        h2 = nn.leaky_relu(nn.Dense(hdim, name="fc1", dtype=dt)(h1), negative_slope=0.01)
        out = nn.Dense(1, name="fc2", dtype=dt)(h2)
        return out[..., 0]  # (b, d, h, w)
