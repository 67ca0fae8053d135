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

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.volumes.cost_volume import WarpedViews

Array = jnp.ndarray


def fc0_slices(kernel: Array, k: int, c: int, hidden: int, dtype=None) -> dict:
    """Row slices of the fc0 kernel in the reference concat order
    (modules/cost_volume.py:1117-1135)."""
    w1 = kernel if dtype is None else kernel.astype(dtype)
    o = 0
    out = {}

    def take(name, n):
        nonlocal o
        out[name] = w1[o: o + n]
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
    out["vis_src"] = out["vis_src"].reshape(k, c, hidden)
    out["ray_src"] = out["ray_src"].reshape(k, 3, hidden)
    out["plane"] = out["plane"][0]
    return out


def apply_metadata_mlp(params: dict, wv: WarpedViews, cur_feats_bhwc: Array,
                       *, k: int, c: int, hidden: int, dt) -> Array:
    """Grouped-matmul metadata MLP over a WarpedViews bundle with explicit
    params {fc0_kernel, fc0_bias, fc1:{kernel,bias}, fc2:{kernel,bias}}.
    Pure function of (params, tensors) — differentiable by jax.vjp."""
    w = fc0_slices(params["fc0_kernel"], k, c, hidden, dtype=dt)
    cur = cur_feats_bhwc.astype(dt)

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

    h1 += (wv.depth_planes.astype(dt)[:, None] * w["plane"])[None, :, None, None, :]
    per_pix = jnp.einsum("bhwc,cf->bhwf", cur, w["vis_cur"])
    per_pix += jnp.einsum("bhwi,if->bhwf", wv.cur_rays.astype(dt), w["ray_cur"])
    h1 += per_pix[:, None]
    w_pose = jnp.stack([w["pen"], w["rm"], w["tm"]], axis=-2)  # (k, 3, hidden)
    per_b = jnp.einsum("bki,kif->bf", wv.pose_dist.astype(dt), w_pose)
    h1 += per_b[:, None, None, None, :]

    h1 = nn.leaky_relu(h1 + params["fc0_bias"].astype(dt), negative_slope=0.01)
    h2 = nn.leaky_relu(
        h1 @ params["fc1"]["kernel"].astype(dt) + params["fc1"]["bias"].astype(dt),
        negative_slope=0.01)
    out = h2 @ params["fc2"]["kernel"].astype(dt) + params["fc2"]["bias"].astype(dt)
    return out[..., 0]  # (b, d, h, w)


def _geometry_operands(src_K_bk44, src_T_cur_bk44, cur_invK_b44,
                       cur_T_src_bk44):
    """Kernel geometry operands (constants of the training graph)."""
    from implicit_depth_tpu.core import geometry

    A_bk33, b_bk3 = geometry.homography_components(
        src_K_bk44, src_T_cur_bk44, cur_invK_b44
    )
    origins = cur_T_src_bk44[:, :, :3, 3]
    invK3 = cur_invK_b44[:, :3, :3]
    return A_bk33, b_bk3, origins, invK3


def _weight_operands(params: dict, cur_feats_bhwc: Array, invK3_b33: Array,
                     cur_T_src_bk44: Array, *, k: int, c: int, hidden: int):
    """Differentiable tensor operands of the fused kernel: the (b,h,F,w)
    `base` map of first-layer constants plus the repacked MLP weights.
    `jax.vjp` of this function (w.r.t. params and cur feats) is the
    backward-pass glue that turns kernel cotangents into parameter /
    current-feature gradients."""
    from implicit_depth_tpu.core import geometry

    F = hidden
    h, w = cur_feats_bhwc.shape[1:3]
    sl = fc0_slices(params["fc0_kernel"], k, c, hidden)  # f32 slices

    grid_hw3 = geometry.pixel_grid(h, w)
    rays = jnp.einsum("bij,hwj->bhwi", invK3_b33, grid_hw3,
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
        + params["fc0_bias"]
    )
    base = jnp.moveaxis(base, -1, 2)  # (b, h, F, w)

    w_visT = sl["vis_src"].reshape(k * c, F).T  # (F, k*c), row = k*C + c
    w_meta = jnp.stack(
        [sl["depths"], sl["dot"], sl["angle"],
         sl["ray_src"][:, 0], sl["ray_src"][:, 1], sl["ray_src"][:, 2],
         jnp.zeros_like(sl["depths"]), jnp.zeros_like(sl["depths"])],
        axis=1,
    )  # (k, 8, F)
    w_metaT = w_meta.reshape(k * 8, F).T  # (F, k*8)

    return (base, w_visT, w_metaT, sl["plane"][:, None],
            params["fc1"]["kernel"].T, params["fc1"]["bias"][:, None],
            params["fc2"]["kernel"][:, 0][:, None], params["fc2"]["bias"])


def fused_forward(params: dict, cur_feats_bhwc: Array, src_feats_bkhwc: Array,
                  src_K_bk44: Array, src_T_cur_bk44: Array, cur_invK_b44: Array,
                  cur_T_src_bk44: Array, planes_d: Array,
                  *, k: int, c: int, hidden: int, interpret: bool = False) -> Array:
    """Single-Pallas-kernel warp + metadata + MLP with explicit params
    (the eval fast path; see ops/fused_volume.py for the kernel)."""
    from implicit_depth_tpu.ops.fused_volume import fused_metadata_volume

    A_bk33, b_bk3, origins, invK3 = _geometry_operands(
        src_K_bk44, src_T_cur_bk44, cur_invK_b44, cur_T_src_bk44)
    (base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2, b_fc2) = (
        _weight_operands(params, cur_feats_bhwc, invK3, cur_T_src_bk44,
                         k=k, c=c, hidden=hidden))

    return fused_metadata_volume(
        cur_feats_bhwc, src_feats_bkhwc,
        A_bk33, b_bk3, origins, invK3, planes_d,
        base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2, b_fc2,
        hidden=hidden, interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_diff(k: int, c: int, hidden: int, dt_name: str,
                     interpret: bool, bwd_impl: str = "fused"):
    """Builds the fused-primal volume function for one static config
    (VERDICT r2 item 4): the PRIMAL pass runs the fused Pallas kernel
    (no (k,d,h,w,·) intermediates in HBM, nothing saved but the inputs).

    The BACKWARD pass depends on `bwd_impl`:
    - "fused" (default): one Pallas pass (ops/fused_volume.py::
      fused_metadata_volume_bwd) that rematerialises the forward in VMEM,
      backpropagates the volume cotangent and scatters the source-feature
      gradient through the warp transpose in the same kernel; parameter /
      current-feature gradients are assembled by `jax.vjp` of the XLA
      operand-construction code (_weight_operands).
    - "unfused": rematerialises the mathematically-equivalent unfused
      chain (Pallas warp with its transpose kernel + grouped-matmul MLP)
      and differentiates it.
    The paths agree to bf16 rounding (tests/test_fused_volume.py)."""
    dt = jnp.dtype(dt_name)

    def prim(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes):
        return fused_forward(params, m_cur, m_src, sK, sTc, cinvK, cTs,
                             planes, k=k, c=c, hidden=hidden,
                             interpret=interpret)

    def unfused(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes):
        from implicit_depth_tpu.volumes.cost_volume import build_warped_views

        wv = build_warped_views(
            m_cur, m_src, sK, sTc, cinvK, cTs, planes,
            compute_dtype=dt, use_pallas=not interpret,
        )
        out = apply_metadata_mlp(params, wv, m_cur, k=k, c=c,
                                 hidden=hidden, dt=dt)
        # the fused primal emits f32; the vjp cotangent must match
        return out.astype(jnp.float32)

    @jax.custom_vjp
    def fused_diff(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes):
        return prim(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes)

    def fwd(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes):
        out = prim(params, m_cur, m_src, sK, sTc, cinvK, cTs, planes)
        return out, (params, m_cur, m_src, sK, sTc, cinvK, cTs, planes)

    def bwd_unfused(res, ct):
        params, m_cur, m_src, sK, sTc, cinvK, cTs, planes = res
        _, vjp = jax.vjp(
            lambda p, mc, ms: unfused(p, mc, ms, sK, sTc, cinvK, cTs, planes),
            params, m_cur, m_src,
        )
        dp, dmc, dms = vjp(ct)
        # geometry/planes are constants in the reference's training graph
        return (dp, dmc, dms, jnp.zeros_like(sK), jnp.zeros_like(sTc),
                jnp.zeros_like(cinvK), jnp.zeros_like(cTs),
                jnp.zeros_like(planes))

    def bwd_fused(res, ct):
        from implicit_depth_tpu.ops.fused_volume import fused_metadata_volume_bwd

        params, m_cur, m_src, sK, sTc, cinvK, cTs, planes = res
        A, bb, origins, invK3 = _geometry_operands(sK, sTc, cinvK, cTs)
        wops, opvjp = jax.vjp(
            lambda p, mc: _weight_operands(p, mc, invK3, cTs,
                                           k=k, c=c, hidden=hidden),
            params, m_cur,
        )
        base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2, _b_fc2 = wops
        m_src_c = m_src.astype(dt)
        cts = fused_metadata_volume_bwd(
            ct, m_cur.astype(dt), m_src_c, A, bb, origins, invK3, planes,
            base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2,
            hidden=hidden, interpret=interpret,
        )
        dp, dmc = opvjp((cts.dbase, cts.dw_visT, cts.dw_metaT, cts.dw_plane,
                         cts.dw_fc1T, cts.db_fc1, cts.dw_fc2, cts.db_fc2))
        dmc = dmc + cts.dcur.astype(dmc.dtype)
        dms = cts.dsrc.astype(m_src.dtype)
        return (dp, dmc, dms, jnp.zeros_like(sK), jnp.zeros_like(sTc),
                jnp.zeros_like(cinvK), jnp.zeros_like(cTs),
                jnp.zeros_like(planes))

    bwd = bwd_fused if bwd_impl == "fused" else bwd_unfused

    fused_diff.defvjp(fwd, bwd)
    return fused_diff


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

    def _params_dict(self) -> dict:
        return {
            "fc0_kernel": self.fc0_kernel,
            "fc0_bias": self.fc0_bias,
            "fc1": {"kernel": self.fc1.variables["params"]["kernel"],
                    "bias": self.fc1.variables["params"]["bias"]},
            "fc2": {"kernel": self.fc2.variables["params"]["kernel"],
                    "bias": self.fc2.variables["params"]["bias"]},
        }

    def __call__(self, wv: WarpedViews, cur_feats_bhwc: Array) -> Array:
        # materialise fc1/fc2 params during init (apply_metadata_mlp reads
        # them without calling the submodules)
        if self.is_initializing():
            dummy = jnp.zeros((1, self.hidden), self.compute_dtype)
            self.fc2(self.fc1(dummy))
        return apply_metadata_mlp(
            self._params_dict(), wv, cur_feats_bhwc,
            k=self.num_src_views, c=self.matching_dim, hidden=self.hidden,
            dt=self.compute_dtype,
        )

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
        return fused_forward(
            self._params_dict(), cur_feats_bhwc, src_feats_bkhwc,
            src_K_bk44, src_T_cur_bk44, cur_invK_b44, cur_T_src_bk44,
            planes_d, k=self.num_src_views, c=self.matching_dim,
            hidden=self.hidden, interpret=interpret,
        )

    def fused_train(
        self,
        cur_feats_bhwc: Array,
        src_feats_bkhwc: Array,
        src_K_bk44: Array,
        src_T_cur_bk44: Array,
        cur_invK_b44: Array,
        cur_T_src_bk44: Array,
        planes_d: Array,
        interpret: bool = False,
        bwd_impl: str = "fused",
    ) -> Array:
        """Differentiable fused volume: fused-kernel PRIMAL plus a custom
        VJP — by default the fused Pallas backward pass (recompute +
        backprop + warp-transpose scatter in one kernel; see
        ops/fused_volume.py), or the rematerialised unfused chain
        (bwd_impl="unfused"). Replaces remat-over-the-unfused-chain on
        the TPU training path: the forward pays the fused kernel's cost
        and stores only the inputs (VERDICT r2 item 4)."""
        fn = _make_fused_diff(
            self.num_src_views, self.matching_dim, self.hidden,
            jnp.dtype(self.compute_dtype).name, interpret, bwd_impl,
        )
        return fn(self._params_dict(), cur_feats_bhwc, src_feats_bkhwc,
                  src_K_bk44, src_T_cur_bk44, cur_invK_b44, cur_T_src_bk44,
                  planes_d)
