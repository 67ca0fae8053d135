"""Fused metadata-volume kernel: plane-sweep warp + metadata assembly +
the full 202->128->128->1 MLP in one Pallas pass (eval path).

This is the round-2 "fuse the dot-product + metadata-MLP first layer into
the warp kernel" milestone (VERDICT r1, item 6), taken to its limit: the
kernel never materialises the (b,k,d,h,w,16) warped-feature tensor
(~176 MB bf16), the (b,k,d,h,w,3) src-ray tensors, or the (b,d,h,w,128)
MLP hidden activations. Per output scanline it

1. warps every source view to every depth plane with a one-hot MXU
   bilinear gather (same math as ops/warp_kernel.py, with two
   refinements: the one-hot operands are built with the bilinear *hat*
   function max(0, 1 - |iota - x|), which produces both corner weights
   in four VPU ops, and the y-band window is row-granular instead of
   8-aligned, cutting ~1 chunk per plane group),
2. stages the warped features of ALL views in a (K*C, G*W) VMEM scratch
   and contracts them against the first-layer source-visual rows in ONE
   (F, K*C) matmul per plane group (a per-view K=16 contraction costs a
   full MXU pass each — 7x more passes for the same math),
3. computes the metadata channels in closed form — source-view depth z,
   <warped, cur> dot, ray-angle cos and the source-ray unit vector from
   scalar camera geometry:
       src_ray_i = (r_i(u,v) * d - o_i) / n,
       n^2 = d^2 |r|^2 - 2 d <r, o> + |o|^2,
       angle = (d |r|^2 - <r, o>) / (|r| n)
   (r = K^-1 p, o = src-camera origin in the current frame) — no
   (k,d,h,w,3) tensors exist anywhere — and contracts all K*8 metadata
   rows in one matmul per group,
4. applies the remaining MLP layers (fc1, fc2) on the VMEM-resident
   hidden tile and writes only the (D, W) volume slice.

Per-plane/pixel-constant first-layer terms (current-view visuals, current
rays, pose distances, mask [identically 1], fc0 bias) are precomputed in
XLA as a (B, H, F, W) `base` tensor; the plane-depth term is added
in-kernel from w_plane.

Parity: modules/cost_volume.py:938-1146 (FastFeatureVolumeManager) with
the MLP of modules/networks.py:218-233; channel order of the 202-ch
concat per :1117-1135 is honoured through the row slicing of fc0
(see models/volume_mlp.py). Forward-only: training uses the unfused
warp_planes_diff + XLA MLP path, which has a custom VJP.

Round 3 adds the FUSED BACKWARD (`fused_metadata_volume_bwd`): one
Pallas pass that, per output scanline, rematerialises the forward
(warp, metadata, MLP activations — all in VMEM) and backpropagates the
volume cotangent through it, accumulating

- the fc0/fc1/fc2 weight- and bias-gradients across the whole grid in
  VMEM-resident output blocks (constant block index),
- the `base` cotangent (per-scanline, consumed by `jax.vjp` of the
  XLA operand-construction code, which assembles the remaining fc0-row
  gradients and the current-feature gradient),
- the current-feature cotangent from the <warped, cur> metadata dot,
- and the source-feature gradient, either scattered in-kernel through
  the transposed bilinear warp (`fuse_scatter=True`: the (K, H, C, W)
  f32 accumulator block stays VMEM-resident across the scanline axis,
  like ops/warp_kernel._warp_bwd_kernel) or emitted as the warped-
  feature cotangent for the standalone transpose kernel.

Nothing volume-sized ever exists in HBM in either direction: the
unfused VJP's (b,k,d,h,w,16) warped features, (b,k,d,h,w,3) ray
tensors and (b,d,h,w,128) hidden activations are all VMEM-transient.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# planes per group (lane-stacked into one-hot operands); env-overridable
# for on-chip probing (scripts/probe_volume_bwd.py). Round-5 v5e sweep at
# b=12 training shapes: G=8 -> 60.4/129.7 ms (fwd/bwd), G=16 -> 52.9/106.2,
# G=32 -> 52.3/105.4 — wider groups amortise the per-group VPU hat
# construction and widen the matmul N dim; 16 takes ~97% of the win with
# half the Dp padding waste for small plane counts.
_G = int(os.environ.get("IDT_FV_G", "16"))
# unroll the per-view loops so Mosaic can schedule view k+1's VPU hat
# construction against view k's MXU gather matmul (probe flag)
_UNROLL_K = os.environ.get("IDT_FV_UNROLL_K", "0") == "1"


def _fused_kernel(
    # scalar-prefetch / SMEM
    ng_ref,      # (1,) i32 number of plane groups
    A_ref,       # (B, K, 3, 3) f32
    b_ref,       # (B, K, 3) f32
    o_ref,       # (B, K, 3) f32 source origins in current frame
    invK_ref,    # (B, 3, 3) f32
    planes_ref,  # (Dp,) f32
    fc2b_ref,    # (1,) f32
    # VMEM
    src_ref,     # (1, K, Hpad, C, W) cdt source features, c-major rows
    cur_ref,     # (1, 1, C, W) cdt current features, scanline v
    base_ref,    # (1, 1, F, W) f32 precomputed first-layer constants
    w_visT_ref,  # (F, K*C) cdt fc0 rows for source visuals (transposed)
    w_metaT_ref,  # (F, K*8) f32 fc0 rows for [z, dot, angle, sr0..2, 0, 0] per k
    w_plane_ref,  # (F, 1) f32
    w_fc1T_ref,  # (F, F) cdt
    b_fc1_ref,   # (F, 1) f32
    w_fc2_ref,   # (F, 1) f32
    out_ref,     # (1, 1, Dp, W) f32 volume slice for scanline v
    # scratch
    vis_ref,     # (K*C, G*W) cdt warped features of all views, one group
    m_ref,       # (K*8, G*W) f32 metadata rows for one plane group
    *,
    height: int,   # real H (un-padded)
    width: int,
    channels: int,
    num_views: int,
    hidden: int,
):
    bi = pl.program_id(0)
    v = pl.program_id(1)
    cdt = src_ref.dtype
    G = _G
    W = width
    C = channels
    F = hidden
    K = num_views
    GW = G * W

    vv = jnp.float32(v) + 0.5
    u1 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32) + 0.5

    # current-view ray field r(u, v) = invK[:3,:3] @ (u+.5, v+.5, 1)
    ik = [[invK_ref[bi, i, j] for j in range(3)] for i in range(3)]
    r0 = ik[0][0] * u1 + (ik[0][1] * vv + ik[0][2])
    r1 = ik[1][0] * u1 + (ik[1][1] * vv + ik[1][2])
    r2 = ik[2][0] * u1 + (ik[2][1] * vv + ik[2][2])
    rn2 = r0 * r0 + r1 * r1 + r2 * r2       # (1, W)
    rn = jnp.sqrt(rn2)
    rinv = jax.lax.rsqrt(rn2)

    cur_row = cur_ref[0, 0].astype(jnp.float32)  # (C, W)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (W, GW), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1, 1), 0).astype(jnp.float32)
    gi_col = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)

    # metadata rows 6 and 7 of every view are padding for the (F, K*8)
    # matmul: zero them once (their weight columns are zero, but scratch
    # memory is uninitialised and garbage * 0 could be NaN)
    for k in range(num_views):
        m_ref[k * 8 + 6] = jnp.zeros((GW,), jnp.float32)
        m_ref[k * 8 + 7] = jnp.zeros((GW,), jnp.float32)

    def group_body(g, _):
        # depths of this group's planes from SMEM scalars
        dep = jnp.zeros((G, 1), jnp.float32)
        for j in range(G):
            dep = jnp.where(gi_col == j, planes_ref[g * G + j], dep)
        dep_gw = jnp.broadcast_to(dep, (G, W))

        def k_body(k, _):
            a = [[A_ref[bi, k, i, j] for j in range(3)] for i in range(3)]
            b = [b_ref[bi, k, i] for i in range(3)]
            o = [o_ref[bi, k, i] for i in range(3)]

            bx = a[0][0] * u1 + (a[0][1] * vv + a[0][2])   # (1, W)
            by = a[1][0] * u1 + (a[1][1] * vv + a[1][2])
            bz = a[2][0] * u1 + (a[2][1] * vv + a[2][2])
            xr = dep * bx + b[0]                           # (G, W)
            yr = dep * by + b[1]
            z = jnp.maximum(dep * bz + b[2], 1e-5)
            x = jnp.clip(xr / z - 0.5, -2.0 * W, 2.0 * W)
            y = jnp.clip(yr / z - 0.5, -2.0 * height, 2.0 * height)

            # bilinear hat: weight at integer row i is max(0, 1 - |i - x|)
            # == (1-fx) at floor(x) and fx at floor(x)+1, zero elsewhere —
            # both corners in one expression, f32-exact, then cast
            xf = x.reshape(1, GW)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_x - xf)).astype(cdt)  # (W, GW)

            # row-granular y window over [0, height); rows beyond height
            # land in the zero padding (exact for zeros-padding bilinear)
            lo_i = jnp.floor(jnp.min(y)).astype(jnp.int32)
            hi_i = jnp.floor(jnp.max(y)).astype(jnp.int32) + 1
            lo_c = jnp.maximum(lo_i, 0)
            hi_c = jnp.minimum(hi_i, height - 1)
            nrows = hi_c - lo_c + 1
            nch = jnp.where(nrows > 0, (nrows + 7) // 8, 0)
            start = jnp.clip(lo_c, 0, height - 1)

            yf = y.reshape(1, 1, G, W)

            def chunk(ci, warped):
                st = start + ci * 8
                rows = src_ref[0, k, pl.ds(st, 8)]          # (8, C, W)
                lhs = rows.reshape(8 * C, W)
                gx = jnp.dot(lhs, wx, preferred_element_type=jnp.float32)
                gx = gx.reshape(8, C, G, W)
                yg = iota_r + st.astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(yg - yf))  # (8, 1, G, W)
                return warped + jnp.sum(wy * gx, axis=0)    # (C, G, W)

            warped = jax.lax.fori_loop(
                0, nch, chunk, jnp.zeros((C, G, W), jnp.float32)
            )
            vis_ref[pl.ds(k * C, C)] = warped.reshape(C, GW).astype(cdt)

            # metadata rows for the (F, K*8) matmul after the k loop
            dotp = jnp.sum(warped * cur_row[:, None, :], axis=0)
            ro = r0 * o[0] + r1 * o[1] + r2 * o[2]          # (1, W)
            oo = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
            n2 = dep_gw * dep_gw * rn2 - 2.0 * dep_gw * ro + oo
            invn = jax.lax.rsqrt(jnp.maximum(n2, 1e-10))
            angle = (dep_gw * rn2 - ro) * rinv * invn
            base_row = k * 8
            m_ref[base_row + 0] = z.reshape(GW)
            m_ref[base_row + 1] = dotp.reshape(GW)
            m_ref[base_row + 2] = angle.reshape(GW)
            m_ref[base_row + 3] = ((r0 * dep_gw - o[0]) * invn).reshape(GW)
            m_ref[base_row + 4] = ((r1 * dep_gw - o[1]) * invn).reshape(GW)
            m_ref[base_row + 5] = ((r2 * dep_gw - o[2]) * invn).reshape(GW)
            return 0

        jax.lax.fori_loop(0, K, k_body, 0, unroll=_UNROLL_K)

        # first layer: base + plane term + one matmul over all source
        # visuals + one matmul over all metadata rows
        acc = base_ref[0, 0].astype(jnp.float32)          # (F, W)
        acc = jnp.broadcast_to(acc[:, None, :], (F, G, W)).reshape(F, GW)
        acc = acc + w_plane_ref[:, :1] * dep_gw.reshape(1, GW)
        acc = acc + jnp.dot(w_visT_ref[:], vis_ref[:],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(w_metaT_ref[:], m_ref[:],
                            preferred_element_type=jnp.float32)

        # the rest of the MLP, entirely in VMEM (bias b1 folded into base)
        h1 = jnp.where(acc > 0, acc, 0.01 * acc)
        h2 = jnp.dot(w_fc1T_ref[:], h1.astype(cdt),
                     preferred_element_type=jnp.float32) + b_fc1_ref[:, :1]
        h2 = jnp.where(h2 > 0, h2, 0.01 * h2)
        vol = jnp.sum(w_fc2_ref[:, :1] * h2, axis=0) + fc2b_ref[0]  # (GW,)
        out_ref[0, 0, pl.ds(g * G, G), :] = vol.reshape(G, W)
        return 0

    jax.lax.fori_loop(0, ng_ref[0], group_body, 0)


@functools.partial(
    jax.jit, static_argnames=("hidden", "interpret")
)
def fused_metadata_volume(
    cur_feats_bhwc: Array,
    src_feats_bkhwc: Array,
    A_bk33: Array,
    b_bk3: Array,
    origins_bk3: Array,
    invK_b33: Array,
    planes_d: Array,
    base_bhfw: Array,     # (B, H, F, W) f32 precomputed constants (incl. b1)
    w_visT_fkc: Array,    # (F, K*C)
    w_metaT_fm: Array,    # (F, K*8) f32
    w_plane_f1: Array,    # (F, 1) f32
    w_fc1T_ff: Array,     # (F, F)
    b_fc1_f1: Array,      # (F, 1) f32
    w_fc2_f1: Array,      # (F, 1) f32
    b_fc2: Array,         # (1,) f32
    hidden: int = 128,
    interpret: bool = False,
) -> Array:
    """Returns the metadata feature volume (B, D, H, W) f32."""
    B, K, H, W, C = src_feats_bkhwc.shape
    D = planes_d.shape[0]
    F = hidden
    Dp = -(-D // _G) * _G
    Wp = -(-W // 128) * 128
    Hpad = H + 8  # row-granular windows may read up to 7 rows past H

    planes_p = jnp.pad(planes_d.astype(jnp.float32), (0, Dp - D), constant_values=1.0)
    src = jnp.moveaxis(src_feats_bkhwc, -1, 3)   # (B, K, H, C, W)
    src = jnp.pad(src, ((0, 0), (0, 0), (0, Hpad - H), (0, 0), (0, Wp - W)))
    cur = jnp.moveaxis(cur_feats_bhwc, -1, 2)    # (B, H, C, W)
    cur = jnp.pad(cur, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    base = jnp.pad(base_bhfw.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, Wp - W)))

    cdt = src_feats_bkhwc.dtype
    kernel = functools.partial(
        _fused_kernel,
        height=H, width=Wp, channels=C, num_views=K, hidden=F,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ng
            pl.BlockSpec(memory_space=pltpu.SMEM),   # A
            pl.BlockSpec(memory_space=pltpu.SMEM),   # b
            pl.BlockSpec(memory_space=pltpu.SMEM),   # o
            pl.BlockSpec(memory_space=pltpu.SMEM),   # invK
            pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fc2 bias
            pl.BlockSpec((1, K, Hpad, C, Wp), lambda b, v: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_visT
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_metaT
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_plane
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_fc1T
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_fc1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_fc2
        ],
        out_specs=pl.BlockSpec((1, 1, Dp, Wp), lambda b, v: (b, v, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Dp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K * C, _G * Wp), cdt),
            pltpu.VMEM((K * 8, _G * Wp), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([Dp // _G], jnp.int32),
        A_bk33.astype(jnp.float32),
        b_bk3.astype(jnp.float32),
        origins_bk3.astype(jnp.float32),
        invK_b33.astype(jnp.float32),
        planes_p,
        b_fc2.astype(jnp.float32).reshape(1),
        src.astype(cdt),
        cur.astype(cdt),
        base,
        w_visT_fkc.astype(cdt),
        w_metaT_fm.astype(jnp.float32),
        w_plane_f1.astype(jnp.float32),
        w_fc1T_ff.astype(cdt),
        b_fc1_f1.astype(jnp.float32),
        w_fc2_f1.astype(jnp.float32),
    )
    # (B, H, Dp, Wp) -> (B, D, H, W)
    return jnp.moveaxis(out[:, :, :D, :W], 1, 2)


# --------------------------------------------------------------------- #
# fused backward: recompute + backprop + in-kernel scatter, one pass
# --------------------------------------------------------------------- #

def _fused_bwd_kernel(
    # SMEM
    ng_ref,      # (1,) i32 number of plane groups
    A_ref,       # (B, K, 3, 3) f32
    b_ref,       # (B, K, 3) f32
    o_ref,       # (B, K, 3) f32
    invK_ref,    # (B, 3, 3) f32
    planes_ref,  # (Dp,) f32
    # VMEM inputs
    src_ref,     # (1, K, Hpad, C, W) cdt
    cur_ref,     # (1, 1, C, W) cdt current features, scanline v
    base_ref,    # (1, 1, F, W) f32
    ct_ref,      # (1, 1, Dp, W) f32 volume cotangent, scanline v
    w_visT_ref,  # (F, K*C) cdt
    w_metaT_ref,  # (F, K*8) f32
    w_plane_ref,  # (F, 1) f32
    w_fc1T_ref,  # (F, F) cdt   fc1.kernel^T (forward operand)
    w_fc1_ref,   # (F, F) cdt   fc1.kernel   (for dh1)
    b_fc1_ref,   # (F, 1) f32
    w_fc2_ref,   # (F, 1) f32
    w_vis_ref,   # (K*C, F) cdt w_visT^T (for dvis)
    w_dot_ref,   # (8, F) f32   dot-rows of fc0 per view (rows >= K zero)
    # outputs
    dbase_ref,   # (1, 1, F, W) f32 per-scanline base cotangent
    dcur_ref,    # (1, 1, C, W) f32 per-scanline cur-feature cotangent (dot path)
    dwvisT_ref,  # (F, K*C) f32 accumulated across the grid
    dwmetaT_ref,  # (F, K*8) f32
    dwplane_ref,  # (F, 1) f32
    dwfc1T_ref,  # (F, F) f32
    dvec_ref,    # (8, F) f32 row0 db_fc1, row1 dw_fc2, row2[0] db_fc2
    dsrc_ref,    # (1, K, Hpad, C, W) f32 scattered src-feature cotangent
    # scratch
    vis_ref,     # (K*C, G*W) cdt recomputed warped features, one group
    m_ref,       # (K*8, G*W) f32 recomputed metadata rows, one group
    wx_ref,      # (K*W, G*W) cdt per-view bilinear-hat x operands, one group
    y_ref,       # (K*G, W) f32 per-view warp y coords, one group
    st_ref,      # (K,) i32 SMEM per-view chunk window start
    nch_ref,     # (K,) i32 SMEM per-view chunk count
    *,
    height: int,
    width: int,
    channels: int,
    num_views: int,
    hidden: int,
):
    bi = pl.program_id(0)
    v = pl.program_id(1)
    cdt = src_ref.dtype
    G = _G
    W = width
    C = channels
    F = hidden
    K = num_views
    GW = G * W

    @pl.when(jnp.logical_and(bi == 0, v == 0))
    def _zero_param_grads():
        dwvisT_ref[...] = jnp.zeros((F, K * C), jnp.float32)
        dwmetaT_ref[...] = jnp.zeros((F, K * 8), jnp.float32)
        dwplane_ref[...] = jnp.zeros((F, 1), jnp.float32)
        dwfc1T_ref[...] = jnp.zeros((F, F), jnp.float32)
        dvec_ref[...] = jnp.zeros((8, F), jnp.float32)

    @pl.when(v == 0)
    def _zero_dsrc():
        dsrc_ref[...] = jnp.zeros(
            (1, K, height + 8, C, W), jnp.float32)

    dbase_ref[...] = jnp.zeros((1, 1, F, W), jnp.float32)
    dcur_ref[...] = jnp.zeros((1, 1, C, W), jnp.float32)

    vv = jnp.float32(v) + 0.5
    u1 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32) + 0.5

    ik = [[invK_ref[bi, i, j] for j in range(3)] for i in range(3)]
    r0 = ik[0][0] * u1 + (ik[0][1] * vv + ik[0][2])
    r1 = ik[1][0] * u1 + (ik[1][1] * vv + ik[1][2])
    r2 = ik[2][0] * u1 + (ik[2][1] * vv + ik[2][2])
    rn2 = r0 * r0 + r1 * r1 + r2 * r2
    rn = jnp.sqrt(rn2)
    rinv = jax.lax.rsqrt(rn2)

    cur_row = cur_ref[0, 0].astype(jnp.float32)          # (C, W)
    cur_gw = jnp.broadcast_to(cur_row[:, None, :], (C, G, W)).reshape(C, GW)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (W, GW), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1, 1), 0).astype(jnp.float32)
    gi_col = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)

    for k in range(num_views):
        m_ref[k * 8 + 6] = jnp.zeros((GW,), jnp.float32)
        m_ref[k * 8 + 7] = jnp.zeros((GW,), jnp.float32)

    def group_body(g, _):
        dep = jnp.zeros((G, 1), jnp.float32)
        for j in range(G):
            dep = jnp.where(gi_col == j, planes_ref[g * G + j], dep)
        dep_gw = jnp.broadcast_to(dep, (G, W))

        # ---- forward recompute: warp + metadata (same math as _fused_kernel)
        def k_fwd(k, _):
            a = [[A_ref[bi, k, i, j] for j in range(3)] for i in range(3)]
            b = [b_ref[bi, k, i] for i in range(3)]
            o = [o_ref[bi, k, i] for i in range(3)]

            bx = a[0][0] * u1 + (a[0][1] * vv + a[0][2])
            by = a[1][0] * u1 + (a[1][1] * vv + a[1][2])
            bz = a[2][0] * u1 + (a[2][1] * vv + a[2][2])
            xr = dep * bx + b[0]
            yr = dep * by + b[1]
            z = jnp.maximum(dep * bz + b[2], 1e-5)
            x = jnp.clip(xr / z - 0.5, -2.0 * W, 2.0 * W)
            y = jnp.clip(yr / z - 0.5, -2.0 * height, 2.0 * height)

            xf = x.reshape(1, GW)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_x - xf)).astype(cdt)

            lo_c = jnp.maximum(jnp.floor(jnp.min(y)).astype(jnp.int32), 0)
            hi_c = jnp.minimum(jnp.floor(jnp.max(y)).astype(jnp.int32) + 1,
                               height - 1)
            nrows = hi_c - lo_c + 1
            nch = jnp.where(nrows > 0, (nrows + 7) // 8, 0)
            start = jnp.clip(lo_c, 0, height - 1)
            yf = y.reshape(1, 1, G, W)

            def chunk(ci, warped):
                st = start + ci * 8
                rows = src_ref[0, k, pl.ds(st, 8)]
                lhs = rows.reshape(8 * C, W)
                gx = jnp.dot(lhs, wx, preferred_element_type=jnp.float32)
                gx = gx.reshape(8, C, G, W)
                yg = iota_r + st.astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(yg - yf))
                return warped + jnp.sum(wy * gx, axis=0)

            warped = jax.lax.fori_loop(
                0, nch, chunk, jnp.zeros((C, G, W), jnp.float32)
            )
            vis_ref[pl.ds(k * C, C)] = warped.reshape(C, GW).astype(cdt)
            # stage the warp operands for the scatter loop: the hat
            # matrix, the y coords and the chunk window are identical
            # there — recomputing them doubled the VPU work per group
            wx_ref[pl.ds(k * W, W)] = wx
            y_ref[pl.ds(k * G, G)] = y
            st_ref[k] = start
            nch_ref[k] = nch

            dotp = jnp.sum(warped * cur_row[:, None, :], axis=0)
            ro = r0 * o[0] + r1 * o[1] + r2 * o[2]
            oo = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
            n2 = dep_gw * dep_gw * rn2 - 2.0 * dep_gw * ro + oo
            invn = jax.lax.rsqrt(jnp.maximum(n2, 1e-10))
            angle = (dep_gw * rn2 - ro) * rinv * invn
            base_row = k * 8
            m_ref[base_row + 0] = z.reshape(GW)
            m_ref[base_row + 1] = dotp.reshape(GW)
            m_ref[base_row + 2] = angle.reshape(GW)
            m_ref[base_row + 3] = ((r0 * dep_gw - o[0]) * invn).reshape(GW)
            m_ref[base_row + 4] = ((r1 * dep_gw - o[1]) * invn).reshape(GW)
            m_ref[base_row + 5] = ((r2 * dep_gw - o[2]) * invn).reshape(GW)
            return 0

        jax.lax.fori_loop(0, K, k_fwd, 0, unroll=_UNROLL_K)

        # ---- forward recompute: MLP activations (in VMEM)
        acc = base_ref[0, 0].astype(jnp.float32)
        acc = jnp.broadcast_to(acc[:, None, :], (F, G, W)).reshape(F, GW)
        acc = acc + w_plane_ref[:, :1] * dep_gw.reshape(1, GW)
        acc = acc + jnp.dot(w_visT_ref[:], vis_ref[:],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(w_metaT_ref[:], m_ref[:],
                            preferred_element_type=jnp.float32)
        h1 = jnp.where(acc > 0, acc, 0.01 * acc)
        h1c = h1.astype(cdt)
        h2p = jnp.dot(w_fc1T_ref[:], h1c,
                      preferred_element_type=jnp.float32) + b_fc1_ref[:, :1]
        h2 = jnp.where(h2p > 0, h2p, 0.01 * h2p)

        # ---- backward through the MLP
        ctf = ct_ref[0, 0, pl.ds(g * G, G), :].reshape(1, GW)  # (1, GW) f32
        # db_fc2 is accumulated replicated across all F lanes of row 2
        dvec_ref[2] = dvec_ref[2] + jnp.broadcast_to(jnp.sum(ctf), (F,))
        dvec_ref[1] = dvec_ref[1] + jnp.sum(h2 * ctf, axis=1)
        dh2p = (w_fc2_ref[:, :1] * ctf) * jnp.where(h2p > 0, 1.0, 0.01)
        dvec_ref[0] = dvec_ref[0] + jnp.sum(dh2p, axis=1)
        dh2pc = dh2p.astype(cdt)
        dwfc1T_ref[...] = dwfc1T_ref[...] + jnp.dot(
            dh2pc, h1c.T, preferred_element_type=jnp.float32)
        dh1 = jnp.dot(w_fc1_ref[:], dh2pc, preferred_element_type=jnp.float32)
        dacc = dh1 * jnp.where(acc > 0, 1.0, 0.01)
        daccc = dacc.astype(cdt)

        dbase_ref[0, 0] = dbase_ref[0, 0] + jnp.sum(
            dacc.reshape(F, G, W), axis=1)
        dwplane_ref[...] = dwplane_ref[...] + jnp.sum(
            dacc * dep_gw.reshape(1, GW), axis=1)[:, None]
        dwvisT_ref[...] = dwvisT_ref[...] + jnp.dot(
            daccc, vis_ref[:].T, preferred_element_type=jnp.float32)
        dwmetaT_ref[...] = dwmetaT_ref[...] + jnp.dot(
            dacc, m_ref[:].T, preferred_element_type=jnp.float32)

        # cotangent of the warped features: MLP first-layer path + dot path
        dvis = jnp.dot(w_vis_ref[:], daccc,
                       preferred_element_type=jnp.float32)       # (K*C, GW)
        ddot = jnp.dot(w_dot_ref[:], dacc.astype(jnp.float32),
                       preferred_element_type=jnp.float32)       # (8, GW)

        # cur-feature cotangent from the dot metadata: sum_k warped_k * ddot_k
        # (K is static: unrolled, all slices static)
        dcur_cw = jnp.zeros((C, W), jnp.float32)
        for k in range(K):
            vis_k = vis_ref[k * C: (k + 1) * C].astype(jnp.float32)  # (C, GW)
            prod = (vis_k * ddot[k: k + 1]).reshape(C, G, W)
            dcur_cw = dcur_cw + jnp.sum(prod, axis=1)
        dcur_ref[0, 0] = dcur_ref[0, 0] + dcur_cw

        # ---- scatter each view's cotangent back through the warp
        # transpose, reusing the staged hat operands / window from k_fwd
        for k in range(K):
            wx = wx_ref[pl.ds(k * W, W)]
            yf = y_ref[pl.ds(k * G, G)].reshape(1, 1, G, W)
            start = st_ref[k]
            nch = nch_ref[k]

            dvis_k = dvis[k * C: (k + 1) * C] + cur_gw * ddot[k: k + 1]
            ct_cgu = dvis_k.reshape(C, G, W)[None]            # (1, C, G, W)

            def chunk(ci, _, k=k, start=start, yf=yf, wx=wx, ct_cgu=ct_cgu):
                st = start + ci * 8
                yg = iota_r + st.astype(jnp.float32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(yg - yf))  # (8,1,G,W)
                t = (wy * ct_cgu).astype(cdt)                  # (8, C, G, W)
                lhs = t.reshape(8 * C, GW)
                contrib = jnp.dot(lhs, wx.T, preferred_element_type=jnp.float32)
                sl = pl.ds(st, 8)
                dsrc_ref[0, k, sl] = (
                    dsrc_ref[0, k, sl] + contrib.reshape(8, C, W))
                return 0

            jax.lax.fori_loop(0, nch, chunk, 0)
        return 0

    jax.lax.fori_loop(0, ng_ref[0], group_body, 0)


class FusedVolumeCotangents(NamedTuple):
    """Result bundle of fused_metadata_volume_bwd (operand space)."""

    dsrc: Array
    dcur: Array
    dbase: Array
    dw_visT: Array
    dw_metaT: Array
    dw_plane: Array
    dw_fc1T: Array
    db_fc1: Array
    dw_fc2: Array
    db_fc2: Array


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def fused_metadata_volume_bwd(
    ct_bdhw: Array,
    cur_feats_bhwc: Array,
    src_feats_bkhwc: Array,
    A_bk33: Array,
    b_bk3: Array,
    origins_bk3: Array,
    invK_b33: Array,
    planes_d: Array,
    base_bhfw: Array,
    w_visT_fkc: Array,
    w_metaT_fm: Array,
    w_plane_f1: Array,
    w_fc1T_ff: Array,
    b_fc1_f1: Array,
    w_fc2_f1: Array,
    hidden: int = 128,
    interpret: bool = False,
) -> FusedVolumeCotangents:
    """VJP of `fused_metadata_volume` w.r.t. its tensor operands, in one
    Pallas pass (geometry operands A/b/origins/invK/planes are constants
    of the training graph and receive no cotangent)."""
    B, K, H, W, C = src_feats_bkhwc.shape
    D = planes_d.shape[0]
    F = hidden
    Dp = -(-D // _G) * _G
    Wp = -(-W // 128) * 128
    Hpad = H + 8

    planes_p = jnp.pad(planes_d.astype(jnp.float32), (0, Dp - D),
                       constant_values=1.0)
    src = jnp.moveaxis(src_feats_bkhwc, -1, 3)
    src = jnp.pad(src, ((0, 0), (0, 0), (0, Hpad - H), (0, 0), (0, Wp - W)))
    cur = jnp.moveaxis(cur_feats_bhwc, -1, 2)
    cur = jnp.pad(cur, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    base = jnp.pad(base_bhfw.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    # cotangent (B, D, H, W) -> (B, H, Dp, Wp): padded planes/columns get
    # zero cotangent and contribute nothing
    ct = jnp.moveaxis(ct_bdhw.astype(jnp.float32), 1, 2)
    ct = jnp.pad(ct, ((0, 0), (0, 0), (0, Dp - D), (0, Wp - W)))

    cdt = src_feats_bkhwc.dtype
    w_fc1T = w_fc1T_ff.astype(cdt)
    # dot-metadata fc0 rows per view: columns k*8+1 of w_metaT -> (8, F)
    w_meta32 = w_metaT_fm.astype(jnp.float32)
    w_dot = w_meta32.reshape(F, K, 8)[:, :, 1].T          # (K, F)
    w_dot = jnp.pad(w_dot, ((0, -(-K // 8) * 8 - K), (0, 0)))

    kernel = functools.partial(
        _fused_bwd_kernel,
        height=H, width=Wp, channels=C, num_views=K, hidden=F,
    )
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ng
            pl.BlockSpec(memory_space=pltpu.SMEM),   # A
            pl.BlockSpec(memory_space=pltpu.SMEM),   # b
            pl.BlockSpec(memory_space=pltpu.SMEM),   # o
            pl.BlockSpec(memory_space=pltpu.SMEM),   # invK
            pl.BlockSpec(memory_space=pltpu.SMEM),   # planes
            pl.BlockSpec((1, K, Hpad, C, Wp), lambda b, v: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # src
            pl.BlockSpec((1, 1, C, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),   # cur
            pl.BlockSpec((1, 1, F, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),   # base
            pl.BlockSpec((1, 1, Dp, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),   # ct
            const,                                   # w_visT
            const,                                   # w_metaT
            const,                                   # w_plane
            const,                                   # w_fc1T
            const,                                   # w_fc1
            const,                                   # b_fc1
            const,                                   # w_fc2
            const,                                   # w_vis
            const,                                   # w_dot
        ],
        out_specs=[
            pl.BlockSpec((1, 1, F, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),   # dbase
            pl.BlockSpec((1, 1, C, Wp), lambda b, v: (b, v, 0, 0),
                         memory_space=pltpu.VMEM),   # dcur
            pl.BlockSpec((F, K * C), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw_visT
            pl.BlockSpec((F, K * 8), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw_metaT
            pl.BlockSpec((F, 1), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw_plane
            pl.BlockSpec((F, F), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw_fc1T
            pl.BlockSpec((8, F), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dvec
            pl.BlockSpec((1, K, Hpad, C, Wp), lambda b, v: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # dsrc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, F, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, C, Wp), jnp.float32),
            jax.ShapeDtypeStruct((F, K * C), jnp.float32),
            jax.ShapeDtypeStruct((F, K * 8), jnp.float32),
            jax.ShapeDtypeStruct((F, 1), jnp.float32),
            jax.ShapeDtypeStruct((F, F), jnp.float32),
            jax.ShapeDtypeStruct((8, F), jnp.float32),
            jax.ShapeDtypeStruct((B, K, Hpad, C, Wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K * C, _G * Wp), cdt),
            pltpu.VMEM((K * 8, _G * Wp), jnp.float32),
            pltpu.VMEM((K * Wp, _G * Wp), cdt),
            pltpu.VMEM((K * _G, Wp), jnp.float32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
        ],
        # the (K, Hpad, C, W) f32 scatter accumulator + double-buffered src
        # block exceed XLA's default 16 MB scoped-vmem cap; v5e has 128 MB
        # physical VMEM, so raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray([Dp // _G], jnp.int32),
        A_bk33.astype(jnp.float32),
        b_bk3.astype(jnp.float32),
        origins_bk3.astype(jnp.float32),
        invK_b33.astype(jnp.float32),
        planes_p,
        src.astype(cdt),
        cur.astype(cdt),
        base,
        ct,
        w_visT_fkc.astype(cdt),
        w_meta32,
        w_plane_f1.astype(jnp.float32),
        w_fc1T,
        w_fc1T.T,
        b_fc1_f1.astype(jnp.float32),
        w_fc2_f1.astype(jnp.float32),
        w_visT_fkc.astype(cdt).T,
        w_dot,
    )
    dbase, dcur, dw_visT, dw_metaT, dw_plane, dw_fc1T, dvec, dsrc = outs
    return FusedVolumeCotangents(
        dsrc=jnp.moveaxis(dsrc[:, :, :H, :, :W], 3, -1),   # (B, K, H, W, C)
        dcur=jnp.moveaxis(dcur[:, :, :, :W], 2, -1),       # (B, H, W, C)
        dbase=dbase[:, :, :, :W],
        dw_visT=dw_visT,
        dw_metaT=dw_metaT,
        dw_plane=dw_plane,
        dw_fc1T=dw_fc1T,
        db_fc1=dvec[0][:, None],
        dw_fc2=dvec[1][:, None],
        db_fc2=dvec[2, 0].reshape(1),
    )
