"""Pallas TPU kernel for the plane-sweep warp (the framework's hottest op).

Replaces CUDA grid_sample (modules/cost_volume.py:886-892) on the
(7 views x 64 planes x 96x128) warp. XLA's row-gather runs this in
~200 ms on a v5e chip; this kernel reformulates the bilinear sample as
matrix algebra that lives on the MXU/VPU:

- For one output scanline v of one view k, the source x-gather at
  columns x0(u) / x0(u)+1 is a pair of one-hot matmuls. 0/1 one-hots are
  exactly representable in bf16, so zeros padding and border handling
  are exact, matching torch grid_sample(align_corners=False,
  padding_mode='zeros').
- Planes are processed in GROUPS of 8: the one-hots of 8 planes stack
  along the lane axis into (128, 1024) operands, so each chunk costs two
  (128,128)@(128,1024) MXU matmuls instead of 16 small ones.
- The y-selection is a per-chunk one-hot mask (VPU multiply-reduce over
  8 rows at a time); fx/fy fractional blending happens in fp32.
- A dynamic band loop over the UNION y-range of the plane group skips
  chunks no plane touches — typical camera motion touches 2-4 of 12.

The matching width (128) equals the TPU lane count, which makes the
one-hot matmuls square in the contraction dim.

Exactness: identical 4-corner weighted sum as core.sampling
(= torch grid_sample) up to bf16/fp32 rounding; verified in
tests/test_warp_kernel.py against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_CHUNK = 8   # y rows per chunk
_PGROUP = 8  # planes per matmul group


def _warp_kernel(
    ng_ref,       # (1,) i32 runtime plane-group count (defeats unrolling)
    A_ref,        # (K, 3, 3) f32: srcK @ R @ curK^-1 per view
    b_ref,        # (K, 3) f32: srcK @ t per view
    planes_ref,   # (D,) f32 depth planes
    src_ref,      # (1, H, C, W) bf16 source features, c-major rows
    out_ref,      # (1, 1, D, C, W) warped output for scanline v
    *,
    height: int,
    width: int,
    channels: int,
    num_planes: int,
):
    k = pl.program_id(0)
    v = pl.program_id(1)

    cdt = src_ref.dtype
    G = _PGROUP
    # u coordinates replicated per plane-of-group: (G, W) row-major g
    u = jax.lax.broadcasted_iota(jnp.int32, (G, width), 1).astype(jnp.float32) + 0.5
    vv = jnp.float32(v) + 0.5

    a = [[A_ref[k, i, j] for j in range(3)] for i in range(3)]
    b = [b_ref[k, i] for i in range(3)]

    # [x, g*u] iota for the stacked one-hots
    iota_x_gu = jax.lax.broadcasted_iota(jnp.int32, (width, G * width), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1, 1), 0).astype(jnp.float32)

    def group_body(g, _):
        # depths of this group's planes: (G, 1) -> broadcast over u
        # SMEM only serves scalar loads on the compiled path: assemble the
        # group's depth column from G scalar reads via one-hot selects
        gi_col = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        dep = jnp.zeros((G, 1), jnp.float32)
        for j in range(G):
            dep = jnp.where(gi_col == j, planes_ref[g * G + j], dep)

        r0 = dep * (a[0][0] * u + a[0][1] * vv + a[0][2]) + b[0]
        r1 = dep * (a[1][0] * u + a[1][1] * vv + a[1][2]) + b[1]
        r2 = dep * (a[2][0] * u + a[2][1] * vv + a[2][2]) + b[2]
        z = jnp.maximum(r2, 1e-5)
        x = jnp.clip(r0 / z - 0.5, -2.0 * width, 2.0 * width)
        y = jnp.clip(r1 / z - 0.5, -2.0 * height, 2.0 * height)

        # x interpolation folded into the matmul operand with the bilinear
        # hat max(0, 1 - |i - x|): (1-fx) at floor(x), fx at floor(x)+1,
        # zero elsewhere — both corners in one f32-exact expression, then
        # cast (bf16 rounds the corner weights, <=2^-8 relative, matching
        # the bf16 feature storage precision). Zeros padding stays exact.
        x_flat = x.reshape(1, G * width)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_x_gu - x_flat)).astype(cdt)

        # row-granular union band over the group: rows [start, start+8*nch)
        # cover floor(min y)..floor(max y)+1 clipped to [0, height); reads
        # past `height` land in the zero padding (exact)
        lo_c = jnp.maximum(jnp.floor(jnp.min(y)).astype(jnp.int32), 0)
        hi_c = jnp.minimum(jnp.floor(jnp.max(y)).astype(jnp.int32) + 1, height - 1)
        nrows = hi_c - lo_c + 1
        nch = jnp.where(nrows > 0, (nrows + _CHUNK - 1) // _CHUNK, 0)
        start = jnp.clip(lo_c, 0, height - 1)

        y_rgu = y.reshape(1, 1, G, width)

        def chunk_body(ci, acc):
            st = start + ci * _CHUNK
            rows = src_ref[0, pl.ds(st, _CHUNK)]  # (8, C, W)
            lhs = rows.reshape(_CHUNK * channels, width)
            gx = jnp.dot(lhs, wx, preferred_element_type=jnp.float32)
            gx = gx.reshape(_CHUNK, channels, G, width)
            y_global = iota_r + st.astype(jnp.float32)   # (8,1,1,1)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_global - y_rgu))  # (8,1,G,W)
            return acc + jnp.sum(wy * gx, axis=0)

        zero = jnp.zeros((channels, G, width), jnp.float32)
        out = jax.lax.fori_loop(0, nch, chunk_body, zero)  # (C, G, W)
        out_ref[0, 0, pl.ds(g * G, G)] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng_ref[0], group_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_planes(
    src_feats_khwc: Array,
    A_k33: Array,
    b_k3: Array,
    planes_d: Array,
    interpret: bool = False,
) -> Array:
    """Warps source-view features to the current view at every depth plane.

    Args:
        src_feats_khwc: (K, H, W, C) source matching features (bf16/f32).
        A_k33: (K, 3, 3) fp32, srcK[:3,:3] @ R @ curK^-1[:3,:3].
        b_k3: (K, 3) fp32, srcK[:3,:3] @ t.
        planes_d: (D,) fp32 depth planes; D must be a multiple of 8
            (padded internally otherwise).

    Returns:
        (K, D, H, W, C) warped features, same dtype as src_feats.

    Coordinate convention matches core.volumes: pixel p = (u+.5, v+.5, 1),
    sample position (x/z - 0.5, y/z - 0.5) in index space with z clamped
    at 1e-5, bilinear with zeros padding.
    """
    K, H, W, C = src_feats_khwc.shape
    D = planes_d.shape[0]
    Dp = -(-D // _PGROUP) * _PGROUP
    planes_padded = jnp.pad(planes_d.astype(jnp.float32), (0, Dp - D),
                            constant_values=1.0)
    # lane tiling for arbitrary shapes: pad W to the 128-lane multiple
    # with ZERO columns (padded *output* columns are junk, sliced off
    # below). Source rows get 8 extra ZERO rows so the row-granular
    # 8-row windows may overrun `height` — zeros padding is exact:
    # bilinear-with-zeros treats out-of-range corners as 0, so a sample
    # straddling the real border blends against genuine zeros either way.
    Wp = -(-W // 128) * 128
    Hp = H + _CHUNK
    src = jnp.pad(src_feats_khwc, ((0, 0), (0, _CHUNK), (0, Wp - W), (0, 0)))
    src_cmaj = jnp.moveaxis(src, -1, 2)  # (K, Hp, C, Wp)

    kernel = functools.partial(
        _warp_kernel, height=H, width=Wp, channels=C, num_planes=Dp
    )
    out = pl.pallas_call(
        kernel,
        grid=(K, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hp, C, Wp), lambda k, v: (k, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Dp, C, Wp), lambda k, v: (k, v, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, H, Dp, C, Wp), src_feats_khwc.dtype),
        interpret=interpret,
    )(
        jnp.asarray([Dp // _PGROUP], jnp.int32),
        A_k33.astype(jnp.float32),
        b_k3.astype(jnp.float32),
        planes_padded,
        src_cmaj,
    )
    # (K, V, D, C, Wp) -> (K, D, V(H), W, C)
    return jnp.transpose(out[:, :, :D, :, :W], (0, 2, 1, 4, 3))


# --------------------------------------------------------------------- #
# backward (transpose) kernel + custom VJP
# --------------------------------------------------------------------- #

def _warp_bwd_kernel(
    ng_ref,       # (1,) i32 runtime plane-group count
    A_ref,        # (K, 3, 3) f32
    b_ref,        # (K, 3) f32
    planes_ref,   # (D,) f32
    ct_ref,       # (1, 1, D, C, W) cotangent for scanline v of view k
    out_ref,      # (1, H, C, W) accumulated source-feature cotangent
    *,
    height: int,
    width: int,
    channels: int,
    num_planes: int,
):
    """Transpose of _warp_kernel: scatters each scanline's cotangent back
    into the source rows it sampled. The (k)-indexed output block stays
    VMEM-resident across the v grid axis and is zeroed at v == 0."""
    k = pl.program_id(0)
    v = pl.program_id(1)

    cdt = ct_ref.dtype
    G = _PGROUP
    u = jax.lax.broadcasted_iota(jnp.int32, (G, width), 1).astype(jnp.float32) + 0.5
    vv = jnp.float32(v) + 0.5

    a = [[A_ref[k, i, j] for j in range(3)] for i in range(3)]
    b = [b_ref[k, i] for i in range(3)]

    iota_x_gu = jax.lax.broadcasted_iota(jnp.int32, (width, G * width), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1, 1), 0).astype(jnp.float32)

    @pl.when(v == 0)
    def _init():
        out_ref[0] = jnp.zeros((height + _CHUNK, channels, width), out_ref.dtype)

    def group_body(g, _):
        gi_col = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        dep = jnp.zeros((G, 1), jnp.float32)
        for j in range(G):
            dep = jnp.where(gi_col == j, planes_ref[g * G + j], dep)

        r0 = dep * (a[0][0] * u + a[0][1] * vv + a[0][2]) + b[0]
        r1 = dep * (a[1][0] * u + a[1][1] * vv + a[1][2]) + b[1]
        r2 = dep * (a[2][0] * u + a[2][1] * vv + a[2][2]) + b[2]
        z = jnp.maximum(r2, 1e-5)
        x = jnp.clip(r0 / z - 0.5, -2.0 * width, 2.0 * width)
        y = jnp.clip(r1 / z - 0.5, -2.0 * height, 2.0 * height)

        # bilinear hat operands + row-granular window (see _warp_kernel)
        x_flat = x.reshape(1, G * width)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_x_gu - x_flat)).astype(cdt)

        lo_c = jnp.maximum(jnp.floor(jnp.min(y)).astype(jnp.int32), 0)
        hi_c = jnp.minimum(jnp.floor(jnp.max(y)).astype(jnp.int32) + 1, height - 1)
        nrows = hi_c - lo_c + 1
        nch = jnp.where(nrows > 0, (nrows + _CHUNK - 1) // _CHUNK, 0)
        start = jnp.clip(lo_c, 0, height - 1)

        y_rgu = y.reshape(1, 1, G, width)
        # cotangent of this plane group: (G, C, W) -> (1, C, G, W)
        ct = ct_ref[0, 0, pl.ds(g * G, G)].astype(jnp.float32)
        ct_cgu = jnp.transpose(ct, (1, 0, 2))[None]  # (1, C, G, W)

        def chunk_body(ci, _):
            st = start + ci * _CHUNK
            y_global = iota_r + st.astype(jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_global - y_rgu))  # (8,1,G,W)
            t = (wy * ct_cgu).astype(cdt)            # (8, C, G, W)
            lhs = t.reshape(_CHUNK * channels, G * width)
            # scatter along x: (rc, gu) @ (gu, x) = (rc, x)
            contrib = jnp.dot(lhs, wx.T, preferred_element_type=jnp.float32)
            contrib = contrib.reshape(_CHUNK, channels, width)
            sl = pl.ds(st, _CHUNK)
            out_ref[0, sl] = out_ref[0, sl] + contrib.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, ng_ref[0], group_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_planes_bwd(
    ct_kdhwc: Array,
    A_k33: Array,
    b_k3: Array,
    planes_d: Array,
    interpret: bool = False,
) -> Array:
    """d(warp_planes)/d(src_feats) applied to cotangent ct (K, D, H, W, C).
    Returns (K, H, W, C)."""
    K, D, H, W, C = ct_kdhwc.shape
    Dp = -(-D // _PGROUP) * _PGROUP
    Wp = -(-W // 128) * 128
    Hp = H + _CHUNK  # row-granular windows may scatter up to 7 rows past H
    ct = jnp.transpose(ct_kdhwc, (0, 2, 1, 4, 3))  # (K, V, D, C, W)
    if Dp != D or Wp != W:
        # zero cotangent on padded planes/columns scatters nothing — exact
        ct = jnp.pad(ct, ((0, 0), (0, 0), (0, Dp - D), (0, 0), (0, Wp - W)))
    planes_padded = jnp.pad(planes_d.astype(jnp.float32), (0, Dp - D), constant_values=1.0)

    kernel = functools.partial(
        _warp_bwd_kernel, height=H, width=Wp, channels=C, num_planes=Dp
    )
    # accumulate in f32 regardless of ct dtype for stable reductions
    out = pl.pallas_call(
        kernel,
        grid=(K, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Dp, C, Wp), lambda k, v: (k, v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hp, C, Wp), lambda k, v: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, Hp, C, Wp), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray([Dp // _PGROUP], jnp.int32),
        A_k33.astype(jnp.float32),
        b_k3.astype(jnp.float32),
        planes_padded,
        ct,
    )
    return jnp.moveaxis(out[:, :H, :, :W], 2, -1).astype(ct_kdhwc.dtype)  # (K, H, W, C)


@jax.custom_vjp
def warp_planes_diff(src_feats_khwc: Array, A_k33: Array, b_k3: Array, planes_d: Array) -> Array:
    """Differentiable warp_planes (gradients flow to src features only;
    poses/intrinsics/planes are treated as constants, as in the
    reference's training graph)."""
    return warp_planes(src_feats_khwc, A_k33, b_k3, planes_d)


def _warp_fwd(src, A, b, planes):
    return warp_planes(src, A, b, planes), (A, b, planes)


def _warp_bwd(res, ct):
    A, b, planes = res
    return (
        warp_planes_bwd(ct, A, b, planes),
        jnp.zeros_like(A),
        jnp.zeros_like(b),
        jnp.zeros_like(planes),
    )


warp_planes_diff.defvjp(_warp_fwd, _warp_bwd)
