"""Pallas TPU kernel for the plane-sweep warp (the framework's hottest op).

Replaces CUDA grid_sample (modules/cost_volume.py:886-892) on the
(7 views x 64 planes x 96x128) warp. XLA's row-gather runs this in
~200 ms on a v5e chip; this kernel reformulates the bilinear sample as
matrix algebra that lives on the MXU/VPU:

- For one output scanline v of one view k, the source x-gather at
  columns x0(u) / x0(u)+1 is TWO one-hot matmuls
  (src_rows (y_chunk*c, x=128) @ onehot (x=128, u=128)). 0/1 one-hots
  are exactly representable in bf16, so zeros padding and border
  handling are exact, matching torch grid_sample(align_corners=False,
  padding_mode='zeros').
- The y-selection is a per-chunk one-hot mask (VPU multiply-reduce over
  8 rows at a time); the fractional fx/fy blending happens in fp32.
- A dynamic band loop skips y-chunks outside [min(y0), max(y0)+1] for
  the scanline — typical camera motion touches 1-3 of 12 chunks.

The matching width (128) equals the TPU lane count, which makes the
one-hot matmuls square 128x128 MXU ops.

Exactness: identical 4-corner weighted sum as core.sampling
(= torch grid_sample) up to fp32 rounding; verified in
tests/test_warp_kernel.py against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_CHUNK = 8  # y rows per chunk


def _warp_kernel(
    nd_ref,       # (1,) i32 runtime plane count == D (defeats loop unrolling)
    A_ref,        # (K, 3, 3) f32: srcK @ R @ curK^-1 per view
    b_ref,        # (K, 3) f32: srcK @ t per view
    planes_ref,   # (D,) f32 depth planes
    src_ref,      # (1, H, C, W) bf16 source features, c-major rows
    out_ref,      # (1, 1, D, C, W) bf16 warped output for scanline v
    *,
    height: int,
    width: int,
    channels: int,
    num_planes: int,
):
    k = pl.program_id(0)
    v = pl.program_id(1)

    cdt = src_ref.dtype
    u = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1).astype(jnp.float32) + 0.5
    vv = jnp.float32(v) + 0.5

    # per-view homography pieces (scalars)
    a = [[A_ref[k, i, j] for j in range(3)] for i in range(3)]
    b = [b_ref[k, i] for i in range(3)]

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (width, width), 0).astype(jnp.float32)  # [x, u]
    iota_rc = jax.lax.broadcasted_iota(
        jnp.int32, (_CHUNK, channels, width), 0
    ).astype(jnp.float32)  # row index within chunk, broadcast over (c, u)

    num_chunks = height // _CHUNK

    def plane_body(d, _):
        dep = planes_ref[d]
        # projective coords for this scanline at plane depth dep
        r0 = dep * (a[0][0] * u + a[0][1] * vv + a[0][2]) + b[0]
        r1 = dep * (a[1][0] * u + a[1][1] * vv + a[1][2]) + b[1]
        r2 = dep * (a[2][0] * u + a[2][1] * vv + a[2][2]) + b[2]
        z = jnp.maximum(r2, 1e-5)
        x = jnp.clip(r0 / z - 0.5, -2.0 * width, 2.0 * width)
        y = jnp.clip(r1 / z - 0.5, -2.0 * height, 2.0 * height)

        x0 = jnp.floor(x)
        fx = x - x0
        y0 = jnp.floor(y)
        fy = y - y0

        # x one-hots (x0 and x0+1), exact 0/1 in bf16
        ohx0 = (iota_x == x0).astype(cdt)          # (x, u)
        ohx1 = (iota_x == (x0 + 1.0)).astype(cdt)  # (x, u)

        # dynamic y band
        lo = jnp.clip((jnp.min(y0) / _CHUNK).astype(jnp.int32), 0, num_chunks)
        hi = jnp.clip(
            ((jnp.max(y0) + 1.0) / _CHUNK).astype(jnp.int32) + 1, lo, num_chunks
        )

        def chunk_body(ci, accs):
            t00, t01, t10, t11 = accs
            rows = src_ref[0, pl.ds(ci * _CHUNK, _CHUNK)]  # (8, C, W)
            lhs = rows.reshape(_CHUNK * channels, width)
            g0 = jnp.dot(lhs, ohx0, preferred_element_type=jnp.float32)
            g1 = jnp.dot(lhs, ohx1, preferred_element_type=jnp.float32)
            g0 = g0.reshape(_CHUNK, channels, width)
            g1 = g1.reshape(_CHUNK, channels, width)
            y_global = iota_rc + jnp.float32(ci * _CHUNK)
            ohy0 = (y_global == y0[0]).astype(jnp.float32)        # (8, C, W)
            ohy1 = (y_global == (y0[0] + 1.0)).astype(jnp.float32)
            t00 = t00 + jnp.sum(ohy0 * g0, axis=0)
            t01 = t01 + jnp.sum(ohy0 * g1, axis=0)
            t10 = t10 + jnp.sum(ohy1 * g0, axis=0)
            t11 = t11 + jnp.sum(ohy1 * g1, axis=0)
            return t00, t01, t10, t11

        zero = jnp.zeros((channels, width), jnp.float32)
        t00, t01, t10, t11 = jax.lax.fori_loop(
            lo, hi, chunk_body, (zero, zero, zero, zero)
        )

        fx_c = fx[0][None, :]  # (1, W) broadcast over channels
        fy_c = fy[0][None, :]
        top = (1.0 - fx_c) * t00 + fx_c * t01
        bot = (1.0 - fx_c) * t10 + fx_c * t11
        out = (1.0 - fy_c) * top + fy_c * bot
        out_ref[0, 0, d] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nd_ref[0], plane_body, 0)


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
        planes_d: (D,) fp32 depth planes.

    Returns:
        (K, D, H, W, C) warped features, same dtype as src_feats.

    Coordinate convention matches core.volumes: pixel p = (u+.5, v+.5, 1),
    sample position (x/z - 0.5, y/z - 0.5) in index space with z clamped
    at 1e-5, bilinear with zeros padding.
    """
    K, H, W, C = src_feats_khwc.shape
    D = planes_d.shape[0]
    src_cmaj = jnp.moveaxis(src_feats_khwc, -1, 2)  # (K, H, C, W)

    kernel = functools.partial(
        _warp_kernel, height=H, width=W, channels=C, num_planes=D
    )
    out = pl.pallas_call(
        kernel,
        grid=(K, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, C, W), lambda k, v: (k, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D, C, W), lambda k, v: (k, v, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, H, D, C, W), src_feats_khwc.dtype),
        interpret=interpret,
    )(jnp.asarray([D], jnp.int32), A_k33.astype(jnp.float32), b_k3.astype(jnp.float32), planes_d.astype(jnp.float32), src_cmaj)
    # (K, V, D, C, W) -> (K, D, V(H), W, C)
    return jnp.transpose(out, (0, 2, 1, 4, 3))
