"""Fused ray-head MLP Pallas kernel (train query head).

The BD training head evaluates, per scale, a 3-layer MLP on every
(ray, depth-sample) pair: fc0(concat[depth, feat, prior]) -> elu ->
fc1 -> elu -> fc2 (reference modules/networks.py:87-115, driven by
experiment_modules/bd_model.py:313-393). After the factored-fc0 rewrite
(models/decoders.py::BinaryMLPNetwork.factored) the per-ray feature term
`fp = feat @ W_feat + b0` is computed once per ray in XLA; what remains
per (ray, sample) is

    pred = fc2(elu(fc1(elu(fp + d * k0_d [+ p * k0_p]))))

whose (b, N, S, 128) hidden activations dominate the head's HBM traffic
at training shapes (b=12, N=4096, S=64: ~0.4 GB per bf16 activation
tensor, several GB round-trip fwd+bwd). This kernel keeps the hiddens in
VMEM: per grid step it loads one (RT, 128) tile of per-ray terms plus
(RT, S) depth / prior tiles, expands them to the (S*RT, 128) hidden
batch, runs the two MXU matmuls, and writes only the (RT, S)
predictions. Mosaic cannot relayout lanes into sublanes, so the
(RT, S) <-> (S*RT, 1) expansion/collapse rides the MXU as exact one-hot
selection matmuls (iota-built selectors; the same trick as the fused
volume kernel's gather).

The custom VJP rematerialises the tile in VMEM and emits, in one pass,
the per-ray cotangent dfp, the depth/prior cotangents, and all
fc0-column/fc1/fc2 weight gradients, accumulated across the whole grid
in VMEM-resident f32 blocks (the revisited-output-block idiom of
ops/fused_volume.py). Sums over the (S*RT) row dimension ride the MXU as
ones-vector contractions so they accumulate in f32 even though the
activation chain is bf16 — the same bf16-chain / f32-accumulate
discipline as the XLA factored path it replaces.

Rows are s-major (row = s * RT + r), RT = 64 rays per grid step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# rays per grid step, forward/backward. RT=64 is the measured optimum
# on TPU v5e for BOTH passes (scripts/probe_ray_head.py sweep, round 5):
# RT=128 halves the grid-step count but times SLOWER (fwd 13.06 ms vs
# 11.68 at b=12 — the kernel is pipeline/HBM-bound, not grid-latency-
# bound as round 4 conjectured), and RT=256 exceeds the 16 MB scoped
# VMEM limit in the forward (31.84 MB requested). Env-overridable for
# probing (scripts/probe_ray_head.py --rt_fwd/--rt_bwd).
_RT_FWD = int(os.environ.get("IDT_RAY_HEAD_RT_FWD", "64"))
_RT_BWD = int(os.environ.get("IDT_RAY_HEAD_RT_BWD", "64"))
_F = 128   # hidden width (reference mlp_size, networks.py:92)
_CDT = jnp.bfloat16


def _elu(z):
    # comparisons/exp in f32: the v5e VPU has no packed-bf16 compare
    z32 = z.astype(jnp.float32)
    return jnp.where(z32 > 0, z32, jnp.exp(z32) - 1.0).astype(_CDT)


def _delu(h):
    # elu'(z) from h = elu(z): 1 where z>0 else exp(z) = h+1
    h32 = h.astype(jnp.float32)
    return jnp.where(h32 > 0, jnp.float32(1.0), h32 + 1.0).astype(_CDT)


def _selectors_host(rt: int, s: int):
    """One-hot constants mapping (RT, S) tiles <-> (M=S*RT, 1) row columns
    (rows s-major). Mosaic cannot relayout lanes into sublanes, so the
    expansion/collapse rides the MXU instead (exact: one-hot products).
    Built in XLA and passed as kernel inputs with a constant index_map so
    they are fetched once and stay VMEM-resident across the grid.
    B1[m, r] = [m % RT == r]; M1[m, j] = [m // RT == j]."""
    m = s * rt
    i0 = jax.lax.broadcasted_iota(jnp.int32, (m, rt), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (m, rt), 1)
    b1 = (i0 % rt == i1).astype(_CDT)
    j0 = jax.lax.broadcasted_iota(jnp.int32, (m, s), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (m, s), 1)
    m1 = (j0 // rt == j1).astype(_CDT)
    return b1, m1


def _expand(ref, b1, m1, rt: int, s: int):
    """(1, RT, S) ref -> (M, 1) bf16 column, rows s-major: one MXU gather
    (B1 @ tile) masked to the row's own sample and row-summed. Exact:
    every output row sums exactly one bf16 value."""
    sel = jax.lax.dot_general(b1, ref[0].astype(_CDT),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (M, S)
    sel = (sel.astype(_CDT) * m1)
    ones = jnp.ones((s, 1), _CDT)
    return jax.lax.dot_general(sel, ones, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(_CDT)                      # (M, 1)


def _collapse(col, b1, m1):
    """(M, 1) f32 column -> (RT, S) f32 tile (inverse of _expand)."""
    p2 = jnp.broadcast_to(col.astype(_CDT), m1.shape) * m1
    return jax.lax.dot_general(b1, p2, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (RT, S)


def _colsum(x_mf):
    """f32 (1, F) sum over rows of a bf16 (M, F) array, MXU-accumulated."""
    m = x_mf.shape[0]
    ones = jnp.ones((m, 1), _CDT)
    return jax.lax.dot_general(ones, x_mf, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _rowsum(x_mf):
    """f32 (M, 1) sum over lanes, MXU-accumulated."""
    ones = jnp.ones((_F, 1), _CDT)
    return jax.lax.dot_general(x_mf, ones, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_tile(fp_ref, p_ref, k0_ref, w1_ref, b1_ref,
                  dcol, pcol, rt: int, s: int):
    """Recomputable forward: returns (h, h2) bf16 (S*RT, F) activations."""
    fp = fp_ref[0].astype(_CDT)
    k0d = k0_ref[0:1].astype(_CDT)
    rep = jnp.broadcast_to(fp[None], (s, rt, _F)).reshape(s * rt, _F)
    z = rep + dcol * k0d
    if p_ref is not None:
        z = z + pcol * k0_ref[1:2].astype(_CDT)
    h = _elu(z)                                                # (S*RT, F)
    z2 = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = _elu(z2 + b1_ref[0:1])
    return h, h2


def _fwd_kernel(b1s_ref, m1s_ref, fp_ref, d_ref, p_ref, k0_ref, w1_ref,
                b1_ref, w2_ref, out_ref, *, rt: int, s: int):
    b1s, m1s = b1s_ref[...], m1s_ref[...]
    dcol = _expand(d_ref, b1s, m1s, rt, s)
    pcol = _expand(p_ref, b1s, m1s, rt, s) if p_ref is not None else None
    _, h2 = _forward_tile(fp_ref, p_ref, k0_ref, w1_ref, b1_ref,
                          dcol, pcol, rt, s)
    # w2_ref rows: 0 = fc2 kernel column, 1 = fc2 bias (replicated)
    pred = _rowsum((h2 * w2_ref[0:1].astype(_CDT)).astype(_CDT))  # (S*RT, 1)
    pred = pred + w2_ref[1:2, 0:1]  # fc2 bias (sublane-only broadcast)
    out_ref[0] = _collapse(pred, b1s, m1s).astype(out_ref.dtype)


def _fwd_kernel_noprior(b1s_ref, m1s_ref, fp_ref, d_ref, k0_ref, w1_ref,
                        b1_ref, w2_ref, out_ref, *, rt: int, s: int):
    _fwd_kernel(b1s_ref, m1s_ref, fp_ref, d_ref, None, k0_ref, w1_ref,
                b1_ref, w2_ref, out_ref, rt=rt, s=s)


def _bwd_kernel(b1s_ref, m1s_ref, fp_ref, d_ref, p_ref, ct_ref, k0_ref,
                w1_ref, b1_ref, w2_ref, w1t_ref,
                dfp_ref, dd_ref, dp_ref, dw1_ref, dvec_ref,
                *, rt: int, s: int):
    """Recompute + backprop one tile.

    dvec rows (f32, accumulated across the grid):
      0 db1, 1 dw2, 2 db2 (lane-replicated), 3 dk0d, 4 dk0p.
    """
    f = _F
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, ti == 0))
    def _zero():
        dw1_ref[...] = jnp.zeros((f, f), jnp.float32)
        dvec_ref[...] = jnp.zeros((8, f), jnp.float32)

    b1s, m1s = b1s_ref[...], m1s_ref[...]
    dcol = _expand(d_ref, b1s, m1s, rt, s)
    pcol = _expand(p_ref, b1s, m1s, rt, s) if p_ref is not None else None
    h, h2 = _forward_tile(fp_ref, p_ref, k0_ref, w1_ref, b1_ref,
                          dcol, pcol, rt, s)
    ctc = _expand(ct_ref, b1s, m1s, rt, s)                     # (S*RT, 1)

    # fc2: pred = h2 @ w2 + b2
    dvec_ref[1:2] += _colsum((h2 * ctc).astype(_CDT))                 # dw2
    dvec_ref[2:3] += _colsum(ctc)                                     # db2
    dz2 = (ctc * w2_ref[0:1].astype(_CDT) * _delu(h2)).astype(_CDT)

    # fc1: z2 = h @ w1 + b1
    dw1_ref[...] += jax.lax.dot_general(h, dz2, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dvec_ref[0:1] += _colsum(dz2)                                     # db1
    dh = jax.lax.dot_general(dz2, w1t_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(_CDT)
    dz = dh * _delu(h)                                                # (S*RT, F)

    # per-ray term: sum the S sample blocks (one-hot MXU, f32 accum)
    dfp_ref[0] = jax.lax.dot_general(
        b1s, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dfp_ref.dtype)

    # fc0 depth column and the depth cotangent
    k0d = k0_ref[0:1].astype(_CDT)
    dvec_ref[3:4] += _colsum(dz * dcol)                               # dk0d
    dd_ref[0] = _collapse(_rowsum(dz * k0d), b1s, m1s).astype(dd_ref.dtype)
    if p_ref is not None:
        k0p = k0_ref[1:2].astype(_CDT)
        dvec_ref[4:5] += _colsum(dz * pcol)                           # dk0p
        dp_ref[0] = _collapse(_rowsum(dz * k0p), b1s, m1s).astype(dp_ref.dtype)


def _bwd_kernel_noprior(b1s_ref, m1s_ref, fp_ref, d_ref, ct_ref, k0_ref,
                        w1_ref, b1_ref, w2_ref, w1t_ref,
                        dfp_ref, dd_ref, dw1_ref, dvec_ref,
                        *, rt: int, s: int):
    _bwd_kernel(b1s_ref, m1s_ref, fp_ref, d_ref, None, ct_ref, k0_ref,
                w1_ref, b1_ref, w2_ref, w1t_ref, dfp_ref, dd_ref, None,
                dw1_ref, dvec_ref, rt=rt, s=s)


def _pad_rays(x: Array, np_pad: int) -> Array:
    n = x.shape[1]
    if n == np_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, np_pad - n)) + ((0, 0),) * (x.ndim - 2))


@functools.lru_cache(maxsize=None)
def _make_ray_head(s: int, has_prior: bool, out_dt_name: str, interpret: bool):
    """custom_vjp'd fused head for one static (S, has_prior, out dtype)."""
    f = _F
    rt_f, rt_b = _RT_FWD, _RT_BWD
    out_dt = jnp.dtype(out_dt_name)
    tile2 = lambda bi, ti: (bi, ti, 0)
    acc2 = lambda bi, ti: (0, 0)

    def _pack(k0d, k0p, w1, b1, w2, b2):
        k0 = jnp.stack([k0d, k0p]).astype(jnp.float32)         # (2, F)
        b1r = b1[None].astype(jnp.float32)                     # (1, F)
        w2r = jnp.stack(
            [w2[:, 0], jnp.broadcast_to(b2, (f,))]).astype(jnp.float32)
        return k0, w1.astype(_CDT), b1r, w2r

    def sel_specs(rt):
        return [
            pl.BlockSpec((s * rt, rt), acc2, memory_space=pltpu.VMEM),
            pl.BlockSpec((s * rt, s), acc2, memory_space=pltpu.VMEM),
        ]

    def fwd_call(b1s, m1s, fp, d, p, k0, w1c, b1r, w2r):
        rt = rt_f
        b, np_pad = fp.shape[:2]
        kern = functools.partial(
            _fwd_kernel if has_prior else _fwd_kernel_noprior, rt=rt, s=s)
        data_specs = [pl.BlockSpec((1, rt, f), tile2, memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM)]
        if has_prior:
            data_specs.append(
                pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM))
        w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        args = (fp, d, p) if has_prior else (fp, d)
        return pl.pallas_call(
            kern,
            grid=(b, np_pad // rt),
            in_specs=sel_specs(rt) + data_specs + w_specs,
            out_specs=pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, np_pad, s), out_dt),
            interpret=interpret,
        )(b1s, m1s, *args, k0, w1c, b1r, w2r)

    def bwd_call(b1s, m1s, fp, d, p, ct, k0, w1c, b1r, w2r):
        rt = rt_b
        b, np_pad = fp.shape[:2]
        kern = functools.partial(
            _bwd_kernel if has_prior else _bwd_kernel_noprior, rt=rt, s=s)
        data_specs = [pl.BlockSpec((1, rt, f), tile2, memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM)]
        if has_prior:
            data_specs.append(
                pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM))
        data_specs.append(
            pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM))  # ct
        w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        out_specs = [
            pl.BlockSpec((1, rt, f), tile2, memory_space=pltpu.VMEM),  # dfp
            pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM),  # dd
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, np_pad, f), jnp.float32),
            jax.ShapeDtypeStruct((b, np_pad, s), jnp.float32),
        ]
        if has_prior:
            out_specs.append(
                pl.BlockSpec((1, rt, s), tile2, memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((b, np_pad, s), jnp.float32))
        out_specs += [pl.BlockSpec((f, f), acc2, memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, f), acc2, memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((f, f), jnp.float32),
                      jax.ShapeDtypeStruct((8, f), jnp.float32)]
        args = (fp, d, p, ct) if has_prior else (fp, d, ct)
        return pl.pallas_call(
            kern,
            grid=(b, np_pad // rt),
            in_specs=sel_specs(rt) + data_specs + w_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(b1s, m1s, *args, k0, w1c, b1r, w2r, w1c.T)

    @jax.custom_vjp
    def head(fp, d, p, k0d, k0p, w1, b1, w2, b2):
        k0, w1c, b1r, w2r = _pack(k0d, k0p, w1, b1, w2, b2)
        b1s, m1s = _selectors_host(rt_f, s)
        return fwd_call(b1s, m1s, fp, d, p, k0, w1c, b1r, w2r)

    def head_fwd(fp, d, p, k0d, k0p, w1, b1, w2, b2):
        out = head(fp, d, p, k0d, k0p, w1, b1, w2, b2)
        return out, (fp, d, p, k0d, k0p, w1, b1, w2)

    def head_bwd(res, ct):
        fp, d, p, k0d, k0p, w1, b1, w2 = res
        k0, w1c, b1r, w2r = _pack(k0d, k0p, w1, b1, w2,
                                  jnp.zeros((), jnp.float32))
        b1s, m1s = _selectors_host(rt_b, s)
        outs = bwd_call(b1s, m1s, fp, d, p, ct.astype(_CDT), k0, w1c, b1r, w2r)
        if has_prior:
            dfp, dd, dp, dw1, dvec = outs
        else:
            dfp, dd, dw1, dvec = outs
            dp = jnp.zeros_like(p)
        return (dfp.astype(fp.dtype), dd.astype(d.dtype), dp.astype(p.dtype),
                dvec[3].astype(k0d.dtype),
                (dvec[4] if has_prior else jnp.zeros((f,))).astype(k0p.dtype),
                dw1.astype(w1.dtype), dvec[0].astype(b1.dtype),
                dvec[1][:, None].astype(w2.dtype),
                dvec[2, 0:1].astype(b1.dtype))

    head.defvjp(head_fwd, head_bwd)
    return head


def ray_head_mlp(fp: Array, depths: Array, prior: Array | None,
                 k0d: Array, k0p: Array | None,
                 w1: Array, b1: Array, w2: Array, b2: Array,
                 interpret: bool = False) -> Array:
    """Fused elu-MLP over (ray, sample) pairs.

    fp:     (b, N, 128) per-ray fc0 term (feat @ W_feat + fc0 bias)
    depths: (b, N, S) sample depths; prior: (b, N, S) or None
    k0d/k0p: (128,) fc0 depth / prior rows; w1 (128, 128), b1 (128,),
    w2 (128, 1), b2 (1,).
    Returns (b, N, S, 1)-squeezed logits as (b, N, S) in fp's dtype.

    Equivalent to BinaryMLPNetwork.factored's per-scale chain (itself an
    exact refactoring of the reference MLP, networks.py:87-115); bf16
    compute with f32 matmul accumulation on both paths.
    """
    b, n, f = fp.shape
    if f != _F:
        raise ValueError(f"ray_head_mlp expects hidden width {_F}, got {f}")
    s = depths.shape[-1]
    has_prior = prior is not None
    # pad to a common multiple of both grid tilings (powers of two)
    rt_pad = max(_RT_FWD, _RT_BWD)
    np_pad = -(-n // rt_pad) * rt_pad
    fpp = _pad_rays(fp.astype(_CDT), np_pad)
    dpad = _pad_rays(depths.astype(_CDT), np_pad)
    if has_prior:
        ppad = _pad_rays(prior.astype(_CDT), np_pad)
    else:
        ppad = jnp.zeros_like(dpad)  # placeholder (unused by the kernel)
        k0p = jnp.zeros_like(k0d)
    head = _make_ray_head(s, has_prior, jnp.dtype(fp.dtype).name,
                          bool(interpret))
    out = head(fpp, dpad, ppad, k0d, k0p, w1, b1, w2, b2)
    return out[:, :n]
