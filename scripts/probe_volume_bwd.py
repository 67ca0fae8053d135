"""One-off probe: where does the volume block's fwd+bwd time go?

Times, at training shapes (b x 7 x 96x128 x 16 matching feats, 64 planes):
  fused_fwd   — the fused Pallas primal alone
  unfused_fwd — build_warped_views + apply_metadata_mlp (the bwd's remat)
  unfused_vjp — full vjp of the unfused chain (what fused_train's bwd runs)
  warp_fwd    — pallas warp alone
  warp_bwd    — pallas warp transpose alone
  mlp_vjp     — vjp of apply_metadata_mlp given a precomputed WarpedViews

Usage: python scripts/probe_volume_bwd.py [--batch 12] [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax_compile")
)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--parity", action="store_true",
                    help="assert fused-vs-unfused gradient parity on this backend")
    args = ap.parse_args()

    from implicit_depth_tpu.core import geometry
    from implicit_depth_tpu.models.volume_mlp import (
        apply_metadata_mlp, fused_forward)
    from implicit_depth_tpu.ops.warp_kernel import (
        warp_planes, warp_planes_bwd)
    from implicit_depth_tpu.volumes.cost_volume import build_warped_views

    B, K, H, W, C, D, F = args.batch, 7, 96, 128, 16, 64, 128
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    m_cur = jnp.asarray(rng.randn(B, H, W, C), dt)
    m_src = jnp.asarray(rng.randn(B, K, H, W, C), dt)
    # plausible camera geometry: small pose offsets
    K44 = np.eye(4, dtype=np.float32)
    K44[0, 0] = K44[1, 1] = 120.0
    K44[0, 2], K44[1, 2] = W / 2, H / 2
    invK = np.linalg.inv(K44)
    src_T_cur = np.tile(np.eye(4, dtype=np.float32), (B, K, 1, 1))
    src_T_cur[:, :, 0, 3] = rng.uniform(-0.2, 0.2, (B, K))
    src_T_cur[:, :, 2, 3] = rng.uniform(-0.1, 0.1, (B, K))
    cur_T_src = np.linalg.inv(src_T_cur)
    src_K = jnp.asarray(np.tile(K44, (B, K, 1, 1)))
    cur_invK = jnp.asarray(np.tile(invK, (B, 1, 1)))
    src_T_cur = jnp.asarray(src_T_cur)
    cur_T_src = jnp.asarray(cur_T_src)
    planes = geometry.log_depth_planes(0.5, 8.0, D)

    params = {
        "fc0_kernel": jnp.asarray(rng.randn(202, F), jnp.float32) * 0.05,
        "fc0_bias": jnp.zeros((F,), jnp.float32),
        "fc1": {"kernel": jnp.asarray(rng.randn(F, F), jnp.float32) * 0.05,
                "bias": jnp.zeros((F,), jnp.float32)},
        "fc2": {"kernel": jnp.asarray(rng.randn(F, 1), jnp.float32) * 0.05,
                "bias": jnp.zeros((1,), jnp.float32)},
    }

    @jax.jit
    def f_fused(params, m_cur, m_src):
        return fused_forward(params, m_cur, m_src, src_K, src_T_cur,
                             cur_invK, cur_T_src, planes, k=K, c=C, hidden=F)

    def unfused(params, m_cur, m_src):
        wv = build_warped_views(m_cur, m_src, src_K, src_T_cur, cur_invK,
                                cur_T_src, planes, compute_dtype=dt,
                                use_pallas=True)
        return apply_metadata_mlp(params, wv, m_cur, k=K, c=C, hidden=F,
                                  dt=dt).astype(jnp.float32)

    f_unfused = jax.jit(unfused)

    @jax.jit
    def f_unfused_vjp(params, m_cur, m_src, ct):
        _, pull = jax.vjp(unfused, params, m_cur, m_src)
        return pull(ct)

    A_k, b_k = geometry.homography_components(src_K, src_T_cur, cur_invK)

    @jax.jit
    def f_warp(m_src):
        return jax.vmap(lambda s, A, b: warp_planes(s, A, b, planes))(
            m_src, A_k, b_k)

    @jax.jit
    def f_warp_bwd(ct):
        return jax.vmap(lambda c, A, b: warp_planes_bwd(c, A, b, planes))(
            ct, A_k, b_k)

    @jax.jit
    def f_wv(m_cur, m_src):
        return build_warped_views(m_cur, m_src, src_K, src_T_cur, cur_invK,
                                  cur_T_src, planes, compute_dtype=dt,
                                  use_pallas=True)

    wv = jax.block_until_ready(f_wv(m_cur, m_src))

    @jax.jit
    def f_mlp_vjp(params, wv, m_cur, ct):
        _, pull = jax.vjp(
            lambda p, w, c: apply_metadata_mlp(p, w, c, k=K, c=C, hidden=F,
                                               dt=dt).astype(jnp.float32),
            params, wv, m_cur)
        return pull(ct)

    ct = jnp.ones((B, D, H, W), jnp.float32)
    ct_w = jnp.ones((B, K, D, H, W, C), dt)

    r = {}
    r["fused_fwd"] = timeit(f_fused, params, m_cur, m_src, iters=args.iters)
    r["unfused_fwd"] = timeit(f_unfused, params, m_cur, m_src, iters=args.iters)
    r["unfused_vjp"] = timeit(f_unfused_vjp, params, m_cur, m_src, ct,
                              iters=args.iters)
    r["warp_fwd"] = timeit(f_warp, m_src, iters=args.iters)
    r["warp_bwd"] = timeit(f_warp_bwd, ct_w, iters=args.iters)
    r["build_wv"] = timeit(f_wv, m_cur, m_src, iters=args.iters)
    r["mlp_vjp"] = timeit(f_mlp_vjp, params, wv, m_cur, ct, iters=args.iters)

    # the fused Pallas backward (recompute + backprop + scatter, one pass)
    from implicit_depth_tpu.models.volume_mlp import (
        _geometry_operands, _weight_operands)
    from implicit_depth_tpu.ops.fused_volume import fused_metadata_volume_bwd

    @jax.jit
    def f_fused_bwd(params, m_cur, m_src, ct):
        A, bb, origins, invK3 = _geometry_operands(
            src_K, src_T_cur, cur_invK, cur_T_src)
        wops = _weight_operands(params, m_cur, invK3, cur_T_src,
                                k=K, c=C, hidden=F)
        base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2, _ = wops
        cts = fused_metadata_volume_bwd(
            ct, m_cur, m_src, A, bb, origins, invK3, planes,
            base, w_visT, w_metaT, w_plane, w_fc1T, b_fc1, w_fc2, hidden=F)
        return cts.dsrc, cts.dcur, cts.dw_fc1T

    @jax.jit
    def f_fused_full_vjp(params, m_cur, m_src, ct):
        from implicit_depth_tpu.models.volume_mlp import _make_fused_diff
        fn = _make_fused_diff(K, C, F, "bfloat16", False, "fused")
        _, pull = jax.vjp(
            lambda p, mc, ms: fn(p, mc, ms, src_K, src_T_cur, cur_invK,
                                 cur_T_src, planes),
            params, m_cur, m_src)
        return pull(ct)

    r["fused_bwd_kernel"] = timeit(f_fused_bwd, params, m_cur, m_src, ct,
                                   iters=args.iters)
    r["fused_full_vjp"] = timeit(f_fused_full_vjp, params, m_cur, m_src, ct,
                                 iters=args.iters)
    for k_, v_ in r.items():
        print(f"{k_:>14}: {v_:8.1f} ms  ({v_ / args.batch:6.2f} ms/sample)")

    if args.parity:
        # on-chip gradient parity: the compiled fused Pallas backward vs
        # the unfused XLA-chain vjp (same bf16 compute dtype, same inputs).
        # Both linearise slightly different op orders at bf16 precision, so
        # the bound is rms-style, matching the f32-oracle distances recorded
        # in BASELINE.md (max rms ~1.3e-2).
        gf = jax.block_until_ready(f_fused_full_vjp(params, m_cur, m_src, ct))
        gu = jax.block_until_ready(f_unfused_vjp(params, m_cur, m_src, ct))
        worst = 0.0
        for tf_, tu_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
            a_ = np.asarray(tf_, dtype=np.float64)
            b_ = np.asarray(tu_, dtype=np.float64)
            denom = np.sqrt(np.mean(b_ ** 2)) + 1e-8
            rel_rms = float(np.sqrt(np.mean((a_ - b_) ** 2)) / denom)
            worst = max(worst, rel_rms)
            print(f"  parity leaf {tuple(a_.shape)}: rel_rms={rel_rms:.3e}")
        backend = jax.default_backend()
        assert worst < 5e-2, f"on-chip gradient parity FAILED: rel_rms={worst}"
        print(f"gradient parity OK on backend={backend}: "
              f"worst rel_rms={worst:.3e} (bound 5e-2)")


if __name__ == "__main__":
    main()
