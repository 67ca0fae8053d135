"""Per-section roofline analysis: dense eval forward and the train step.

Eval mode (default): for each cumulative section of BDNet.forward_val
(same probes as scripts/profile_eval.py), reports measured ms,
XLA-cost-analysis FLOPs and bytes accessed, achieved TFLOP/s and GB/s,
MFU vs the chip's bf16 peak, and which roofline wall (compute vs HBM)
the section sits against. (VERDICT r2 item 1.)

Train mode (--train): the same accounting for the b=12 training step's
ablation sections (conv stacks f+b, ray-head+loss f+b, volume block
f+b), with the Pallas volume kernels' MXU FLOPs hand-counted from their
program structure (XLA cost analysis is blind inside a pallas_call), so
the step's floor and headroom are explicit. (VERDICT r4 item 4: "is the
268.5 ms conv block at its HBM roof or not?")

Usage: python scripts/roofline.py [--batch 1] [--iters 20] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax_compile")
)

# chip peaks (dense bf16 matmul FLOP/s, HBM bytes/s)
CHIP_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),  # v5e
    "TPU v5": (459e12, 2765e9),      # v5p
    "TPU v4": (275e12, 1228e9),
}


def chip_peak() -> tuple[float, float] | tuple[None, None]:
    kind = jax.devices()[0].device_kind
    for name, peaks in CHIP_PEAKS.items():
        if kind.startswith(name):
            return peaks
    return None, None


def cost_of(jitted, *args) -> dict:
    compiled = jitted.lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes": float(cost.get("bytes accessed", float("nan"))),
    }


def volume_kernel_handcount(cur, src, *, c=16, f=128, g=8,
                            matching_scale=1, min_depth=0.25, max_depth=5.0,
                            num_bins=64) -> dict:
    """Hand-computed MXU-op count for the fused volume kernel (VERDICT r3
    item 4): XLA's cost analysis cannot see inside a Pallas call, so the
    kernel's FLOPs are derived here from its exact program structure
    (ops/fused_volume.py::_fused_kernel) and the actual camera geometry:

      per scanline program (b, v), per plane group (D/G groups), per view:
        gather chunks: nch x (8C, W) @ (W, G*W) one-hot matmuls, where nch
        is the row-granular y-band window the kernel derives from the
        warped y coordinates — replicated here in numpy;
      per group (view-independent):
        vis matmul  (F, K*C) @ (K*C, G*W)
        meta matmul (F, K*8) @ (K*8, G*W)
        fc1         (F, F)   @ (F,   G*W)

    Returns dense-MXU FLOPs (one-hot operands burn full matmul cycles on
    the systolic array regardless of sparsity) + a VPU-op estimate.
    """
    import numpy as np

    from implicit_depth_tpu.core import geometry

    K_s = np.asarray(src[f"K_s{matching_scale}"], np.float32)      # (B,K,4,4)
    invK = np.asarray(cur[f"invK_s{matching_scale}"], np.float32)  # (B,4,4)
    src_T_cur = np.einsum("bkij,bjl->bkil",
                          np.asarray(src["cam_T_world"], np.float32),
                          np.asarray(cur["world_T_cam"], np.float32))
    A, bb = jax.tree.map(np.asarray, geometry.homography_components(
        jnp.asarray(K_s), jnp.asarray(src_T_cur), jnp.asarray(invK)))
    planes = np.asarray(geometry.log_depth_planes(min_depth, max_depth, num_bins))

    B, K = A.shape[0], A.shape[1]
    # matching resolution from the image shape (image/(2^(scale+1)))
    img_h, img_w = cur["image"].shape[1], cur["image"].shape[2]
    H, W = img_h // (2 ** (matching_scale + 1)), img_w // (2 ** (matching_scale + 1))

    u = np.arange(W, dtype=np.float32) + 0.5                        # (W,)
    v = np.arange(H, dtype=np.float32) + 0.5                        # (H,)
    dep = planes.reshape(1, 1, num_bins, 1, 1)                      # d axis
    # y = (dep*by + b1) / max(dep*bz + b2, eps) - 0.5 per (b,k,d,v,u)
    by = (A[:, :, None, None, None, 1, 0] * u[None, None, None, None, :]
          + A[:, :, None, None, None, 1, 1] * v[None, None, None, :, None]
          + A[:, :, None, None, None, 1, 2])
    bz = (A[:, :, None, None, None, 2, 0] * u[None, None, None, None, :]
          + A[:, :, None, None, None, 2, 1] * v[None, None, None, :, None]
          + A[:, :, None, None, None, 2, 2])
    z = np.maximum(dep * bz + bb[:, :, None, None, None, 2], 1e-5)
    y = (dep * by + bb[:, :, None, None, None, 1]) / z - 0.5
    y = np.clip(y, -2.0 * H, 2.0 * H)

    # kernel window: min/max over the (G, W) block -> chunk count
    y_min = y.min(axis=4)                                           # (B,K,D,H)
    y_max = y.max(axis=4)
    ng = num_bins // g
    y_min_g = y_min.reshape(B, K, ng, g, H).min(axis=3)             # (B,K,ng,H)
    y_max_g = y_max.reshape(B, K, ng, g, H).max(axis=3)
    lo_c = np.maximum(np.floor(y_min_g).astype(np.int64), 0)
    hi_c = np.minimum(np.floor(y_max_g).astype(np.int64) + 1, H - 1)
    nrows = hi_c - lo_c + 1
    nch = np.where(nrows > 0, (nrows + 7) // 8, 0)                  # (B,K,ng,H)
    total_chunks = int(nch.sum())

    GW = g * W
    gather_flops = total_chunks * 2.0 * (8 * c) * W * GW
    per_group_fixed = (2.0 * f * (K * c) * GW     # vis matmul
                       + 2.0 * f * (K * 8) * GW   # meta matmul
                       + 2.0 * f * f * GW)        # fc1
    fixed_flops = B * H * ng * per_group_fixed
    # VPU (non-MXU) estimate: hat operands (W*GW per chunk x ~4 ops),
    # wy*gx reduce (8*C*G*W madd per chunk), metadata closed form, fc2
    vpu_flops = total_chunks * (4.0 * W * GW + 2.0 * 8 * c * GW) \
        + B * H * ng * (2.0 * f * GW + 30.0 * K * GW)

    # backward kernel (ops/fused_volume.py::_fused_bwd_kernel): the same
    # chunk windows run TWICE (forward recompute gather + transposed
    # scatter, identical matmul shapes), and per group the fixed matmuls
    # are the forward three (vis/meta/fc1 recompute) plus dwfc1T, dh1,
    # dwvisT, dwmetaT, dvis, ddot
    bwd_gather = 2.0 * gather_flops
    bwd_fixed = B * H * ng * GW * (
        3 * 2.0 * f * f            # fc1 recompute + dwfc1T + dh1
        + 3 * 2.0 * f * (K * c)    # vis recompute + dwvisT + dvis
        + 2 * 2.0 * f * (K * 8)    # meta recompute + dwmetaT
        + 2.0 * 8 * f)             # ddot
    return {
        "B": B, "K": K, "H": H, "W": W, "C": c, "F": f, "D": num_bins, "G": g,
        "total_chunks": total_chunks,
        "avg_chunks_per_window": round(total_chunks / (B * K * ng * H), 2),
        "gather_gflop": round(gather_flops / 1e9, 2),
        "fixed_gflop": round(fixed_flops / 1e9, 2),
        "mxu_gflop": round((gather_flops + fixed_flops) / 1e9, 2),
        "vpu_gflop_est": round(vpu_flops / 1e9, 2),
        "bwd_gather_gflop": round(bwd_gather / 1e9, 2),
        "bwd_fixed_gflop": round(bwd_fixed / 1e9, 2),
        "bwd_mxu_gflop": round((bwd_gather + bwd_fixed) / 1e9, 2),
    }


def ray_head_handcount(batch: int, scale_n=(4096, 2048, 1366, 1024),
                       s: int = 64, f: int = 128, rt: int = 64) -> dict:
    """MXU-op count for the fused ray-head kernel (ops/ray_head.py):
    per grid step (RT rays, M = S*RT rows): expansion one-hots
    (M,RT)@(RT,S) + (M,S)@(S,1) per expanded column (d, prior, ct),
    fc1 (M,F)@(F,F), fc2 row-sum (M,F)@(F,1), collapse (RT,M)@(M,1).
    Backward recomputes the tile and adds dw1 (F,M)@(M,F), dh (M,F)@(F,F),
    dfp collapse, plus colsum ones-contractions (M,1)x(1,F)-shaped."""
    fwd = bwd = 0.0
    for n in scale_n:
        npad = -(-n // rt) * rt
        steps = batch * (npad // rt)
        m = s * rt
        expand = 2.0 * m * rt * s + 2.0 * m * s          # one expansion
        collapse = 2.0 * m * s + 2.0 * rt * m            # sel-mask + collapse
        fwd_step = (2 * expand                           # d + prior
                    + 2.0 * m * f * f                    # fc1
                    + 2.0 * m * f                        # fc2 rowsum
                    + collapse)
        bwd_step = (3 * expand                           # d, prior, ct
                    + 2.0 * m * f * f                    # fc1 recompute
                    + 2.0 * m * f                        # fc2 recompute
                    + 2.0 * m * f * f                    # dw1
                    + 2.0 * m * f * f                    # dh
                    + 2.0 * rt * m * f                   # dfp one-hot collapse
                    + 6 * 2.0 * m * f                    # colsums + rowsums
                    + 2 * collapse)                      # dd, dp
        fwd += steps * fwd_step
        bwd += steps * bwd_step
    return {"fwd_gflop": round(fwd / 1e9, 2), "bwd_gflop": round(bwd / 1e9, 2)}


def train_main(args):
    """Roofline accounting for the training step's ablation sections
    (VERDICT r4 item 4). Probes mirror scripts/profile_train.py; FLOPs =
    XLA cost analysis + hand-counted Pallas kernels."""
    import numpy as np

    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.train import state as state_lib
    from implicit_depth_tpu.utils.fixtures import synthetic_bd_batch
    from __graft_entry__ import _init_variables

    on_tpu = jax.default_backend() not in ("cpu",)
    cur, src = synthetic_bd_batch(batch=1, with_train_keys=True)
    cur = jax.tree.map(jnp.asarray, cur)
    src = jax.tree.map(jnp.asarray, src)
    init_net = BDNet(compute_dtype=jnp.bfloat16, train_bn=True)
    variables = _init_variables(init_net, cur, src)
    if args.batch > 1:
        cur = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), cur)
        src = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), src)
    dev = jax.devices()[0]
    variables = jax.device_get(variables)
    cur, src = jax.device_put((cur, src), dev)
    batch = (cur, src)
    rng = jax.random.PRNGKey(0)
    tx = state_lib.make_optimizer()

    net = BDNet(compute_dtype=jnp.bfloat16, use_pallas_warp=on_tpu,
                train_bn=True)
    net_zero = BDNet(compute_dtype=jnp.bfloat16, use_pallas_warp=on_tpu,
                     feature_volume_type="zero_cost_volume", train_bn=True)
    init_zero = BDNet(compute_dtype=jnp.bfloat16,
                      feature_volume_type="zero_cost_volume", train_bn=True)
    vars_zero = jax.device_get(_init_variables(
        init_zero, jax.tree.map(lambda x: x[:1], cur),
        jax.tree.map(lambda x: x[:1], src)))

    def trunk_zero_step(state, batch_, rng_):
        cur_d, src_d = batch_

        def loss_fn(params):
            vs = {"params": params}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats
            out, mutated = net_zero.apply(
                vs, cur_d, src_d, jnp.asarray(False), "",
                rngs={"aug": rng_}, method=type(net_zero).trunk,
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            loss = sum(jnp.mean(jnp.square(f.astype(jnp.float32)))
                       for f in out["features"].values())
            return loss, mutated.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_bs), {"loss": loss}

    # donation matches scripts/profile_train.py's timing protocol (and
    # keeps the b=12 full step inside HBM without remat)
    probes = [
        ("full", jax.jit(state_lib.make_bd_train_step(net),
                         donate_argnums=(0,)), variables),
        ("zero_volume", jax.jit(state_lib.make_bd_train_step(net_zero),
                                donate_argnums=(0,)), vars_zero),
        ("trunk_zero", jax.jit(trunk_zero_step, donate_argnums=(0,)),
         vars_zero),
    ]

    peak_flops, peak_bw = chip_peak()
    print(f"device: {jax.devices()[0].device_kind}  batch={args.batch}")
    if peak_flops:
        print(f"peaks: {peak_flops/1e12:.0f} bf16 TFLOP/s, "
              f"{peak_bw/1e9:.0f} GB/s HBM\n")

    res = {}
    for name, step, vrs in probes:
        state = jax.device_put(state_lib.create_train_state(vrs, tx), dev)
        c = cost_of(step, state, batch, rng)
        state2, losses = step(state, batch, rng)
        float(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state2, losses = step(state2, batch, rng)
        float(losses["loss"])
        c["ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
        res[name] = c
        print(f"{name:>12}: {c['ms']:8.1f} ms  {c['flops']/1e9:9.1f} GFLOP "
              f"(XLA-visible)  {c['bytes']/1e9:7.2f} GB", flush=True)

    # hand-counted Pallas kernels (invisible to cost analysis)
    hc = volume_kernel_handcount(
        {k: np.asarray(v) for k, v in cur.items()},
        {k: np.asarray(v) for k, v in src.items()})
    rh = ray_head_handcount(args.batch)

    def floor_ms(gflop, gb):
        fc = gflop * 1e9 / peak_flops * 1e3 if peak_flops else float("nan")
        fb = gb * 1e9 / peak_bw * 1e3 if peak_bw else float("nan")
        return fc, fb

    print("\nsections (derived):")
    rows = []
    sections = [
        # (name, ms, XLA gflop, XLA gb, pallas gflop)
        ("conv stacks f+b (trunk)", res["trunk_zero"]["ms"],
         res["trunk_zero"]["flops"] / 1e9, res["trunk_zero"]["bytes"] / 1e9,
         0.0),
        ("ray head + loss f+b", res["zero_volume"]["ms"] - res["trunk_zero"]["ms"],
         (res["zero_volume"]["flops"] - res["trunk_zero"]["flops"]) / 1e9,
         (res["zero_volume"]["bytes"] - res["trunk_zero"]["bytes"]) / 1e9,
         rh["fwd_gflop"] + rh["bwd_gflop"]),
        ("volume block f+b", res["full"]["ms"] - res["zero_volume"]["ms"],
         (res["full"]["flops"] - res["zero_volume"]["flops"]) / 1e9,
         (res["full"]["bytes"] - res["zero_volume"]["bytes"]) / 1e9,
         hc["mxu_gflop"] + hc["bwd_mxu_gflop"]),
        ("full step", res["full"]["ms"], res["full"]["flops"] / 1e9,
         res["full"]["bytes"] / 1e9,
         hc["mxu_gflop"] + hc["bwd_mxu_gflop"] + rh["fwd_gflop"] + rh["bwd_gflop"]),
    ]
    hdr = (f"{'section':>24} {'ms':>8} {'GFLOP':>9} {'GB':>8} "
           f"{'floor_c':>8} {'floor_b':>8} {'headroom':>9}")
    print(hdr)
    for name, ms, gf_xla, gb, gf_pal in sections:
        gf = gf_xla + gf_pal
        fc, fb = floor_ms(gf, gb)
        floor = max(fc, fb)
        row = dict(section=name, ms=round(ms, 1), gflop=round(gf, 1),
                   gb=round(gb, 2), floor_compute_ms=round(fc, 1),
                   floor_hbm_ms=round(fb, 1),
                   headroom_ms=round(ms - floor, 1),
                   pallas_gflop=round(gf_pal, 1))
        rows.append(row)
        print(f"{name:>24} {ms:>8.1f} {gf:>9.1f} {gb:>8.2f} "
              f"{fc:>8.1f} {fb:>8.1f} {ms - floor:>9.1f}")
    print("\nNotes: 'bytes accessed' is XLA cost analysis (includes "
          "fusion-virtualised traffic, so floor_b is an UPPER bound on "
          "the true HBM floor); Pallas kernel bytes are not included "
          "(their IO is VMEM-resident by design). floor_c assumes every "
          "FLOP rides the MXU at bf16 peak.")
    print(f"pallas hand-counts: volume fwd {hc['mxu_gflop']} + bwd "
          f"{hc['bwd_mxu_gflop']} GFLOP; ray head fwd {rh['fwd_gflop']} "
          f"+ bwd {rh['bwd_gflop']} GFLOP")
    if args.json:
        print(json.dumps({"batch": args.batch, "train": True, "rows": rows,
                          "volume_kernel": hc, "ray_head": rh}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train", action="store_true",
                    help="roofline the training step's ablation sections")
    ap.add_argument("--json", action="store_true", help="also print a JSON line")
    args = ap.parse_args()

    if args.train:
        if args.batch == 1:
            args.batch = 12
        if args.iters == 20:
            args.iters = 8
        train_main(args)
        return

    from __graft_entry__ import entry
    from implicit_depth_tpu.models.bd_net import BDNet

    fn, (variables, cur, src) = entry()
    if args.batch > 1:
        cur = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), cur)
        src = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), src)
    dev = jax.devices()[0]
    variables, cur, src = jax.device_put((variables, cur, src), dev)

    on_tpu = jax.default_backend() not in ("cpu",)
    net = BDNet(compute_dtype=jnp.bfloat16, use_pallas_warp=on_tpu)

    def section(stop_at):
        def f(v, c, s):
            out = net.apply(v, c, s, False, stop_at=stop_at, fused_volume=True,
                            method=BDNet.trunk)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        return jax.jit(f)

    def full(v, c, s):
        out = net.apply(v, c, s, method=BDNet.forward_val)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))

    probes = [
        ("encoder", section("encoder")),
        ("matching", section("matching")),
        ("volume", section("volume")),
        ("cv_encoder", section("cv_encoder")),
        ("decoder", section("")),
        ("forward_val", jax.jit(full)),
    ]

    cum = {}
    for name, f in probes:
        c = cost_of(f, variables, cur, src)
        out = f(variables, cur, src)
        float(out)
        out = f(variables, cur, src)
        float(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(variables, cur, src)
        float(out)
        c["ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
        cum[name] = c

    peak_flops, peak_bw = chip_peak()
    print(f"device: {jax.devices()[0].device_kind}  batch={args.batch}")
    if peak_flops:
        print(f"peaks: {peak_flops/1e12:.0f} bf16 TFLOP/s, {peak_bw/1e9:.0f} GB/s HBM\n")
    hdr = (f"{'section':>12} {'ms':>8} {'GFLOP':>9} {'GB':>7} "
           f"{'TFLOP/s':>8} {'GB/s':>7} {'MFU%':>6} {'BW%':>6}  bound")
    print(hdr)
    rows = []
    prev = {"ms": 0.0, "flops": 0.0, "bytes": 0.0}
    for name, _ in probes:
        c = cum[name]
        if name == "forward_val":
            d = c  # absolute, not a delta over the trunk probes
        else:
            d = {k: c[k] - prev[k] for k in ("ms", "flops", "bytes")}
            prev = c
        dt = d["ms"] / 1e3
        tf = d["flops"] / dt / 1e12 if dt > 0 else 0.0
        gbs = d["bytes"] / dt / 1e9 if dt > 0 else 0.0
        mfu = 100 * tf * 1e12 / peak_flops if peak_flops else float("nan")
        bwu = 100 * gbs * 1e9 / peak_bw if peak_bw else float("nan")
        # which wall is closer at this section's arithmetic intensity
        bound = "-"
        if peak_flops and d["bytes"] > 0:
            ai = d["flops"] / d["bytes"]
            ridge = peak_flops / peak_bw
            bound = "compute" if ai > ridge else "HBM"
        row = dict(section=name, ms=round(d["ms"], 3),
                   gflop=round(d["flops"] / 1e9, 2), gb=round(d["bytes"] / 1e9, 3),
                   tflops=round(tf, 2), gbs=round(gbs, 1),
                   mfu_pct=round(mfu, 1), bw_pct=round(bwu, 1), bound=bound)
        rows.append(row)
        print(f"{name:>12} {row['ms']:>8.2f} {row['gflop']:>9.2f} {row['gb']:>7.3f} "
              f"{row['tflops']:>8.2f} {row['gbs']:>7.1f} {row['mfu_pct']:>6.1f} "
              f"{row['bw_pct']:>6.1f}  {bound}")

    # the Pallas fused volume's FLOPs are invisible to XLA cost analysis —
    # hand-count them from the kernel's program structure + real geometry,
    # and bound the measured volume-section delta against the MXU roof
    hc = volume_kernel_handcount(
        {k: v for k, v in cur.items()}, {k: v for k, v in src.items()})
    vol_ms = cum["volume"]["ms"] - cum["matching"]["ms"]
    vol_s = vol_ms / 1e3
    mxu_tf = hc["mxu_gflop"] / vol_s / 1e3 if vol_s > 0 else 0.0  # GFLOP/s -> TFLOP/s
    mxu_pct = 100.0 * mxu_tf * 1e12 / peak_flops if peak_flops else float("nan")
    floor_ms = hc["mxu_gflop"] * 1e9 / peak_flops * 1e3 if peak_flops else float("nan")
    print("\nfused volume kernel (hand-counted MXU ops; XLA cost analysis "
          "is blind to Pallas):")
    print(f"  gather (one-hot hat matmuls): {hc['gather_gflop']:.1f} GFLOP "
          f"({hc['total_chunks']} chunks, avg {hc['avg_chunks_per_window']} "
          f"per y-window)")
    print(f"  fixed (vis+meta+fc1 matmuls): {hc['fixed_gflop']:.1f} GFLOP; "
          f"VPU est {hc['vpu_gflop_est']:.1f} GFLOP")
    print(f"  total MXU {hc['mxu_gflop']:.1f} GFLOP in {vol_ms:.2f} ms -> "
          f"{mxu_tf:.1f} TFLOP/s = {mxu_pct:.0f}% of MXU peak "
          f"(speed-of-light floor {floor_ms:.2f} ms)")
    hc.update({"measured_ms": round(vol_ms, 3), "mxu_tflops": round(mxu_tf, 1),
               "mxu_pct": round(mxu_pct, 1), "floor_ms": round(floor_ms, 2)})

    if args.json:
        print(json.dumps({"batch": args.batch, "rows": rows,
                          "volume_kernel": hc}))


if __name__ == "__main__":
    main()
