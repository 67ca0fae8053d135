"""Per-section roofline analysis of the dense eval forward.

For each cumulative section of BDNet.forward_val (same probes as
scripts/profile_eval.py), reports: measured ms, XLA-cost-analysis FLOPs
and bytes accessed, achieved TFLOP/s and GB/s, MFU vs the chip's bf16
peak, and which roofline wall (compute vs HBM) the section sits against.
This is the measurement VERDICT r2 item 1 asks for: either the stacks
get faster or this table shows why they can't.

Usage: python scripts/roofline.py [--batch 1] [--iters 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="also print a JSON line")
    args = ap.parse_args()

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
    if args.json:
        print(json.dumps({"batch": args.batch, "rows": rows}))


if __name__ == "__main__":
    main()
