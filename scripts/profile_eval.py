"""Per-section timing of the dense eval forward on the current device.

Times cumulative prefixes of BDNet.forward_val via the trunk's `stop_at`
debug hook, then prints the per-section deltas. This is the measurement
that drives kernel-optimisation priorities (VERDICT r1 item 6).

Usage: python scripts/profile_eval.py [--batch 1] [--iters 20]
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

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax_compile")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16_matmul", action="store_true",
                    help="wrap in jax.default_matmul_precision('bfloat16')")
    args = ap.parse_args()
    if args.bf16_matmul:
        import contextlib
        ctx = jax.default_matmul_precision("bfloat16")
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    ctx.__enter__()

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
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return jax.jit(f)

    def full(v, c, s):
        out = net.apply(v, c, s, method=BDNet.forward_val)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))

    probes = [
        ("encoder", section("encoder")),
        ("matching", section("matching")),
        ("volume", section("volume")),
        ("cv_encoder", section("cv_encoder")),
        ("trunk(decoder)", section("")),
        ("forward_val", jax.jit(full)),
    ]

    times = {}
    for name, f in probes:
        out = f(variables, cur, src)
        float(out)  # compile + sync
        out = f(variables, cur, src)
        float(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(variables, cur, src)
        float(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000.0
        times[name] = dt
        print(f"{name:>16}: {dt:8.2f} ms (cumulative)")

    print("\nper-section deltas:")
    prev = 0.0
    for name, _ in probes:
        print(f"{name:>16}: {times[name] - prev:8.2f} ms")
        prev = times[name]
    print(f"\nbatch={args.batch}  per-frame: {times['forward_val']/args.batch:.2f} ms")


if __name__ == "__main__":
    main()
