"""Probe: the fused ray-head kernel vs the XLA factored chain.

Times the training query head's per-sample MLP (all four scales at
production shapes: N = 4096/2048/1366/1024 rays, S = 64 samples,
feat dims 64/64/128/256, batch --batch) as
  xla_fwd / xla_vjp   — the BinaryMLPNetwork.factored XLA chain
  pal_fwd / pal_vjp   — ops/ray_head.py::ray_head_mlp (fused Pallas)
and checks gradient parity of the two paths against each other
(--parity adds an f32-oracle comparison).

Usage: python scripts/probe_ray_head.py [--batch 12] [--iters 10] [--parity]
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

SCALE_N = (4096, 2048, 1366, 1024)
SCALE_C = (64, 64, 128, 256)
S, F = 64, 128


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def make_inputs(batch: int, use_prior: bool, seed=0):
    rng = np.random.RandomState(seed)
    feats, depths, priors, params = [], [], [], []
    for n, c in zip(SCALE_N, SCALE_C):
        feats.append(jnp.asarray(rng.randn(batch, n, c), jnp.bfloat16))
        depths.append(jnp.asarray(rng.rand(batch, n, S) * 5, jnp.float32))
        priors.append(jnp.asarray(rng.rand(batch, n, S), jnp.float32)
                      if use_prior else None)
        cin = 1 + c + (1 if use_prior else 0)
        params.append({
            "k0": jnp.asarray(rng.randn(cin, F) * 0.1, jnp.float32),
            "b0": jnp.asarray(rng.randn(F) * 0.1, jnp.float32),
            "w1": jnp.asarray(rng.randn(F, F) * 0.1, jnp.float32),
            "b1": jnp.asarray(rng.randn(F) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.randn(F, 1) * 0.1, jnp.float32),
            "b2": jnp.asarray([0.1], jnp.float32),
        })
    return feats, depths, priors, params


def head_all_scales(params, feats, depths, priors, use_pallas, dt=jnp.bfloat16,
                    interpret=False):
    from implicit_depth_tpu.ops.ray_head import ray_head_mlp

    total = 0.0
    for s in range(len(feats)):
        pr = params[s]
        feat = feats[s].astype(dt)
        c = feat.shape[-1]
        k0 = pr["k0"].astype(dt)
        fp = feat @ k0[1:1 + c] + pr["b0"].astype(dt)
        p = priors[s]
        if use_pallas:
            pred = ray_head_mlp(
                fp, depths[s], p, pr["k0"][0],
                pr["k0"][1 + c] if p is not None else None,
                pr["w1"], pr["b1"], pr["w2"], pr["b2"], interpret=interpret)
        else:
            h = fp[:, :, None, :] + depths[s][..., None].astype(dt) * k0[0]
            if p is not None:
                h = h + p[..., None].astype(dt) * k0[1 + c]
            h = jax.nn.elu(h)
            h = jax.nn.elu(h @ pr["w1"].astype(dt) + pr["b1"].astype(dt))
            pred = (h @ pr["w2"].astype(dt) + pr["b2"].astype(dt))[..., 0]
        # surrogate loss so the probe has a scalar output per path
        total = total + jnp.sum(jnp.sin(pred.astype(jnp.float32)))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no_prior", action="store_true")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--rt_fwd", type=int, default=0,
                    help="override the kernel's forward rays-per-grid-step")
    ap.add_argument("--rt_bwd", type=int, default=0)
    args = ap.parse_args()
    if args.rt_fwd:
        os.environ["IDT_RAY_HEAD_RT_FWD"] = str(args.rt_fwd)
    if args.rt_bwd:
        os.environ["IDT_RAY_HEAD_RT_BWD"] = str(args.rt_bwd)
    use_prior = not args.no_prior

    feats, depths, priors, params = make_inputs(args.batch, use_prior)
    feats = jax.device_put(feats)

    results = {}
    for name, pallas in (("xla", False), ("pal", True)):
        fwd = jax.jit(lambda pr, f: head_all_scales(pr, f, depths, priors, pallas))
        vjp = jax.jit(jax.grad(
            lambda pr, f: head_all_scales(pr, f, depths, priors, pallas)))
        results[f"{name}_fwd"] = timeit(fwd, params, feats, iters=args.iters)
        results[f"{name}_vjp"] = timeit(vjp, params, feats, iters=args.iters)

    for k, v in results.items():
        print(f"{k:>8}: {v:8.2f} ms")
    speed = (results["xla_fwd"] + results["xla_vjp"]) / max(
        results["pal_fwd"] + results["pal_vjp"], 1e-9)
    print(f"fused ray-head speedup (fwd+vjp): {speed:.2f}x")

    if args.parity:
        gx = jax.jit(jax.grad(
            lambda pr: head_all_scales(pr, feats, depths, priors, False)))(params)
        gp = jax.jit(jax.grad(
            lambda pr: head_all_scales(pr, feats, depths, priors, True)))(params)
        go = jax.jit(jax.grad(
            lambda pr: head_all_scales(pr, feats, depths, priors, False,
                                       dt=jnp.float32)))(params)
        worst = {}
        for s in range(len(params)):
            for key in params[s]:
                o = np.asarray(go[s][key], np.float32)
                den = float(np.sqrt((o ** 2).mean())) + 1e-12
                rx = float(np.sqrt(((np.asarray(gx[s][key], np.float32) - o) ** 2).mean())) / den
                rp = float(np.sqrt(((np.asarray(gp[s][key], np.float32) - o) ** 2).mean())) / den
                worst[key] = max(worst.get(key, (0, 0))[0], rx), \
                    max(worst.get(key, (0, 0))[1], rp)
        print("\nworst rel_rms vs f32 oracle across scales:")
        for key, (rx, rp) in worst.items():
            print(f"  {key:>3}: xla {rx:.3e}   pallas {rp:.3e}")
            assert rp < max(2 * rx, 5e-2), f"pallas {key} grad off oracle"
        print("parity OK (pallas grads within 2x of the xla chain's oracle distance)")


if __name__ == "__main__":
    main()
