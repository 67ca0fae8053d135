"""Times the full BD training step at production shapes on the current
device — the reference's batch-12 training config probe (VERDICT r1 #4).

Reference config: batch 12 total on 2x A100 (configs/models/
implicit_depth.yaml, README.md:215-226) => b<=6/GPU. Here: single chip at
--batch, optionally with --remat (nn.remat over warp+volume, trades one
extra kernel run for ~0.5 GB/sample of residuals).

Usage: python scripts/bench_train.py --batch 4 [--remat] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no_pallas", action="store_true")
    args = ap.parse_args()

    from implicit_depth_tpu.models.bd_net import BDNet
    from implicit_depth_tpu.train import state as state_lib
    from implicit_depth_tpu.utils.fixtures import synthetic_bd_batch
    from __graft_entry__ import _init_variables

    on_tpu = jax.default_backend() not in ("cpu",)
    net = BDNet(
        compute_dtype=jnp.bfloat16,
        use_pallas_warp=on_tpu and not args.no_pallas,
        remat_volume=args.remat,
        train_bn=True,
    )
    init_net = BDNet(compute_dtype=jnp.bfloat16, train_bn=True)

    cur, src = synthetic_bd_batch(batch=1, with_train_keys=True)
    cur = jax.tree.map(jnp.asarray, cur)
    src = jax.tree.map(jnp.asarray, src)
    variables = _init_variables(init_net, cur, src)

    if args.batch > 1:
        cur = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), cur)
        src = jax.tree.map(lambda x: jnp.repeat(x, args.batch, 0), src)

    dev = jax.devices()[0]
    variables, cur, src = jax.device_put((variables, cur, src), dev)

    tx = state_lib.make_optimizer()
    state = jax.device_put(state_lib.create_train_state(variables, tx), dev)
    step = jax.jit(state_lib.make_bd_train_step(net), donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, losses = step(state, (cur, src), rng)
    loss0 = float(losses["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s loss={loss0:.4f}")

    state, losses = step(state, (cur, src), rng)
    float(losses["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = step(state, (cur, src), rng)
    lossN = float(losses["loss"])  # sync
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"batch={args.batch} remat={args.remat} pallas={not args.no_pallas}: "
        f"{dt * 1000:.1f} ms/step = {dt / args.batch * 1000:.1f} ms/sample "
        f"({args.batch / dt:.2f} samples/s), loss={lossN:.4f}"
    )


if __name__ == "__main__":
    main()
