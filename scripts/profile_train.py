"""Per-section profile of the BD training step (VERDICT r2 item 4).

Ablation deltas at production shapes on the current device:

  full        — the complete jitted train step (fwd + bwd + adamw)
  fwd_only    — loss evaluation without gradients
  zero_volume — full step with feature_volume_type=zero_cost_volume
                (encoders + decoder + head fwd/bwd, no warp/metadata-MLP)

  volume block (fwd+bwd+remat recompute) = full - zero_volume
  backward+update                        = full - fwd_only

Usage: python scripts/profile_train.py [--batch 12] [--remat] [--iters 8]
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


def _time_step(step, state, batch, rng, iters):
    state2, losses = step(state, batch, rng)
    float(losses["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, losses = step(state2, batch, rng)
    float(losses["loss"])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

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
    # variables stay HOST-side: the donated full-step probe invalidates its
    # state's device buffers, so each probe's state must be a fresh upload
    # (device_put of an on-device array is a no-op alias, not a copy)
    variables = jax.device_get(variables)
    cur, src = jax.device_put((cur, src), dev)
    batch = (cur, src)
    rng = jax.random.PRNGKey(0)
    tx = state_lib.make_optimizer()

    def make_state():
        return jax.device_put(state_lib.create_train_state(variables, tx), dev)

    results = {}

    net = BDNet(compute_dtype=jnp.bfloat16, use_pallas_warp=on_tpu,
                remat_volume=args.remat, train_bn=True)
    step_full = jax.jit(state_lib.make_bd_train_step(net), donate_argnums=(0,))
    results["full"] = _time_step(step_full, make_state(), batch, rng, args.iters)
    print(f"{'full step':>22}: {results['full']:8.1f} ms", flush=True)

    # forward-only loss: the step's exact loss path without grads/update
    # (no donation: the probe returns its input state untouched)
    step_fwd = jax.jit(state_lib.make_bd_train_step(net, forward_only=True))
    results["fwd_only"] = _time_step(step_fwd, make_state(), batch, rng, args.iters)
    print(f"{'fwd only':>22}: {results['fwd_only']:8.1f} ms", flush=True)

    net_zero = BDNet(compute_dtype=jnp.bfloat16, use_pallas_warp=on_tpu,
                     feature_volume_type="zero_cost_volume", train_bn=True)
    init_zero = BDNet(compute_dtype=jnp.bfloat16,
                      feature_volume_type="zero_cost_volume", train_bn=True)
    vars_zero = _init_variables(init_zero, jax.tree.map(lambda x: x[:1], cur),
                                jax.tree.map(lambda x: x[:1], src))
    # host-side copy: the donated zero-volume probe invalidates its state's
    # device buffers, and state_zero aliases vars_zero if it lives on-device
    # (observed: device_get(vars_zero) after donation -> TPU InvalidArgument)
    vars_zero = jax.device_get(vars_zero)
    state_zero = jax.device_put(
        state_lib.create_train_state(vars_zero, tx), dev)
    step_zero = jax.jit(state_lib.make_bd_train_step(net_zero), donate_argnums=(0,))
    results["zero_volume"] = _time_step(step_zero, state_zero, batch, rng, args.iters)
    print(f"{'zero-volume step':>22}: {results['zero_volume']:8.1f} ms", flush=True)

    # trunk-only (zero volume, surrogate loss on the decoder features):
    # zero_volume - trunk_zero isolates the ray-head + binary-loss block
    def trunk_zero_step(state, batch_, rng_):
        cur_d, src_d = batch_

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = net_zero.apply(
                variables, cur_d, src_d, jnp.asarray(False), "",
                rngs={"aug": rng_}, method=type(net_zero).trunk,
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            loss = sum(
                jnp.mean(jnp.square(f.astype(jnp.float32)))
                for f in out["features"].values()
            )
            return loss, mutated.get("batch_stats", state.batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_bs), {"loss": loss}

    state_zero2 = jax.device_put(
        state_lib.create_train_state(vars_zero, tx), dev)
    step_trunk = jax.jit(trunk_zero_step, donate_argnums=(0,))
    results["trunk_zero"] = _time_step(step_trunk, state_zero2, batch, rng, args.iters)
    print(f"{'trunk-only (zero vol)':>22}: {results['trunk_zero']:8.1f} ms", flush=True)

    print("\nderived sections:")
    vol = results["full"] - results["zero_volume"]
    print(f"{'volume block (f+b)':>22}: {vol:8.1f} ms")
    if "fwd_only" in results:
        print(f"{'bwd + update':>22}: {results['full'] - results['fwd_only']:8.1f} ms")
    print(f"{'conv stacks (f+b)':>22}: {results['zero_volume']:8.1f} ms (incl. heads)")
    if "trunk_zero" in results:
        head = results["zero_volume"] - results["trunk_zero"]
        print(f"{'ray head + loss (f+b)':>22}: {head:8.1f} ms")
    per = results["full"] / args.batch
    print(f"\nbatch={args.batch} remat={args.remat}: "
          f"{results['full']:.1f} ms/step = {per:.1f} ms/sample "
          f"({1000 * args.batch / results['full']:.1f} samples/s)")
    if args.json:
        print(json.dumps({"batch": args.batch, "remat": args.remat, **results}))


if __name__ == "__main__":
    main()
