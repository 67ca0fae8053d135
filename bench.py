"""Benchmark entry: dense occlusion-eval forward throughput on one chip.

Prints ONE JSON line:
  {"metric": "bd_eval_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N / BASELINE_FPS}

The measured quantity mirrors the reference's `model_time` protocol
(test_bd.py:196-212): full BDNet forward with dense 8-plane queries at
512x384, batch 1, steady state.

vs_baseline divides by the MEASURED throughput of the actual PyTorch
reference (experiment_modules/bd_model.py driven by
scripts/bench_reference_torch.py at the same shapes/protocol) on this
host's CPU — the only hardware the reference can run on in this
environment; the number lives in BASELINE.json["measured"]. It is a
cross-hardware ratio (TPU v5e chip vs host CPU) and is labelled as such
in BASELINE.md; the reference repo/paper publish no GPU timing to
compare against. If the measured block is absent, vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax_compile"),
)

WARMUP = 3
ITERS = 50


def _baseline_fps() -> float | None:
    """Measured reference fps from BASELINE.json (scripts/bench_reference_torch.py)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as f:
            return json.load(f)["measured"]["reference_torch_cpu_fps"]
    except (OSError, KeyError, json.JSONDecodeError):
        return None


def main() -> None:
    from __graft_entry__ import entry

    fn, (variables, cur, src) = entry()
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    cur = jax.device_put(cur, dev)
    src = jax.device_put(src, dev)

    # NOTE: under the axon tunnel block_until_ready can return before the
    # computation finishes; a scalar readback is the only reliable sync.
    # TPU execution is in-order, so timing N dispatches + one final
    # readback measures true per-step latency.
    jfn = jax.jit(lambda v, c, s: jax.tree.map(
        lambda x: jnp.sum(x.astype(jnp.float32)), fn(v, c, s)))

    for _ in range(WARMUP):
        out = jfn(variables, cur, src)
    _ = float(jax.tree.leaves(out)[0])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(variables, cur, src)
    _ = float(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS

    batch = cur["image"].shape[0]
    fps = batch / dt
    base = _baseline_fps()
    print(json.dumps({
        "metric": "bd_eval_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        # measured PyTorch-reference-on-host-CPU denominator (see docstring)
        "vs_baseline": round(fps / base, 2) if base else None,
    }))


if __name__ == "__main__":
    main()
