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


# dense bf16 peak FLOP/s by device kind (MFU denominator)
_CHIP_PEAKS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for name, peak in _CHIP_PEAKS.items():
        if kind.startswith(name):
            return peak
    return None


def _time_fn(jfn, args, iters: int) -> float:
    """Steady-state seconds/call. TPU execution is in-order, so timing N
    dispatches + one final scalar readback measures true latency (under
    the axon tunnel block_until_ready can return early)."""
    for _ in range(WARMUP):
        out = jfn(*args)
    _ = float(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def _time_min_of_blocks(jfn, args, iters: int, blocks: int = 3):
    """Min + spread over independent timing blocks (VERDICT r4 item 1).

    A single 50-iteration block is vulnerable to one-off host/tunnel
    contention (BENCH_r04 recorded 108.85 ms for a 13 ms forward that
    its own sweep contradicted). The min of several blocks is the
    latency the hardware actually delivers; the spread is recorded so a
    noisy run is visible in the artifact instead of silently becoming
    the headline.
    """
    times = [_time_fn(jfn, args, iters) for _ in range(blocks)]
    return min(times), times


def main() -> None:
    # watchdog: device acquisition through the axon tunnel can block
    # FOREVER when the pool is unreachable (observed multi-hour outage).
    # A hung bench tells the driver nothing; fail loudly instead. The
    # timer is cancelled the moment the backend answers.
    import threading

    def _die():
        print(json.dumps({"metric": "bd_eval_frames_per_sec", "value": None,
                          "unit": "frames/s", "vs_baseline": None,
                          "error": "device acquisition timed out (tunnel down?)"}),
              flush=True)
        os._exit(3)

    watchdog = threading.Timer(420.0, _die)
    watchdog.daemon = True
    watchdog.start()

    from __graft_entry__ import entry

    fn, (variables, cur, src) = entry()
    dev = jax.devices()[0]
    watchdog.cancel()
    variables = jax.device_put(variables, dev)
    cur = jax.device_put(cur, dev)
    src = jax.device_put(src, dev)

    jfn = jax.jit(lambda v, c, s: jax.tree.map(
        lambda x: jnp.sum(x.astype(jnp.float32)), fn(v, c, s)))

    # b=1 latency point (the reference's model_time protocol) + FLOPs:
    # min of >=3 independent blocks, spread recorded
    dt1, b1_blocks = _time_min_of_blocks(jfn, (variables, cur, src), ITERS)
    fps1 = 1.0 / dt1

    # throughput sweep (VERDICT r2 item 1b; extended to b=16/32 per
    # VERDICT r3 item 4): the chip's best operating point, not just the
    # b=1 latency point
    sweep = {1: round(fps1, 2)}
    for b in (4, 8, 16, 32):
        try:
            cur_b = jax.device_put(
                jax.tree.map(lambda x: jnp.repeat(x, b, 0), cur), dev)
            src_b = jax.device_put(
                jax.tree.map(lambda x: jnp.repeat(x, b, 0), src), dev)
            dt = _time_fn(jfn, (variables, cur_b, src_b), max(ITERS // 3, 10))
            sweep[b] = round(b / dt, 2)
        except Exception:
            sweep[b] = None
    best_b = max((b for b in sweep if sweep[b]), key=lambda b: sweep[b])

    # self-consistency guard (VERDICT r4 item 1): batching can only
    # amortise per-dispatch cost, so the b=1 latency must not exceed ~2x
    # the per-frame latency the b=4 sweep point implies. If it does, the
    # b=1 blocks hit host/tunnel contention — re-measure and record the
    # flag so the artifact carries its own health signal.
    contention = False
    if sweep.get(4):
        implied = 1.0 / sweep[4]  # seconds/frame at b=4
        if dt1 > 2.0 * implied:
            contention = True
            dt1_retry, retry_blocks = _time_min_of_blocks(
                jfn, (variables, cur, src), ITERS)
            b1_blocks += retry_blocks
            dt1 = min(dt1, dt1_retry)
            fps1 = 1.0 / dt1
            sweep[1] = round(fps1, 2)
            contention = dt1 > 2.0 * implied  # still bad after retry?

    mfu = None
    try:
        cost = jfn.lower(variables, cur, src).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = _peak_flops()
        if flops and peak:
            mfu = round(100.0 * flops / dt1 / peak, 2)
    except Exception:
        pass

    base = _baseline_fps()
    print(json.dumps({
        "metric": "bd_eval_frames_per_sec",
        "value": round(fps1, 2),
        "unit": "frames/s",
        # measured PyTorch-reference-on-host-CPU denominator (see docstring)
        "vs_baseline": round(fps1 / base, 2) if base else None,
        "latency_ms_b1": round(dt1 * 1000.0, 2),
        "b1_block_spread_ms": [round(t * 1000.0, 2) for t in b1_blocks],
        "b1_contention_flag": contention,
        "mfu_pct_b1": mfu,
        "throughput_sweep_fps": {str(b): v for b, v in sweep.items()},
        "best_batch": best_b,
        "best_fps": sweep[best_b],
    }))


if __name__ == "__main__":
    main()
