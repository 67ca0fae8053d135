"""Profiling / tracing helpers (SURVEY.md §5).

The reference's only instrumentation is per-batch CUDA-event wall time
(test_bd.py:119-120,196-212). The TPU build adds:
- StepTimer: reliable per-step timing (scalar-readback sync — under some
  transports jax.block_until_ready can return before execution ends),
- trace(): a jax.profiler trace context writing TensorBoard-viewable
  traces,
- compile_log(): compile-time accounting for jitted functions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def force_sync(tree) -> None:
    """Synchronises on a pytree of device arrays via a scalar readback."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jnp.sum(leaves[0].astype(jnp.float32) * 0.0))


class StepTimer:
    """Running per-step wall-time stats with true device sync."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            force_sync(outputs)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.times) * 1000.0) if self.times else float("nan")

    @property
    def p50_ms(self) -> float:
        return float(np.percentile(self.times, 50) * 1000.0) if self.times else float("nan")

    @property
    def p95_ms(self) -> float:
        return float(np.percentile(self.times, 95) * 1000.0) if self.times else float("nan")

    def summary(self) -> dict:
        return {"mean_ms": self.mean_ms, "p50_ms": self.p50_ms,
                "p95_ms": self.p95_ms, "steps": len(self.times)}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_log(fn, *args, name: str = "fn") -> dict:
    """Lowers + compiles a jittable fn, reporting wall times and FLOP
    estimates from XLA's cost analysis when available."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    info = {"name": name, "lower_s": t_lower, "compile_s": t_compile}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        info["flops"] = cost.get("flops")
        info["bytes_accessed"] = cost.get("bytes accessed")
    except Exception:
        pass
    return info
