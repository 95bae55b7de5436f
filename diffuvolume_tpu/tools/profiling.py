"""Profiling harness: stage timings, roofline estimates, JAX profiler traces.

The reference measures wall-clock only (SURVEY.md §5).  This harness times the
pipeline stages honestly (block_until_ready), estimates per-stage
speed-of-light against the chip's peak FLOPs/bandwidth, and can capture a full
XLA trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax


# v5e reference peaks (per chip).  Used only for SoL ratios in reports.
PEAKS = {
    "tpu v5 lite": {"flops_bf16": 394e12, "flops_f32": 197e12, "hbm_gbps": 819.0},
    "tpu v5": {"flops_bf16": 459e12, "flops_f32": 229e12, "hbm_gbps": 1228.0},
    "cpu": {"flops_bf16": 1e11, "flops_f32": 1e11, "hbm_gbps": 50.0},
}


def device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAKS.items():
        if k in kind:
            return v
    return PEAKS["cpu"]


@dataclasses.dataclass
class StageReport:
    name: str
    ms: float
    flops: float | None = None
    bytes_moved: float | None = None

    def speed_of_light(self) -> dict:
        peaks = device_peaks()
        out = {"name": self.name, "ms": round(self.ms, 2)}
        if self.flops:
            sol_ms = self.flops / peaks["flops_f32"] * 1e3
            out["flops_sol_ms"] = round(sol_ms, 3)
            out["flops_efficiency"] = round(sol_ms / self.ms, 3)
        if self.bytes_moved:
            sol_ms = self.bytes_moved / (peaks["hbm_gbps"] * 1e9) * 1e3
            out["bw_sol_ms"] = round(sol_ms, 3)
            out["bw_efficiency"] = round(sol_ms / self.ms, 3)
        return out


def time_stage(
    fn: Callable, *args, iters: int = 5, warmup: int = 1, vary: bool = True, **kw
) -> float:
    """Median wall-clock ms with device sync.

    ``vary=True`` perturbs the first float-array argument per iteration.  This
    matters on remote-execution backends (this container's axon relay), which
    CACHE identical (executable, args) executions — timing the same call
    repeatedly measures the cache, not the chip.
    """
    import jax.numpy as jnp

    def call(i):
        if vary and args and hasattr(args[0], "dtype") and jnp.issubdtype(
            args[0].dtype, jnp.floating
        ):
            a0 = args[0] + jnp.asarray(i * 1e-6, args[0].dtype)
            return fn(a0, *args[1:], **kw)
        return fn(*args, **kw)

    for i in range(warmup):
        jax.block_until_ready(call(-1 - i))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(call(i))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
