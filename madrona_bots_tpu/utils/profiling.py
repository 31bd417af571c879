"""Profiling helpers.

The reference's only tracing is wall-clock step timing streamed to wandb
(SURVEY §5). Here: the same lightweight timers, plus hooks into the JAX
profiler for real device traces (tensorboard-compatible) when requested.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Wall-clock timing of jitted calls.

    Use `timed(fn, *args)`: it runs fn, blocks on its RESULT, records the
    elapsed time, and returns the result. (A context manager cannot see the
    body's output — with async dispatch it would block on a stale value and
    record enqueue latency, not execution. NOTE: on remote-TPU tunnels even
    block_until_ready under-reports; prefer a device_get-anchored harness
    like bench.py for publishable numbers.)"""

    def __init__(self):
        self.times: List[float] = []

    def timed(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    def fps(self, num_worlds: int, skip_first: int = 1) -> float:
        ts = self.times[skip_first:] or self.times
        return num_worlds / (sum(ts) / len(ts))

    def summary(self) -> Dict[str, float]:
        ts = self.times[1:] or self.times
        return {"mean_s": sum(ts) / len(ts), "min_s": min(ts),
                "max_s": max(ts), "n": len(ts)}


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """JAX profiler trace (open with tensorboard/xprof). No-op if logdir is
    falsy so call sites can be unconditional."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
