"""Observability: timing, device profiling, and numeric-safety helpers.

The reference has no tracing framework; its profiling is perf_counter loops
with sync barriers (/root/reference/benchmark/run_benchmark.py:106-168). This
module provides the TPU-native equivalents:

 - :func:`timed` / :class:`Timer` — wall-clock measurement with proper
   ``block_until_ready`` synchronization;
 - :func:`trace` — scoped ``jax.profiler`` capture for XLA/Pallas inspection
   (view in TensorBoard or parse the trace.json.gz);
 - :func:`debug_nans` — scoped NaN checking (the runtime analogue of the
   reference's divide_no_nan discipline and gradient-finiteness tests).

Benchmarking caveat for remote/tunneled TPU backends: repeated identical
executions may be served from a cache — always time with varying inputs (see
benchmark/run_benchmark.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class Timer:
    """Accumulating wall-clock timer with device synchronization."""

    def __init__(self):
        self.times: list = []

    @contextlib.contextmanager
    def measure(self, result_holder: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder)
        self.times.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.times)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times)


def timed(fn: Callable, *args, reps: int = 5, warmup: int = 1, **kwargs):
    """Run ``fn`` with sync; returns (best_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return min(times), result


@contextlib.contextmanager
def trace(logdir: str = '/tmp/smplfitter_tpu_trace'):
    """Scoped device profiler capture (TensorBoard format)."""
    with jax.profiler.trace(logdir):
        yield logdir


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax NaN debugging: computations raise on NaN production."""
    prev = jax.config.jax_debug_nans
    jax.config.update('jax_debug_nans', enable)
    try:
        yield
    finally:
        jax.config.update('jax_debug_nans', prev)
