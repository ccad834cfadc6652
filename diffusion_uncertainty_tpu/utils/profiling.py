"""Profiling helpers: jax.profiler traces + honest device timing.

The reference measures wall-clock only (``timeit.default_timer`` around full
sampling calls, ``scripts/measure_times_imagenet.py:88-134``). Here:
``trace(...)`` captures a TensorBoard-compatible device trace, and
``device_timeit`` reports block-until-ready-bracketed timings with the
compile excluded — the discipline every number in ``results/times.json`` and
``bench.py`` follows.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable

import jax

__all__ = ["trace", "device_timeit"]


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timeit(fn: Callable, *args, repeats: int = 3, warmup: int = 1) -> dict:
    """min/mean wall seconds of ``fn(*args)`` with compile excluded."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"min_s": min(times), "mean_s": sum(times) / len(times), "times": times}
