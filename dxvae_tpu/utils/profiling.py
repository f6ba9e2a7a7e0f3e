"""Profiling helpers (SURVEY.md §5: the reference has none).

* :func:`trace` — context manager around ``jax.profiler`` writing an XProf /
  TensorBoard trace directory;
* :func:`timeit` — block-until-ready timing harness used by bench.py for the
  patches/sec headline metric (median over repeats, after warmup so compile
  time is excluded).
"""

from __future__ import annotations

import contextlib
import statistics
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, warmup: int = 2, repeats: int = 5) -> dict:
    """Run ``fn(*args)`` with device-sync timing.  Returns seconds stats."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": statistics.median(times),
        "min_s": min(times),
        "mean_s": statistics.fmean(times),
        "repeats": repeats,
    }
