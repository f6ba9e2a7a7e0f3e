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


def enable_persistent_cache(path: str = "/tmp/dxvae_xla_cache") -> bool:
    """Enable JAX's persistent compilation cache (cross-process): first
    compiles of the big unrolled programs drop from minutes to seconds on
    re-runs.  Must be called before any JAX computation; returns False if the
    backends were already initialized."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
