"""Profiling helpers (SURVEY.md §5: the reference has none).

* :func:`trace` — context manager around ``jax.profiler`` writing an XProf /
  TensorBoard trace directory;
* :func:`timeit` — device-sync timing harness (median over repeats, after
  warmup so compile time is excluded).  Syncs by READING the outputs back to
  host (``np.asarray``), not ``block_until_ready`` — on this image's tunneled
  axon TPU ``block_until_ready`` returns immediately (CLAUDE.md), so readback
  is the only reliable fence.  Note bench.py does NOT use this: single-call
  timing on the tunnel carries a ~29 ms fixed readback cost, so the headline
  uses K-chained programs with two-K differencing instead.
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


def _sync(out):
    """Force completion by reading every output leaf back to host.  Works on
    the axon tunnel where ``block_until_ready`` is a no-op; includes the
    readback cost (~29 ms fixed on the tunnel) — fine for coarse timing,
    useless for sub-readback latencies (use K-chaining like bench.py)."""
    import numpy as np

    jax.tree.map(np.asarray, out)


def timeit(fn, *args, warmup: int = 2, repeats: int = 5) -> dict:
    """Run ``fn(*args)`` with device-sync timing.  Returns seconds stats."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": statistics.median(times),
        "min_s": min(times),
        "mean_s": statistics.fmean(times),
        "repeats": repeats,
    }


CACHE_DIR = "/tmp/dxvae_xla_cache"  # default persistent-compile-cache path


def enable_persistent_cache(path: str = CACHE_DIR) -> bool:
    """Enable JAX's persistent compilation cache (cross-process): first
    compiles of the big unrolled programs drop from minutes to seconds on
    re-runs.  Call before the computations you want cached — programs
    compiled earlier in the process are not retroactively cached (the config
    update itself succeeds either way).  Returns False (with a stderr note)
    only if the config update fails, e.g. a jax build without the option."""
    import sys

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception as e:  # misconfiguration must be diagnosable, not silent
        print(f"# warning: persistent compile cache disabled ({e!r})",
              file=sys.stderr)
        return False
