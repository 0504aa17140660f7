"""Tracing / profiling helpers.

The reference's only instrumentation is wall-clock timing around the sampling
loop (/root/reference/src/sampler.jl:182) and debug logs. TPU-native upgrade
(SURVEY.md §5): wrap any sampling region in `jax.profiler.trace` for XProf
timelines, and report leapfrog-steps/s + ESS/s from transition stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Profile a sampling region: `with profiling.trace('/tmp/xprof'): ...`.

    Without a logdir, just times the region.
    """
    t0 = time.time()
    if logdir is not None:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
    dt = time.time() - t0
    print(f"[advancedhmc_tpu] traced region: {dt:.3f}s"
          + (f" (xprof in {logdir})" if logdir else ""))


def throughput_report(result, wall_seconds: float, n_chips: int = 1):
    """Native throughput metrics from a SampleResult: leapfrog steps/s/chip
    and ESS/s/chip (the BASELINE.md headline metrics)."""
    from .diagnostics import effective_sample_size

    n_steps = np.asarray(result.stats["n_steps"], np.float64)
    total_leapfrogs = float(n_steps.sum())
    ess = np.asarray(effective_sample_size(result.thetas))
    report = {
        "leapfrog_steps_per_s_per_chip": total_leapfrogs / wall_seconds / n_chips,
        "ess_per_s_per_chip": float(np.median(ess)) / wall_seconds / n_chips,
        "total_leapfrog_steps": total_leapfrogs,
        "median_ess": float(np.median(ess)),
        "wall_seconds": wall_seconds,
    }
    return report
