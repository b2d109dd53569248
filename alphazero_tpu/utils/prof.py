"""Profiling and tracing utilities.

Re-design of ``/root/reference/src/prof_utils.jl`` (chrome://tracing event
emission) for TPU: ``jax.profiler`` traces viewable in Perfetto/TensorBoard,
plus lightweight host-side phase timing that complements ``report.timed``.

Usage::

    with prof.trace("/tmp/profile"):     # device + host trace
        run_training_step()

    with prof.phase("self_play"):        # host event, printed summary
        ...
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (``jax.profiler``), the analogue of the
    reference's chrome-tracing logger (``prof_utils.jl:45-64``)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_events: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str):
    """Host-side timed event (``prof_utils.jl:12-43``)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _events[name].append(time.perf_counter() - t0)


def summary() -> Dict[str, Dict[str, float]]:
    return {
        name: {
            "count": len(ts),
            "total_s": sum(ts),
            "mean_s": sum(ts) / len(ts),
            "max_s": max(ts),
        }
        for name, ts in _events.items()
    }


def reset():
    _events.clear()


def timeit(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Best-of-n wall time of a jitted function with blocking."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
