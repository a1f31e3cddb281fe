"""Profiling / tracing hooks.

SURVEY.md §5: the reference has no first-party tracing (only the C++
latency timer). Here: jax.profiler trace capture around training or
inference regions, viewable in TensorBoard/Perfetto, plus a simple
steady-state timer helper shared by bench.py and the tools.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax

__all__ = ["trace", "steady_state_timer"]


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def peak_hbm_gb() -> Optional[float]:
    """Device 0's peak HBM high-water mark in GiB, or None when the
    backend exposes no allocator stats (CPU, some PJRT plugins)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        return None if peak is None else float(peak) / 2**30
    except Exception:
        return None


def steady_state_timer(fn: Callable, args=(), warmup: int = 10,
                       iters: int = 50) -> float:
    """Seconds per call after warmup, blocking on each result."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
