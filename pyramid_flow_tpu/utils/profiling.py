"""Profiling / tracing utilities.

The reference's observability is wall-clock meters + CUDA max-memory
(`trainer_misc/utils.py:352-396`). TPU-native equivalents:

* :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-viewable
  XPlane dumps (op-level device timelines, HBM usage).
* :class:`PhaseTimer` — host-side phase timing with device sync, for the
  pipeline's unit/stage loops.
* :func:`device_memory_stats` — per-device HBM stats (the CUDA max-memory
  equivalent).
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` for custom spans.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ["trace", "annotate", "PhaseTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per phase, syncing the device at boundaries."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "  ".join(
            f"{k}: {v:.2f}s/{self.counts[k]}x" for k, v in rows)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
    return out
