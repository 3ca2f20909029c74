"""Profiling & tracing hooks (SURVEY.md §5.1 — absent in the reference).

Idiomatic JAX observability: ``jax.profiler`` trace capture around training
windows (viewable in TensorBoard/Perfetto), plus a lightweight step timer
that tracks host-visible step latency and derived throughput without
forcing device syncs (it reads the metrics dict the compiled step already
returns).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-latency/throughput stats for the training loop."""

    def __init__(self, window: int = 50):
        self.window = int(window)
        self._durations: List[float] = []
        self._items: List[float] = []
        self._last: Optional[float] = None

    def tick(self, items: float = 0.0) -> None:
        """Call once per step; items = e.g. seconds of audio in the batch."""
        now = time.perf_counter()
        if self._last is not None:
            self._durations.append(now - self._last)
            self._items.append(items)
            if len(self._durations) > self.window:
                self._durations.pop(0)
                self._items.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        durations = np.asarray(self._durations)
        out = {
            "step_ms_p50": float(np.percentile(durations, 50) * 1000),
            "step_ms_p95": float(np.percentile(durations, 95) * 1000),
            "steps_per_sec": float(1.0 / durations.mean()),
        }
        total_items = float(np.sum(self._items))
        if total_items > 0:
            out["items_per_sec"] = total_items / float(durations.sum())
        return out
