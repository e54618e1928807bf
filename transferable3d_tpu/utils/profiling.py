"""Profiling helpers (SURVEY.md §5.1).

The reference had TF1 summaries only; here: `jax.profiler` trace capture
around training steps (TensorBoard-profile-compatible) plus a simple
steady-state step timer used by bench.py and the train loop's
frustums/sec counter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state steps/sec with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        self._t0 = None

    def tick(self) -> None:
        self._n += 1
        if self._n == self.warmup:
            self._t0 = time.perf_counter()

    def rate(self) -> float:
        """Steps/sec over the post-warmup window."""
        if self._t0 is None or self._n <= self.warmup:
            return 0.0
        return (self._n - self.warmup) / (time.perf_counter() - self._t0)
