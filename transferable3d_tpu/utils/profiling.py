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


def xplane_exclusive_ps(trace_dir: str) -> dict:
    """Parse a captured trace's xplane proto -> {op_name: exclusive ps}.

    The tensorboard-profile plugin converters are broken in this image
    (CLAUDE.md), so the proto is read directly: the "XLA Ops" line gives
    per-op intervals; exclusive time subtracts nested children via a
    stack sweep. `%while` wrappers and async markers are dropped.
    """
    import collections
    import glob
    import os

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane in {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    per_op = collections.Counter()
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                          ev_names.get(ev.metadata_id, "?"))
                         for ev in line.events)
            stack = []

            def pop():
                s, e, n, child = stack.pop()
                per_op[n] += (e - s) - child
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2],
                                 stack[-1][3] + (e - s))

            for start, end, name in evs:
                while stack and stack[-1][1] <= start:
                    pop()
                stack.append((start, end, name, 0))
            while stack:
                pop()
    return {n: v for n, v in per_op.items()
            if not n.startswith("%while") and "async" not in n}


def device_ms(fn, *args, steps: int = 3) -> float:
    """Exclusive device ms per call of `fn(*args)` (jitted), via a trace.

    Wall timing through the axon TPU relay lies (block_until_ready can
    return early — CLAUDE.md); profiler exclusive time does not.
    """
    import tempfile

    import jax

    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = tempfile.mkdtemp(prefix="t3d_devms_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return sum(xplane_exclusive_ps(trace_dir).values()) / (steps * 1e9)


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
