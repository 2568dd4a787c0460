"""Tracing / profiling utilities.

Capability parity with the reference's ExecutionSummary +
ScopedExecutionTimer (execution_summary.h:44-70: per-call-site wall time and
call counts) and EventLogger (wall_time.h:76: intra-call phase timing).
The reference guards its map with a mutex; here a plain dict suffices
(host-side, single-threaded control loop). For on-device profiling use
jax.profiler traces; these timers bracket whole device calls.

Note: timing a jitted call measures dispatch+execution only if the result
is blocked on — ScopedExecutionTimer(..., block=True) calls
block_until_ready on an array you hand it.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class CallStatistics:
    __slots__ = ("time", "calls")

    def __init__(self):
        self.time = 0.0
        self.calls = 0


class ExecutionSummary:
    """execution_summary.h:44: name -> (total seconds, call count)."""

    def __init__(self):
        self._stats: Dict[str, CallStatistics] = defaultdict(CallStatistics)

    def record(self, name: str, seconds: float):
        s = self._stats[name]
        s.time += seconds
        s.calls += 1

    def statistics(self) -> Dict[str, CallStatistics]:
        return dict(self._stats)

    @contextlib.contextmanager
    def scoped_timer(self, name: str, block_on=None):
        """ScopedExecutionTimer (execution_summary.h:64)."""
        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on)
            self.record(name, time.time() - t0)

    def report(self) -> str:
        lines = [f"{'call site':<40}{'calls':>8}{'total s':>12}"
                 f"{'mean ms':>12}"]
        for name in sorted(self._stats):
            s = self._stats[name]
            mean_ms = 1e3 * s.time / max(s.calls, 1)
            lines.append(f"{name:<40}{s.calls:>8}{s.time:>12.4f}"
                         f"{mean_ms:>12.3f}")
        return "\n".join(lines)


class EventLogger:
    """wall_time.h:76: sequential phase timing inside one call."""

    def __init__(self, name: str, sink=None):
        self.name = name
        self.sink = sink            # callable(str) or None
        self.t_start = time.time()
        self.t_last = self.t_start
        self.events = []

    def add_event(self, event: str):
        now = time.time()
        self.events.append((event, now - self.t_last, now - self.t_start))
        self.t_last = now
        if self.sink:
            self.sink(f"{self.name}: {event} "
                      f"{self.events[-1][1]*1e3:.2f}ms "
                      f"(cum {self.events[-1][2]*1e3:.2f}ms)")

    def total(self) -> float:
        return time.time() - self.t_start
