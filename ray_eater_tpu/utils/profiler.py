"""Frame profiling — the observability the reference never built.

SURVEY.md §5.1: the reference has no timers or GPU timestamp queries; its
only timing is glfw.getTime for animation. This module provides:

* :class:`FrameStats` — rolling frame-time/FPS aggregation (the swapchain
  uses one internally);
* :func:`annotate` — named XLA trace spans (jax.profiler) so passes show up
  in TensorBoard/XProf captures;
* :class:`StageTimer` — wall-clock per-stage breakdown with
  ``block_until_ready`` fencing, for quick printf-profiling of a pipeline
  (used by bench.py's stderr breakdown).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named trace span visible in jax.profiler captures."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/device trace for TensorBoard (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameStats:
    """Rolling frame statistics (count, FPS, p50/p99 frame time)."""

    def __init__(self, window: int = 240):
        self.times: deque[float] = deque(maxlen=window)
        self._last: float | None = None
        self.frames = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now
        self.frames += 1

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        ts = sorted(self.times)
        if not ts:
            return {"frames": self.frames, "fps": 0.0}
        p = lambda q: ts[min(len(ts) - 1, int(q * len(ts)))] * 1000
        return {"frames": self.frames, "fps": round(self.fps, 2),
                "p50_ms": round(p(0.50), 2), "p99_ms": round(p(0.99), 2)}


class StageTimer:
    """Fenced wall-clock stage timing::

        st = StageTimer()
        with st.stage("project"):
            ps = project(...)          # fenced on exit
        print(st.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        result = []
        try:
            yield result
        finally:
            for x in result:
                jax.block_until_ready(x)
            if fence is not None:
                jax.block_until_ready(fence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1.0
        return "\n".join(
            f"{name:>16}: {ms * 1000 / max(self.counts[name], 1):8.2f} ms/call "
            f"x{self.counts[name]:<4} ({ms / total:5.1%})"
            for name, ms in rows)
