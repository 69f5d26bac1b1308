"""Tracing / profiling — a real observability layer (the reference has only
a 1-second FPS counter, ``VR/Engine/Private/Engine.cpp:250-262``).

- ``Profiler``: named wall-clock phases with nesting, rolling statistics
  and a rays/s derived metric; optionally forwards phases to the JAX
  profiler (``jax.profiler.TraceAnnotation``) so device traces line up
  with host phases.
- ``Profiler.start_device_trace`` wraps ``jax.profiler`` for XProf dumps.
- ``FrameStats``: the FPS-window counter of the reference engine, kept for
  parity.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace_annotation(name: str):
    """Host phase + device trace annotation."""
    try:
        import jax.profiler as jp
        ctx = jp.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        ctx = contextlib.nullcontext()
    with ctx:
        yield


class Profiler:
    def __init__(self, annotate_device: bool = True):
        self.annotate_device = annotate_device
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack = []

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        self._stack.append(name)
        full = "/".join(self._stack)
        ctx = (trace_annotation(full) if self.annotate_device
               else contextlib.nullcontext())
        try:
            with ctx:
                yield
        finally:
            dt = time.perf_counter() - start
            self.totals[full] += dt
            self.counts[full] += 1
            self._stack.pop()

    def mean(self, name: str) -> float:
        return self.totals[name] / max(1, self.counts[name])

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(f"{name}: {self.totals[name]*1e3:.2f} ms total, "
                         f"{self.mean(name)*1e3:.3f} ms/call "
                         f"x{self.counts[name]}")
        return "\n".join(lines)

    def rays_per_second(self, phase: str, rays_per_call: int) -> float:
        m = self.mean(phase)
        return rays_per_call / m if m > 0 else 0.0

    # -- device traces (XProf) --------------------------------------------
    @staticmethod
    def start_device_trace(log_dir: str) -> None:
        import jax.profiler

        jax.profiler.start_trace(log_dir)

    @staticmethod
    def stop_device_trace() -> None:
        import jax.profiler

        jax.profiler.stop_trace()


class FrameStats:
    """1-second-window FPS counter (engine parity)."""

    def __init__(self):
        self.fps = 0.0
        self._window_start = time.perf_counter()
        self._frames = 0

    def tick(self) -> None:
        self._frames += 1
        now = time.perf_counter()
        if now - self._window_start >= 1.0:
            self.fps = self._frames / (now - self._window_start)
            self._window_start = now
            self._frames = 0
