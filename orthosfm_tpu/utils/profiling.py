"""Profiling utilities: phase wall timers + JAX device traces.

The reference's observability is coarse phase timers persisted to
time_measurements.txt (src/util/timing.cpp) plus per-stage prints. This module
keeps that surface (PhaseTimer) and adds the TPU-native piece the reference
lacks: `device_trace` wraps a region in a jax.profiler trace whose
tensorboard-viewable output shows per-op device time (XLA/Mosaic kernels).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple


class PhaseTimer:
    """Named phase wall-clock timing (steady-clock analog of
    reference timing.h:19-31)."""

    def __init__(self):
        self._phases: List[Tuple[str, float]] = []
        self._current: str | None = None
        self._t0 = 0.0

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self._phases.append((name, time.monotonic() - t0))

    def elapsed(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self._phases:
            out[name] = out.get(name, 0.0) + dt
        return out

    def report(self) -> str:
        return "\n".join(f"{name}: {dt:.3f} s" for name, dt in self.elapsed().items())


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region (view with
    tensorboard --logdir=<logdir>). No-op on failure so production runs never
    break on profiling plumbing."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:  # pragma: no cover
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # pragma: no cover
                pass
