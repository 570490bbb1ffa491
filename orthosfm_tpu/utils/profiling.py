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


# ---------------------------------------------------------------------------
# Sub-stage attribution (opt-in). When a collector is active, `stage(name)`
# regions accumulate wall time into it, with a device barrier on exit so async
# device work is attributed to the stage that enqueued it. When no collector
# is active, `stage` is a no-op AND inserts no barriers — the production
# pipeline keeps its deliberately pipelined dispatch (e.g. the octave chain in
# ops/sift.extract_batch).

_STAGES: "Dict[str, float] | None" = None


def _device_barrier() -> None:
    """Block until all previously enqueued device programs complete (TPU
    executes programs in stream order, so syncing a fresh trivial program
    fences everything enqueued before it)."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jax.jit(lambda: jnp.zeros(()))())


@contextlib.contextmanager
def collect_stages(out: Dict[str, float]):
    """Activate sub-stage collection into `out` for the enclosed region."""
    global _STAGES
    prev, _STAGES = _STAGES, out
    try:
        yield out
    finally:
        _STAGES = prev


@contextlib.contextmanager
def stage(name: str):
    """Attribute the enclosed region (incl. device work it enqueued) to
    `name` when a collector is active; free otherwise."""
    if _STAGES is None:
        yield
        return
    out = _STAGES
    t0 = time.monotonic()
    try:
        yield
    finally:
        try:
            _device_barrier()
        except Exception:  # pragma: no cover - profiling must never break prod
            pass
        out[name] = out.get(name, 0.0) + (time.monotonic() - t0)


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
