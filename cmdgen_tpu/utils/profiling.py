"""Profiling + timing: jax.profiler traces and step timers.

The reference has no tracing at all (SURVEY.md §5) — only wall-clock prints
(AverageMeter/timeSince, GCPG/utils/utils.py:10-40). This module makes both
first-class: a device trace context around any code region, and functional
meters for the training loops.
"""
from __future__ import annotations

import contextlib
import math
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Running value/average meter (GCPG/utils/utils.py:10-25)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def time_since(since: float, fraction: float) -> str:
    """'elapsed (remain X)' progress string (utils.py:28-40)."""

    def fmt(s):
        m = math.floor(s / 60)
        return f"{m}m {int(s - m * 60)}s"

    now = time.time()
    elapsed = now - since
    total = elapsed / max(fraction, 1e-9)
    return f"{fmt(elapsed)} (remain {fmt(total - elapsed)})"


class StepTimer:
    """Per-phase wall-clock accounting for train/sample loops."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}
        self._t0: Optional[float] = None
        self._phase: Optional[str] = None

    def start(self, phase: str):
        self._t0 = time.perf_counter()
        self._phase = phase

    def stop(self):
        if self._phase is None:
            return
        dt = time.perf_counter() - self._t0
        self.meters.setdefault(self._phase, AverageMeter()).update(dt)
        self._phase = None

    @contextlib.contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}
