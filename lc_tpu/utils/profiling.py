"""Profiling / tracing helpers (the reference has none — SURVEY §5; on TPU these
are nearly free: XLA traces + per-section timers)."""
from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sync=None):
    """Wall-clock a section; pass a pytree via `sync` to block on device work."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        logger.info('%s: %.2f ms', name, (time.perf_counter() - t0) * 1e3)


class StepTimer:
    """EMA step timer for training loops (crops/s reporting)."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ema = None
        self._last = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else \
                self.momentum * self.ema + (1 - self.momentum) * dt
        self._last = now
        return self.ema
