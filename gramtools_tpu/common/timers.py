"""Per-phase timing reports.

Parity: libgramtools src/common/timer_report.cpp:10-48 (TimerReport).
Extended with a jax.profiler trace hook for TPU kernel inspection.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import List, Tuple

log = logging.getLogger("gramtools_tpu")


class TimerReport:
    def __init__(self):
        self.entries: List[Tuple[str, float]] = []
        self._start = None
        self._name = None

    def start(self, name: str):
        self._name = name
        self._start = time.perf_counter()

    def stop(self):
        if self._name is None:
            return
        self.entries.append((self._name, time.perf_counter() - self._start))
        self._name = None

    @contextlib.contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop()

    def report(self):
        log.info("Timer report:")
        total = 0.0
        for name, elapsed in self.entries:
            log.info("  %-24s %8.2fs", name, elapsed)
            total += elapsed
        log.info("  %-24s %8.2fs", "TOTAL", total)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a region; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
