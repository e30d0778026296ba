"""Observability: profiling hooks, NaN guards, shape tracing.

TPU-native replacements for the reference's aux subsystems (SURVEY §5):
- profiling: jax.profiler trace capture around training steps (replaces the
  never-used torch-tb-profiler + cuda memory summaries, train.py:1344-1348)
- NaN/anomaly detection: jax debug_nans config (replaces Trainer(detect_anomaly),
  train.py:1335) — opt-in because it forces synchronous dispatch
- shape tracing: a debug logger matching the reference's pervasive logging.info
  shape dumps (silent unless enabled, train.py:50-55)
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("zest_tpu")


def enable_shape_tracing(level=logging.INFO):
    """Turn on the shape-trace log stream (reference: coloredlogs at WARNING
    keeps them silent by default; lowering the level flips them on)."""
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s:%(module)s.%(funcName)s %(levelname)s %(message)s")
    logger.setLevel(level)


def enable_anomaly_detection():
    """jax equivalent of detect_anomaly=True: raise on NaN producers."""
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + rays/sec meter for the training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.perf_counter()
        self._count = 0

    def tick(self, n: int = 1):
        self._count += n
        if self._count >= self.window:
            dt = time.perf_counter() - self._t0
            rate = self._count / dt
            self._t0 = time.perf_counter()
            self._count = 0
            return rate
        return None


def device_memory_stats():
    """Per-device memory stats (replaces torch.cuda.memory_summary)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
