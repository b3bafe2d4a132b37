"""Tracing / profiling utilities.

The reference ships only an unused cProfile decorator
(``utils.py:131-142``) and tqdm bars; this module is the build-up SURVEY.md
§5 calls for:

* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-readable device trace;
* ``StepTimer`` — rolling wall-clock stats for train/eval steps (used by
  the Trainer's epoch logging);
* ``profile`` — the reference's cProfile decorator, kept for parity.
"""

from __future__ import annotations

import cProfile
import contextlib
import logging
import pstats
import time

log = logging.getLogger('textgcn_tpu')


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info('profiler trace written to %s', logdir)


class StepTimer:
    """Rolling step timing: call ``tick()`` per step, read ``summary()``."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def summary(self) -> str:
        if not self._times:
            return 'no steps timed'
        ts = sorted(self._times)
        p50 = ts[len(ts) // 2]
        p95 = ts[int(len(ts) * 0.95)]
        return (f'steps={len(ts)} mean={self.mean_s * 1e3:.1f}ms '
                f'p50={p50 * 1e3:.1f}ms p95={p95 * 1e3:.1f}ms')


def profile(func):
    """cProfile decorator (reference ``utils.py:131-142`` parity)."""

    def wrapper(*args, **kwargs):
        profiler = cProfile.Profile()
        profiler.enable()
        result = func(*args, **kwargs)
        profiler.disable()
        pstats.Stats(profiler).sort_stats('cumtime').print_stats(30)
        return result

    return wrapper
