"""Profiling & observability hooks.

The reference has no tracing at all (SURVEY.md §5: only periodic text
logging, executor.py:65-75). Here:

- `trace(dir)` context manager wraps a step range in a jax.profiler
  trace (viewable in TensorBoard / Perfetto);
- `StepTimer` tracks wall-time and derived audio-sec/sec/chip counters
  (the BASELINE.json headline metric) with exponential smoothing;
- `annotate(name)` adds named TraceAnnotation regions to device
  timelines.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Step-time + audio-throughput counters with EMA smoothing."""

    def __init__(self, frame_shift_ms: float = 10.0, ema: float = 0.98,
                 n_chips: int | None = None):
        self.frame_shift_s = frame_shift_ms / 1000.0
        self.ema = ema
        self.n_chips = n_chips or jax.device_count()
        self._last = None
        self.step_time_ema = None
        self.audio_per_sec_ema = None
        self.steps = 0

    def tick(self, n_frames: int) -> dict:
        """Call once per step with the batch's total valid frame count."""
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            audio_s = n_frames * self.frame_shift_s
            rate = audio_s / dt / self.n_chips
            if self.step_time_ema is None:
                self.step_time_ema = dt
                self.audio_per_sec_ema = rate
            else:
                self.step_time_ema = (self.ema * self.step_time_ema
                                      + (1 - self.ema) * dt)
                self.audio_per_sec_ema = (self.ema * self.audio_per_sec_ema
                                          + (1 - self.ema) * rate)
            out = {"step_time_s": dt,
                   "step_time_ema_s": self.step_time_ema,
                   "audio_sec_per_sec_per_chip": rate,
                   "audio_sec_per_sec_per_chip_ema":
                       self.audio_per_sec_ema}
        self._last = now
        self.steps += 1
        return out
