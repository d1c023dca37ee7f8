"""Tracing / profiling hooks (SURVEY §5 — absent in the reference; built new).

Two tools:
- :class:`StepTimer` — rolling wall-clock step timing with images/sec,
  printed every N steps. Cheap (host clocks only; never syncs the device
  beyond what the train loop already does).
- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace for a step window.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional


class StepTimer:
    def __init__(self, window: int = 50, batch_size: Optional[int] = None,
                 print_every: Optional[int] = None) -> None:
        self.window = window
        self.batch_size = batch_size
        self.print_every = print_every
        self._times: deque = deque(maxlen=window + 1)
        self._step = 0

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        self._step += 1
        if self.print_every and self._step % self.print_every == 0:
            print(f"[timer] {self.summary()}", flush=True)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)

    def summary(self) -> str:
        sps = self.steps_per_sec
        s = f"step {self._step}: {sps:.2f} steps/s"
        if self.batch_size:
            s += f", {sps * self.batch_size:.1f} images/s"
        return s


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace window -> TensorBoard."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
