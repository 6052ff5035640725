"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

``maybe_trace`` wraps a region in a ``jax.profiler`` trace (viewable in
TensorBoard's profile plugin); ``StepTimer`` tracks steady-state step latency
with warmup discard. Enable via config: ``profile=true`` on the train CLI.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def maybe_trace(enabled: bool, log_dir: Path):
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir / "profile")):
        yield


class StepTimer:
    """Steady-state steps/sec with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.t0: float | None = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float | None:
        if self.t0 is None or self.count <= self.warmup:
            return None
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)
