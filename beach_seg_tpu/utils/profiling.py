"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

``maybe_trace`` wraps a region in a ``jax.profiler`` trace (viewable in
TensorBoard's profile plugin); ``StepTimer`` tracks steady-state step latency
with warmup discard. Enable via config: ``profile=true`` on the train CLI.
"""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None, min_compile_secs: float = 2.0) -> None:
    """Point XLA at a persistent on-disk compilation cache.

    A cold ViT-L jit takes minutes on the tunneled TPU backend; with the cache
    a second process loads the executable in ~20 ms (verified on the axon
    PJRT plugin). Safe to call multiple times; honours
    ``BEACH_SEG_TPU_NO_COMPILE_CACHE=1`` for debugging."""
    if os.environ.get("BEACH_SEG_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get(
        "BEACH_SEG_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/beach_seg_tpu/xla")
    )
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)


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
