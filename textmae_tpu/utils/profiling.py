"""Profiling: XLA trace capture + wall-clock step timing.

The reference's only observability is wall-clock timers and CUDA max-memory in
the metric logger (SURVEY.md §5). TPU-native upgrade: `profile_trace` captures
a full jax.profiler trace (viewable in TensorBoard / Perfetto) around any code
region; `StepTimer` provides the iter/data timing the logger consumes.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (CLIs and bench call this:
    repeat runs skip minutes of XLA compiles, especially over remote-compile
    TPU tunnels)."""
    import os

    import jax

    try:
        if cache_dir is None and jax.config.jax_compilation_cache_dir:
            # already configured (e.g. the test conftest's cache) — switching
            # dirs mid-process would strand every later compile in a cold
            # cache, so keep the existing one
            return
        cache_dir = cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op if log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock phase timer: data (host wait) vs step (device) seconds."""

    def __init__(self):
        self.data_s = 0.0
        self.step_s = 0.0
        self.steps = 0
        self._mark = time.time()

    def data_done(self):
        now = time.time()
        self.data_s += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.time()
        self.step_s += now - self._mark
        self._mark = now
        self.steps += 1

    def rates(self) -> dict:
        n = max(self.steps, 1)
        return {"data_time": self.data_s / n, "step_time": self.step_s / n}
