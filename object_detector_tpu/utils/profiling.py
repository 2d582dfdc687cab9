"""Tracing/profiling subsystem (SURVEY.md §5): jax.profiler wrappers +
step timers with explicit device fences."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Perfetto/XProf trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with a block_until_ready fence.

    Use `fence=False` on the steady-state path (async dispatch) and fence
    only on the sampled steps to avoid serializing the pipeline.
    """

    def __init__(self):
        self._t0 = time.perf_counter()

    def lap(self, result=None, fence: bool = True) -> float:
        if fence and result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt


def enable_debug_checks(nans: bool = True) -> None:
    """Debug-mode numerical checks (rebuild's answer to sanitizers —
    SURVEY.md §5): NaN checks on every jitted output."""
    if nans:
        jax.config.update("jax_debug_nans", True)
