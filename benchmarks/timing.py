"""Benchmark timing harness correct under the axon TPU tunnel.

Two quirks of this environment (measured, see commit history):
  - jax.block_until_ready() returns immediately (does not fence), so naive
    timings only measure dispatch.
  - A device->host fetch costs ~28 ms round-trip through the tunnel.

Methodology: dispatch `iters` calls (device executes them serially), fence
with a tiny device_get, then subtract the separately-measured fetch
round-trip. Use enough iterations that per-call noise from the single
fence is negligible.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np


def _fence(out: Any) -> None:
    leaf = jax.tree.leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def fetch_overhead(out: Any, probes: int = 3) -> float:
    """Median round-trip of the fence itself (buffer already computed)."""
    ts = []
    for _ in range(probes):
        t0 = time.perf_counter()
        _fence(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(fn: Callable, *args: Any, iters: int = 50, warmup: int = 2) -> float:
    """Average seconds per call of a jitted fn, tunnel-corrected."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _fence(out)
    overhead = fetch_overhead(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    total = time.perf_counter() - t0
    return max(total - overhead, 1e-9) / iters
