"""Persistent XLA compilation cache setup.

First-compile of the SSD graphs costs minutes on a slow host CPU; the cache
makes every subsequent process reuse compiled executables (SURVEY.md §3.5).
Import-and-call from benches/CLIs before the first jit.
"""

from __future__ import annotations

import os

# Repo-local, COMMITTED cache dir. Measured r5: the container filesystem
# resets between rounds (an ~/.cache dir created at 08:27 held only
# same-day entries), so every driver bench session recompiled everything
# through the remote compile service (PALLAS_AXON_REMOTE_COMPILE) — the
# bs=1 bf16 serving program alone took >10 min of remote compile in a
# loaded session, which is exactly the four-rounds-running p50 null
# (VERDICT r4 missing #1). Only git survives the reset, so the cache
# lives in the repo: entries are keyed by HLO+jax-version+flags and
# simply miss (recompile, re-persist) if the environment ever changes.
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks", "xla_cache",
)


def enable_compilation_cache(
    directory: str | None = None, scoped_vmem_kib: int | None = 65536
) -> None:
    # Measured on v5e-1: 64 MiB scoped VMEM is +3.5% on the bs=64 SSD-300
    # int8 pipeline (21.3 -> 20.6 ms) but a bs=1 latency REGRESSION
    # (1.22 -> 2.98 ms); 128 MiB regresses everywhere. Throughput paths
    # keep the 64 MiB default; latency-sensitive callers pass None.
    # Must be set before TPU backend init, which is why it lives in this
    # bootstrap that every bench/CLI calls first.
    if scoped_vmem_kib is not None:
        os.environ.setdefault(
            "LIBTPU_INIT_ARGS",
            f"--xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}",
        )

    import jax

    cache_dir = directory or os.environ.get("ODT_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
