"""Latency-path guard (VERDICT r1 weak #8 / item 10).

The 64 MiB scoped-VMEM libtpu flag is a throughput-only tuning: it measured
+3.5% on the bs=64 SSD-300 pipeline but REGRESSED bs=1 latency 1.22->2.98 ms
(core/cache.py). The flag is process-wide (LIBTPU_INIT_ARGS before backend
init), so the protection is structural: latency entrypoints must boot with
the default VMEM config. These tests fail if that contract drifts.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cache_env_after(call: str) -> str:
    """Run enable_compilation_cache variant in a clean subprocess; return
    the resulting LIBTPU_INIT_ARGS."""
    code = (
        "import os\n"
        "os.environ.pop('LIBTPU_INIT_ARGS', None)\n"
        f"from object_detector_tpu.core.cache import enable_compilation_cache\n"
        f"enable_compilation_cache({call})\n"
        "print(repr(os.environ.get('LIBTPU_INIT_ARGS', '')))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


def test_latency_config_does_not_set_scoped_vmem():
    assert "scoped_vmem" not in _cache_env_after("scoped_vmem_kib=None")


def test_throughput_default_sets_scoped_vmem():
    assert "xla_tpu_scoped_vmem_limit_kib=65536" in _cache_env_after("")


def test_latency_bench_boots_with_default_vmem():
    """latency_bench.py must opt out of the scoped-VMEM flag at its
    bootstrap (before any jit) — source-level contract check."""
    src = open(os.path.join(REPO, "benchmarks", "latency_bench.py")).read()
    boot = src.split("def main", 1)[0]
    assert "enable_compilation_cache(scoped_vmem_kib=None)" in boot


def test_headline_bench_measures_latency_out_of_process():
    """bench.py runs under the throughput flag; its latency number must
    come from a subprocess with LIBTPU_INIT_ARGS scrubbed."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "latency_bench.py" in src
    assert "LIBTPU_INIT_ARGS" in src  # env scrub present
