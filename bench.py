"""Driver benchmark orchestrator — headline FIRST, incremental superset JSON.

The round-3 postmortem (VERDICT r3 "What's weak" #1): the old bench.py ran
a 540 s latency subprocess, a 120 s backend probe, and a 540 s train
subprocess BEFORE measuring the headline, and printed everything as ONE
JSON line at the very end — so any overrun anywhere starved the headline
and the driver recorded null. This rewrite inverts the contract:

  * This process NEVER imports jax. Every metric is measured in its own
    bounded subprocess that owns the (single, tunneled) chip exclusively
    for its lifetime — the r2 two-live-clients deadlock cannot recur, and
    a wedged axon tunnel shows up as a stage deadline, not a parent hang.
  * Stage order: headline (benchmarks/headline_stage.py) -> p50 latency
    (benchmarks/latency_bench.py, default-VMEM) -> train throughput
    (benchmarks/train_bench.py). The headline stage itself prints its
    primary record the moment it is measured.
  * Subprocess stdout is streamed line-by-line; every JSON line is merged
    into one cumulative record and the FULL record is re-printed
    (flushed) immediately. The driver's last-parsed-line therefore always
    holds the best-known superset, no matter when it kills us.
  * Deadlines come from a global wall-clock budget (ODT_BENCH_BUDGET_S,
    default 2700 s) with per-stage caps; a stage whose remaining budget is
    too short is skipped with an explicit reason in the record.

An all-null record is printed at t=0 so even a total hang leaves the
driver a parseable, honestly-null line.

Verification contract (VERDICT r3 next #1): cold cache —
    ODT_JAX_CACHE=$(mktemp -d) timeout 900 python bench.py
must emit a parsed headline line. See benchmarks/chip_logs/bench_cold.log.
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import sys
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_T0 = time.monotonic()


def _budget() -> float:
    return float(os.environ.get("ODT_BENCH_BUDGET_S", "2700"))


def _remaining() -> float:
    return _budget() - (time.monotonic() - _T0)


class Record:
    """Cumulative result record; re-printed in full after every merge."""

    def __init__(self) -> None:
        self.data: dict = {
            "metric": "ssd300_inference_images_per_sec_per_chip",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "p50_latency_ms_bs1": None,
            "train_images_per_sec_chip": None,
        }

    def merge(self, d: dict) -> None:
        self.data.update(d)
        self.emit()

    def emit(self) -> None:
        print(json.dumps(self.data), flush=True)


def _run_stage(name: str, cmd: list[str], env: dict, deadline_s: float,
               record: Record) -> tuple[str, float]:
    """Run one stage subprocess, streaming its stdout. Every JSON line is
    merged into the record (and the record re-printed) as it arrives, so a
    driver kill mid-stage keeps all earlier lines. stderr passes through.

    Returns ("ok"|"killed"|"wedged", elapsed_s). Every stage prints a liveness
    JSON marker right after its TPU client comes up; no stdout within
    ODT_BENCH_INIT_S means the init is BLOCKED on a stale axon-pool claim
    (a SIGKILLed TPU client wedges subsequent inits for ~10-15 min —
    measured this session). A wedged stage is killed early — harmless,
    its claim was never granted — and the caller may retry ("wedged").
    A post-liveness deadline kill ("killed") DOES leave a stale claim, so
    the caller must skip the remaining chip stages instead of feeding
    them into the wedge."""
    init_deadline = float(os.environ.get("ODT_BENCH_INIT_S", "420"))
    print(f"[bench] stage {name}: deadline {deadline_s:.0f}s "
          f"(elapsed {time.monotonic() - _T0:.0f}s)", file=sys.stderr)
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=None, text=True, env=env,
    )
    lines: queue.Queue = queue.Queue()

    def _reader() -> None:
        assert proc.stdout is not None
        for line in proc.stdout:
            lines.put(line)
        lines.put(None)

    threading.Thread(target=_reader, daemon=True).start()
    start = time.monotonic()
    end = start + deadline_s
    saw_output = False
    status = "ok"
    while True:
        now = time.monotonic()
        if not saw_output and now - start >= init_deadline:
            status = "wedged"
            break
        wait = min(1.0, max(0.05, end - now))
        try:
            line = lines.get(timeout=wait)
        except queue.Empty:
            if time.monotonic() >= end:
                status = "killed"
                break
            continue
        if line is None:
            break
        saw_output = True
        try:
            d = json.loads(line)
        except ValueError:
            continue  # human-readable progress line
        if isinstance(d, dict):
            record.merge(d)
    if status != "ok":
        proc.kill()
        took = time.monotonic() - start
        why = ("no output (init blocked — wedged tunnel?)"
               if status == "wedged" else "deadline")
        print(f"[bench] stage {name} KILLED after {took:.0f}s: {why}",
              file=sys.stderr)
        record.merge({f"{name}_error": f"{why} after {took:.0f}s"})
    rc = proc.wait()
    if rc not in (0, -9) and status == "ok":
        print(f"[bench] stage {name} exited rc={rc}", file=sys.stderr)
        record.merge({f"{name}_error": f"rc={rc}"})
    return status, time.monotonic() - start


def _stage_script(name: str, default: str) -> str:
    """Stage script path, overridable via ODT_BENCH_STAGE_<NAME> so the
    orchestration logic (deadlines, claim-wait, merge) is testable with
    stub stages (tests/test_bench_orchestrator.py)."""
    return os.environ.get(
        f"ODT_BENCH_STAGE_{name.upper()}",
        os.path.join(_HERE, "benchmarks", default),
    )


def main() -> None:
    record = Record()
    record.emit()  # t=0 honest-null line: a total hang still parses

    # Stage subprocesses choose their own LIBTPU_INIT_ARGS (scoped-VMEM for
    # throughput, default for latency) — never inherit the parent's.
    env = {k: v for k, v in os.environ.items() if k != "LIBTPU_INIT_ARGS"}
    py = sys.executable

    # 1) Headline — gets the lion's share; must fit the driver's budget
    #    even cold (compile cache empty; compiles are terminal-side under
    #    PALLAS_AXON_REMOTE_COMPILE). 840 s cap keeps the cold-verify
    #    contract (timeout 900) with margin.
    #
    #    Retry once on timeout: the driver kills the session's processes
    #    right before running bench.py, and a SIGKILLed TPU client leaves
    #    the axon pool holding its claim for ~10-15 min — during which
    #    every new client init BLOCKS. A first attempt that dies with no
    #    output is the wedge signature (measured this session); by the
    #    second attempt the stale claim has usually expired.
    headline_cap = float(os.environ.get("ODT_BENCH_HEADLINE_S", "840"))
    t_headline = 0.0
    while True:
        status, t_headline = _run_stage(
            "headline",
            [py, _stage_script("headline", "headline_stage.py")],
            env, min(headline_cap, max(_remaining(), 60.0)), record,
        )
        if (record.data.get("value") is not None or status != "wedged"
                or _remaining() < 180):
            break
        print("[bench] headline init was wedged; retrying", file=sys.stderr)

    backend = record.data.get("backend")
    tunnel_ok = status != "killed"  # "wedged" kills grant no claim

    # Session-speed calibration (VERDICT r4 weak #3): the r4 driver session
    # ran 2.2x slower than the cold verify and the fixed 600 s latency cap
    # blew. Headline duration is a free in-band measurement of this
    # session's real speed — scale later-stage caps by it.
    lat_cap = max(float(os.environ.get("ODT_BENCH_LAT_S", "600")),
                  2.5 * t_headline)
    train_cap = max(float(os.environ.get("ODT_BENCH_TRAIN_S", "1500")),
                    3.0 * t_headline)

    def _wait_out_claim(stage: str) -> bool:
        """After a post-liveness deadline kill, the axon pool holds the dead
        client's claim ~10-15 min (measured r3). If the remaining budget
        covers waiting that window out PLUS a useful stage run, sleep it off
        and continue instead of skipping (VERDICT r4 weak #2 — one slow
        stage cost two metrics). Returns True if the tunnel can be trusted
        again."""
        claim_s = float(os.environ.get("ODT_BENCH_CLAIM_S", "900"))
        stage_min = float(os.environ.get("ODT_BENCH_STAGE_MIN_S", "240"))
        if _remaining() < claim_s + stage_min:
            return False
        print(f"[bench] waiting {claim_s:.0f}s for stale claim to expire "
              f"before {stage} (remaining {_remaining():.0f}s)",
              file=sys.stderr)
        record.merge({f"{stage}_claim_wait_s": claim_s})
        time.sleep(claim_s)
        return True

    # 2) p50 bs=1 latency (default-VMEM subprocess). latency_bench.py
    #    self-skips fast on non-TPU backends.
    if not tunnel_ok:
        tunnel_ok = _wait_out_claim("latency")
        if not tunnel_ok:
            record.merge({"latency_skipped": "tunnel suspect after stage kill"})
    if tunnel_ok:
        if _remaining() < 90:
            record.merge({"latency_skipped": "bench budget exhausted"})
        else:
            st, _ = _run_stage(
                "latency",
                [py, _stage_script("latency", "latency_bench.py"), "--json"],
                env, min(lat_cap, _remaining()), record,
            )
            tunnel_ok = st != "killed"

    # 3) Train-step throughput. Cold-compile of the bs=32 train step is the
    #    most expensive compile in the repo (>540 s cold — TPU_WORK_QUEUE
    #    pricing), so it goes LAST and gets whatever budget is left, capped.
    if not tunnel_ok:
        tunnel_ok = _wait_out_claim("train")
        if not tunnel_ok:
            record.merge({"train_skipped": "tunnel suspect after stage kill"})
    if tunnel_ok:
        if backend != "tpu":
            # bs=32 at 300px is minutes/step on CPU — only measure on TPU.
            record.merge({"train_skipped": f"backend={backend!r} (not tpu)"})
        elif _remaining() < 180:
            record.merge({"train_skipped": "bench budget exhausted"})
        else:
            _run_stage(
                "train",
                [py, _stage_script("train", "train_bench.py"),
                 "32", "--iters", "12", "--json"],
                env, min(train_cap, _remaining()), record,
            )

    record.emit()  # final line == complete best-known record


if __name__ == "__main__":
    main()
