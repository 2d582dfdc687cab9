"""Orchestration tests for the repo-root bench.py driver channel.

The r4 driver run lost two of the three BASELINE metrics to one slow
stage (VERDICT r4 missing #1 / weak #2): the latency stage blew its fixed
600 s cap and the deadline kill skipped train. These tests pin the fixed
behavior with stub stage scripts (ODT_BENCH_STAGE_* hooks):

  * happy path: all three metrics land in the final merged record;
  * partial-emit: a latency stage killed mid-run still lands the
    p50 line it already streamed;
  * claim-wait: after a post-liveness deadline kill, the orchestrator
    waits out the (stubbed) stale-claim window and still runs train
    instead of skipping it.

No jax import, no chip — pure subprocess orchestration.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _write_stage(tmp_path, name, body):
    p = tmp_path / f"{name}.py"
    p.write_text("import json, sys, time\n" + textwrap.dedent(body))
    return str(p)


def _run_bench(tmp_path, stages, extra_env=None, timeout=120):
    env = dict(os.environ)
    env.update({
        "ODT_BENCH_BUDGET_S": "300",
        "ODT_BENCH_INIT_S": "30",
        "ODT_BENCH_LAT_S": "4",
        "ODT_BENCH_TRAIN_S": "20",
        "ODT_BENCH_CLAIM_S": "1",
        "ODT_BENCH_STAGE_MIN_S": "1",
    })
    for stage, script in stages.items():
        env[f"ODT_BENCH_STAGE_{stage.upper()}"] = script
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, timeout=timeout,
    )
    records = []
    for line in out.stdout.splitlines():
        try:
            records.append(json.loads(line))
        except ValueError:
            pass
    assert records, f"no JSON lines; stderr:\n{out.stderr}"
    return records, out


HEADLINE_OK = """
    print(json.dumps({"backend": "tpu"}), flush=True)
    print(json.dumps({
        "metric": "ssd300_inference_images_per_sec_per_chip",
        "value": 3400.0, "unit": "images/sec/chip",
        "vs_baseline": 0.68, "backend": "tpu",
    }), flush=True)
"""

LATENCY_OK = """
    print(json.dumps({"latency_stage_backend": "tpu"}), flush=True)
    print(json.dumps({"p50_latency_ms_bs1": 1.1,
                      "p50_latency_path": "bf16"}), flush=True)
"""

TRAIN_OK = """
    print(json.dumps({"train_stage_backend": "tpu"}), flush=True)
    print(json.dumps({"train_images_per_sec_chip": 650.0}), flush=True)
"""

# Emits the bf16 p50 (the incremental-emit contract), then hangs past the
# 4 s stubbed latency cap -> post-liveness deadline kill.
LATENCY_PARTIAL_THEN_HANG = """
    print(json.dumps({"latency_stage_backend": "tpu"}), flush=True)
    print(json.dumps({"p50_latency_ms_bs1": 1.2,
                      "p50_latency_path": "bf16"}), flush=True)
    time.sleep(60)
"""


def test_all_three_metrics_land(tmp_path):
    records, _ = _run_bench(tmp_path, {
        "headline": _write_stage(tmp_path, "h", HEADLINE_OK),
        "latency": _write_stage(tmp_path, "l", LATENCY_OK),
        "train": _write_stage(tmp_path, "t", TRAIN_OK),
    })
    final = records[-1]
    assert final["value"] == 3400.0
    assert final["p50_latency_ms_bs1"] == 1.1
    assert final["train_images_per_sec_chip"] == 650.0
    # the t=0 honest-null line exists and parses
    assert records[0]["value"] is None


def test_killed_latency_keeps_partial_and_train_still_runs(tmp_path):
    records, out = _run_bench(tmp_path, {
        "headline": _write_stage(tmp_path, "h", HEADLINE_OK),
        "latency": _write_stage(tmp_path, "l", LATENCY_PARTIAL_THEN_HANG),
        "train": _write_stage(tmp_path, "t", TRAIN_OK),
    })
    final = records[-1]
    # the streamed partial p50 survived the deadline kill
    assert final["p50_latency_ms_bs1"] == 1.2
    assert "deadline" in final.get("latency_error", "")
    # claim-wait branch fired and train STILL ran (r4 lost it here)
    assert final.get("train_claim_wait_s") == 1.0
    assert final["train_images_per_sec_chip"] == 650.0
    assert "train_skipped" not in final


def test_claim_wait_refused_when_budget_exhausted(tmp_path):
    records, _ = _run_bench(
        tmp_path,
        {
            "headline": _write_stage(tmp_path, "h", HEADLINE_OK),
            "latency": _write_stage(tmp_path, "l", LATENCY_PARTIAL_THEN_HANG),
            "train": _write_stage(tmp_path, "t", TRAIN_OK),
        },
        # claim window larger than the whole budget -> must NOT sleep; must
        # skip train with the honest reason instead of overrunning.
        extra_env={"ODT_BENCH_CLAIM_S": "600"},
    )
    final = records[-1]
    assert final["p50_latency_ms_bs1"] == 1.2
    assert final.get("train_skipped") == "tunnel suspect after stage kill"
    assert final["train_images_per_sec_chip"] is None
