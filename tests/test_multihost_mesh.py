"""v5e-16 readiness without hardware (VERDICT r1 item 7, BASELINE config #5).

The conftest pins this process to 8 fake devices, so 16-device checks run in
subprocesses with their own device count:

- `dryrun_multichip(16)`: the driver's multi-chip entry at the v5e-16 size.
- DP16 == single-device on the concatenated batch, with the mesh built from
  a synthetic 2-host device layout (devices regrouped into two 8-local-
  device "hosts", mirroring the v5e-16 process partitioning).

Plus in-process tests of the multi-host env contract
(`_multi_process_launch`).
"""

import os
import subprocess
import sys

import pytest

from object_detector_tpu.parallel.mesh import _multi_process_launch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_subprocess(code: str, n_devices: int) -> str:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=540, cwd=REPO, env=env,
    )
    assert out.returncode == 0, f"stderr:\n{out.stderr[-3000:]}"
    return out.stdout


@pytest.mark.slowest
def test_dryrun_multichip_16():
    out = _run_subprocess(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(16)", 16
    )
    assert "dryrun_multichip(16): ok" in out


_DP16_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 16)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.parallel import mesh as mesh_lib
from object_detector_tpu.train.loop import init_model_state
from object_detector_tpu.train.step import make_train_step

cfg = tiny_test_config().override({"train.batch_size": 32})
devices = jax.devices()
assert len(devices) == 16
# Synthetic 2-host layout: first 8 devices are "host 0"'s locals, next 8
# "host 1"'s — the order jax.devices() returns on a real 2-process v5e-16.
two_host = np.asarray(devices).reshape(2, 8).reshape(16)
mesh16 = Mesh(two_host, (cfg.mesh.data_axis,))

model, state0 = init_model_state(cfg, jax.random.key(0))
anchors = ssd_anchors(cfg.anchors, cfg.model.image_size)

rng = np.random.default_rng(0)
b, s, m = cfg.train.batch_size, cfg.model.image_size, cfg.data.max_boxes
batch = {
    "image": rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
    "boxes": rng.uniform(0.1, 0.4, (b, m, 4)).astype(np.float32),
    "labels": rng.integers(1, 3, (b, m)).astype(np.int32),
    "valid": np.tile(np.arange(m) < 3, (b, 1)),
}
batch["boxes"][..., 2:] += 0.3

step16 = make_train_step(cfg, model, anchors, mesh=mesh16, augment=False)
dev_batch = mesh_lib.shard_batch(mesh16, batch, cfg.mesh.data_axis)
s16, m16 = step16(state0, dev_batch, jax.random.key(1))

_, state0b = init_model_state(cfg, jax.random.key(0))
step1 = make_train_step(cfg, model, anchors, mesh=None, augment=False)
s1, m1 = step1(state0b, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.key(1))

loss16 = float(m16["loss"]); loss1 = float(m1["loss"])
assert abs(loss16 - loss1) / max(abs(loss1), 1e-9) < 1e-4, (loss16, loss1)
diffs = jax.tree.map(
    lambda a, b: float(jnp.max(jnp.abs(a - b))), s16.params, s1.params
)
worst = max(jax.tree.leaves(diffs))
assert worst < 2e-5, worst
print(f"DP16_OK loss16={loss16:.6f} loss1={loss1:.6f} max_param_diff={worst:.2e}")
"""


@pytest.mark.slowest
def test_dp16_two_host_layout_matches_single_device():
    out = _run_subprocess(_DP16_SCRIPT, 16)
    assert "DP16_OK" in out


def test_multi_process_launch_contract(monkeypatch):
    for v in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    assert not _multi_process_launch()
    # sitecustomize's single-host injection must NOT trigger init.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not _multi_process_launch()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "worker0,worker1,worker2,worker3")
    assert _multi_process_launch()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert _multi_process_launch()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    assert _multi_process_launch()
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert not _multi_process_launch()
