"""Training-step throughput: SSD-300 VOC config, single chip.

Measures the full jitted step (on-device augmentation -> matching ->
forward -> focal/smooth-L1 -> backward -> SGD update) — BASELINE config #4
is this step data-parallel over 8 chips; per-chip throughput is the
scaling unit (gradient all-reduce is the only collective).
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_T0 = time.monotonic()


def _mark(what: str) -> None:
    print(f"[train +{time.monotonic() - _T0:.0f}s] {what}",
          file=sys.stderr, flush=True)


def _aot_run(iters: int, emit) -> bool:
    """AOT fast path for the default bs=32 step (see benchmarks/aot.py:
    tracing the train step under axon pays the per-op tunnel chatter
    stall; the committed export + CPU-init donor skips it). Returns True
    if it produced the metric; False -> caller runs the legacy path."""
    from benchmarks import aot
    from benchmarks.timing import timed

    if not aot.have("train32_flat"):
        _mark("aot: no artifact")
        return False
    npz = "/tmp/odt_train_state.npz"
    helper = None
    if not os.path.exists(npz):
        helper = subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "aot_params.py"),
             "train32", npz],
            stdout=subprocess.DEVNULL,
        )
        _mark("aot: state helper spawned")
    call = jax.jit(aot.load("train32_flat").call)
    if helper is not None and helper.wait(timeout=420) != 0:
        _mark("aot: state helper failed")
        return False
    data = np.load(npz)
    n_state = len(data.files)
    state_leaves = [
        jax.device_put(data[f"leaf{i}"]) for i in range(n_state)
    ]
    _mark(f"aot: {n_state} state leaves on device")
    bs, s, m = 32, 300, None
    from object_detector_tpu.core.config import get_config

    cfg = get_config("ssd300_vgg16_voc")
    m = cfg.data.max_boxes
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)
        ),
        "boxes": jnp.asarray(
            np.tile(np.array([[0.2, 0.2, 0.6, 0.6], [0.5, 0.1, 0.9, 0.4]],
                             np.float32)[None], (bs, m // 2, 1))[:, :m]
        ),
        "labels": jnp.ones((bs, m), jnp.int32),
        "valid": jnp.asarray(np.tile(np.arange(m) < 4, (bs, 1))),
    }
    batch_leaves = jax.tree_util.tree_leaves(batch)
    key_data = jnp.asarray(np.array([0, 1], np.uint32))  # PRNGKey(1)

    class Stepper:
        def __init__(self, leaves):
            self.leaves = leaves

        def __call__(self, b_leaves, kd):
            out = call(*self.leaves, *b_leaves, kd)
            self.leaves = list(out[:n_state])
            return out[n_state]  # first metric leaf (fence target)

    stepper = Stepper(state_leaves)
    import json

    dt0 = timed(stepper, batch_leaves, key_data, iters=4)
    emit({
        "train_images_per_sec_chip": round(bs / dt0, 1),
        "train_step_ms": round(dt0 * 1e3, 2),
        "train_batch_size": bs,
        "train_window": "aot-preliminary-4it",
    })
    dt = timed(stepper, batch_leaves, key_data, iters=iters)
    emit({
        "train_images_per_sec_chip": round(bs / dt, 1),
        "train_step_ms": round(dt * 1e3, 2),
        "train_batch_size": bs,
        "train_window": f"aot-final-{iters}it",
    })
    _mark("aot: measured")
    return True

from benchmarks.timing import timed
from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import get_config
from object_detector_tpu.train.loop import init_model_state
from object_detector_tpu.train.step import make_train_step


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("bs", nargs="?", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON line (bench.py)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of the step and "
                         "print the per-op device cost map")
    ap.add_argument("--pack-block1", action="store_true",
                    help="image-pair packed VGG block-1 (A/B arm)")
    ap.add_argument("--remat-block1", action="store_true",
                    help="rematerialize VGG block-1 in the backward (A/B arm)")
    args = ap.parse_args()
    if args.json:
        # Liveness marker (see bench.py): client is up, not wedged.
        print(json.dumps({"train_stage_backend": jax.default_backend()}),
              flush=True)

    def emit(d):
        print(json.dumps(d), flush=True)

    if (args.json and jax.default_backend() == "tpu" and args.bs == 32
            and not (args.pack_block1 or args.remat_block1 or args.profile)):
        try:
            if _aot_run(args.iters, emit):
                return
        except Exception as e:
            _mark(f"aot: failed ({type(e).__name__}: {e}); legacy path")
    cfg = get_config("ssd300_vgg16_voc")
    bs = args.bs
    cfg = cfg.override({"train.batch_size": bs})
    if args.pack_block1:
        cfg = cfg.override({"model.pack_block1": True})
    if args.remat_block1:
        cfg = cfg.override({"model.remat_block1": True})
    s = cfg.model.image_size
    m = cfg.data.max_boxes

    model, state = init_model_state(cfg, jax.random.key(0))
    anchors = ssd_anchors(cfg.anchors, s)
    step_fn = make_train_step(cfg, model, anchors, mesh=None, augment=True)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)),
        "boxes": jnp.asarray(
            np.tile(np.array([[0.2, 0.2, 0.6, 0.6], [0.5, 0.1, 0.9, 0.4]],
                             np.float32)[None], (bs, m // 2, 1))[:, :m]
        ),
        "labels": jnp.ones((bs, m), jnp.int32),
        "valid": jnp.asarray(np.tile(np.arange(m) < 4, (bs, 1))),
    }
    key = jax.random.key(1)

    # NOTE: the step donates its input state; wrap so timing re-feeds the
    # returned state (steady-state training behavior).
    class Stepper:
        def __init__(self, st):
            self.state = st

        def __call__(self, b, k):
            self.state, metrics = step_fn(self.state, b, k)
            return metrics["loss"]

    stepper = Stepper(state)
    if args.profile:
        from benchmarks.profile_int8 import report

        trace_dir = "/tmp/odt_train_trace"
        loss = stepper(batch, key)  # warmup compile
        jax.block_until_ready(loss)
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                loss = stepper(batch, key)
            np.asarray(jax.device_get(loss))  # tunnel fence
        report(trace_dir, top=40)
        return
    # Incremental-emit contract (VERDICT r4 missing #1): the compile is the
    # expensive part (>540 s cold); emit a preliminary throughput line from
    # a short first window so a deadline kill mid-refinement still lands
    # `train_images_per_sec_chip` in the driver record, then refine.
    if args.json:
        dt0 = timed(stepper, batch, key, iters=4)
        print(json.dumps({
            "train_images_per_sec_chip": round(bs / dt0, 1),
            "train_step_ms": round(dt0 * 1e3, 2),
            "train_batch_size": bs,
            "train_window": "preliminary-4it",
        }), flush=True)
    dt = timed(stepper, batch, key, iters=args.iters)
    if args.json:
        print(json.dumps({
            "train_images_per_sec_chip": round(bs / dt, 1),
            "train_step_ms": round(dt * 1e3, 2),
            "train_batch_size": bs,
            "train_window": f"final-{args.iters}it",
        }), flush=True)
    else:
        print(f"train step bs={bs}: {dt*1e3:.2f} ms  {bs/dt:.1f} img/s/chip")


if __name__ == "__main__":
    main()
