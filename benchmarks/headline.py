"""One source of truth for every published performance number (VERDICT r2
item #8): benches all README table rows in one session and writes
benchmarks/headline_results.json. README/ARCHITECTURE numbers regenerate
from that file — never hand-edit them.

    python benchmarks/headline.py                 # all rows (slow: many compiles)
    python benchmarks/headline.py --only ssd300_int8,ssd300_int8_stem_off
    python benchmarks/headline.py --update-json   # merge rows into the committed JSON

Latency (bs=1, default-VMEM) runs FIRST in a clean subprocess — the scoped
VMEM throughput flag this process boots with is process-wide and
latency-hostile (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
RESULTS_PATH = os.path.join(HERE, "headline_results.json")


def _measure_latency() -> dict:
    env = {k: v for k, v in os.environ.items() if k != "LIBTPU_INIT_ARGS"}
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "latency_bench.py"), "--json"],
        capture_output=True, text=True, timeout=540, env=env,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "p50_latency_ms_bs1" in d:
            return d
    print(f"[headline] latency failed; stderr:\n{out.stderr[-1500:]}", file=sys.stderr)
    return {"p50_latency_ms_bs1": None}


def _setup(preset: str, bs: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_detector_tpu.anchors.priors import anchors_for_model
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.retinanet import build_model

    cfg = get_config(preset)
    s = cfg.model.image_size
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    return cfg, model, variables, anchors, images


def _bench_int8(preset: str, bs: int, fused_stem=None, iters: int = 30) -> float:
    """img/s for the full int8 uint8->detections pipeline of any family."""
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import timed
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess
    from object_detector_tpu.quant import engine as qengine

    cfg, model, variables, anchors, images = _setup(preset, bs)
    on_tpu = jax.default_backend() == "tpu"
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        spec = (
            qengine.build_spec(cfg, fused_stem=fused_stem)
            if cfg.model.backbone == "vgg16"
            else None
        )
        qp, spec = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"), spec=spec,
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    # Honor the config's postprocess path (per_level_heads) so a default
    # flip reaches this headline number — the r2 verdict's bench-drift
    # lesson (the int8 FPN check mirrors evaluator.make_int8_predict_fn).
    int8_fpn = (
        cfg.model.family != "retinanet" or "fpn/lateral3" in qp.w_int8
    )
    per_level = cfg.eval.per_level_heads and on_tpu and int8_fpn
    if per_level:
        from object_detector_tpu.ops.postprocess import postprocess_levels

        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            lvl_cls, lvl_box = forward(q, spec, cfg, imgs, concat_heads=False)
            det = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
            return det.boxes, det.scores, det.classes, det.valid

    else:
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
            return det.boxes, det.scores, det.classes, det.valid

    dt = timed(infer, qp, images, iters=iters)
    return bs / dt


def _bench_bf16(preset: str, bs: int, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import timed
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg, model, variables, anchors, images = _setup(preset, bs)
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def infer(v, x_u8):
        imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        cls, box = model.apply(v, imgs, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    dt = timed(infer, variables, images, iters=iters)
    return bs / dt


def _bench_train(bs: int = 32, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.timing import timed
    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.train.loop import init_model_state
    from object_detector_tpu.train.step import make_train_step

    cfg = get_config("ssd300_vgg16_voc").override({"train.batch_size": bs})
    s, m = cfg.model.image_size, cfg.data.max_boxes
    model, state = init_model_state(cfg, jax.random.key(0))
    step_fn = make_train_step(
        cfg, model, ssd_anchors(cfg.anchors, s), mesh=None, augment=True
    )
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

    class Stepper:  # the step donates state; re-feed the returned one
        def __init__(self, st):
            self.state = st

        def __call__(self, b, k):
            self.state, metrics = step_fn(self.state, b, k)
            return metrics["loss"]

    stepper = Stepper(state)
    dt = timed(stepper, batch, key, iters=iters)
    return bs / dt


ROWS = {
    "ssd300_int8": lambda: _bench_int8("ssd300_infer_bs64", 64),
    "ssd300_int8_stem_off": lambda: _bench_int8(
        "ssd300_infer_bs64", 64, fused_stem=False
    ),
    "ssd300_bf16": lambda: _bench_bf16("ssd300_infer_bs64", 64),
    "ssd512_int8": lambda: _bench_int8("ssd512_resnet50_coco", 64),
    "ssd512_bf16": lambda: _bench_bf16("ssd512_resnet50_coco", 32),
    # bs=64 beats bs=32 by 4.8% (1268.9 vs 1210.9 img/s, r4 A/B in
    # chip_logs/retinanet_bs64_ab.log); BASELINE config #5 does not pin
    # the batch, so the throughput row measures the faster config.
    "retinanet_int8": lambda: _bench_int8("retinanet_fpn_coco", 64),
    "retinanet_bf16": lambda: _bench_bf16("retinanet_fpn_coco", 32),
    "train_ssd300_bs32": lambda: _bench_train(32),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--only", help="comma-separated row names (default: all)")
    p.add_argument("--skip-latency", action="store_true")
    p.add_argument(
        "--update-json", action="store_true",
        help="merge results into the committed headline_results.json",
    )
    args = p.parse_args()
    names = args.only.split(",") if args.only else list(ROWS)
    unknown = set(names) - set(ROWS)
    if unknown:
        raise SystemExit(f"unknown rows {sorted(unknown)}; have {sorted(ROWS)}")

    results: dict = {}
    if not args.skip_latency:
        results.update(_measure_latency())

    from object_detector_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    results["backend"] = jax.default_backend()
    for name in names:
        t0 = time.time()
        results[name] = round(ROWS[name](), 1)
        print(
            f"{name:22s} {results[name]:8.1f} img/s   ({time.time()-t0:.0f}s)",
            flush=True,
        )

    print(json.dumps(results))
    if args.update_json:
        old = {}
        if os.path.exists(RESULTS_PATH):
            with open(RESULTS_PATH) as f:
                old = json.load(f)
        old.update(results)
        old["generated_by"] = "benchmarks/headline.py"
        old["date"] = time.strftime("%Y-%m-%d")
        with open(RESULTS_PATH, "w") as f:
            json.dump(old, f, indent=1, sort_keys=True)
        print(f"updated {RESULTS_PATH}")


if __name__ == "__main__":
    main()
