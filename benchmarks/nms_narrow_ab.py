"""A/B: per-class NMS candidate narrowing (EvalConfig.nms_class_top_k).

Interleaved ABAB on the full int8 uint8->detections pipeline (the headline
program), per preset. The kernel's per-emit cost is linear in row width;
narrowing trades one (R, M) row-parallel top-k sort for a 2-4x narrower
suppression loop. Dense random-weight inputs are the WORST case for the
kernel (every candidate active) and the worst case for narrowing value,
so a win here is a lower bound on the trained-model win.

    python benchmarks/nms_narrow_ab.py ssd512_resnet50_coco 64 "0,256,128"
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.headline import _setup  # noqa: E402
from benchmarks.timing import timed  # noqa: E402
from object_detector_tpu.ops import augment as aug_ops  # noqa: E402
from object_detector_tpu.ops.postprocess import postprocess  # noqa: E402
from object_detector_tpu.quant import engine as qengine  # noqa: E402


def build_infer(preset: str, bs: int, class_top_k: int):
    cfg, model, variables, anchors, images = _setup(preset, bs)
    cfg = cfg.override({"eval.nms_class_top_k": class_top_k})
    on_tpu = jax.default_backend() == "tpu"
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        qp, spec = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    @jax.jit
    def infer(q, x_u8):
        imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        cls, box = forward(q, spec, cfg, imgs)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    return infer, qp, images


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd512_resnet50_coco"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ks = [int(k) for k in (sys.argv[3] if len(sys.argv) > 3 else "0,256,128").split(",")]
    arms = {}
    for k in ks:
        arms[k] = build_infer(preset, bs, k)
    # Interleaved rounds so drift can't masquerade as a win.
    results: dict[int, list[float]] = {k: [] for k in ks}
    for rnd in range(4):
        for k in ks:
            infer, qp, images = arms[k]
            dt = timed(infer, qp, images, iters=15, warmup=2 if rnd == 0 else 1)
            results[k].append(bs / dt)
    print(f"preset={preset} bs={bs}")
    base = sorted(results[ks[0]])[len(results[ks[0]]) // 2]
    for k in ks:
        med = sorted(results[k])[len(results[k]) // 2]
        print(
            f"  class_top_k={k:4d}: {med:8.1f} img/s  ({med / base:6.4f}x)  "
            f"rounds={[f'{r:.0f}' for r in results[k]]}"
        )


if __name__ == "__main__":
    main()
