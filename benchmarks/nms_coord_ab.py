"""A/B: bf16 NMS coordinate planes (EvalConfig.nms_coord_bf16) on the
full int8 uint8->detections pipeline, interleaved ABAB per preset.

The suppression kernel's per-emit cost is ~20 elementwise ops on
(256, M) coordinate planes; the VPU packs 2 bf16 per f32 ALU slot, so
the dense worst case (random weights — every candidate active) bounds
the win from below. Detection-score parity is asserted first (ordering
and output scores stay f32-exact; only near-threshold suppression
decisions may flip).

Usage: python benchmarks/nms_coord_ab.py [preset[,preset...]] [rounds]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.headline import _setup
from benchmarks.timing import timed
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine

DEFAULT_BS = {"ssd300_infer_bs64": 64, "ssd512_resnet50_coco": 64,
              "retinanet_fpn_coco": 32}


def bench_preset(preset: str, rounds: int) -> None:
    bs = DEFAULT_BS.get(preset, 64)
    cfg0, model, variables, anchors, images = _setup(preset, bs)
    on_tpu = jax.default_backend() == "tpu"
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg0.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg0, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        qp, spec = qengine.quantize_ssd(
            cfg0, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    def make_infer(cfg):
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
            return det.boxes, det.scores, det.classes, det.valid

        return infer

    cfg_b = cfg0.replace(
        eval=dataclasses.replace(cfg0.eval, nms_coord_bf16=True)
    )
    infer_a = make_infer(cfg0)
    infer_b = make_infer(cfg_b)

    # Parity probe: detection scores are exact either way; assert the
    # top-50 merged scores agree to f32 rounding (suppression flips on
    # random scenes are ~never within 2^-8 of the threshold).
    sa = np.sort(np.asarray(infer_a(qp, images)[1]).ravel())[::-1][:50]
    sb = np.sort(np.asarray(infer_b(qp, images)[1]).ravel())[::-1][:50]
    match = np.mean(np.isclose(sa, sb, atol=1e-5))
    print(f"[{preset}] parity: top-50 merged scores match {match:.3f}", flush=True)

    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=15)
        dt_b = timed(infer_b, qp, images, iters=15)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"[{preset}] round {r}: f32={bs/dt_a:8.1f}  bf16={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(
        f"[{preset}] median: f32={ma:.1f} bf16-coord={mb:.1f} img/s "
        f"(speedup = {mb/ma:.4f}x)"
    )


def main():
    presets = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["ssd512_resnet50_coco", "ssd300_infer_bs64"]
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for p in presets:
        bench_preset(p, rounds)


if __name__ == "__main__":
    main()
