"""Same-session A/B: f32 vs bf16 int8-head class logits
(EvalConfig.int8_logits_bf16) on the full uint8->detections pipeline.

The (B, A, C) logits tensor is the largest postprocess operand (503 MB
for the 80-class COCO configs at bs=64/32); bf16 halves the head-out
epilogue write + class-max prefilter read + candidate gather. Interleaved
ABAB per preset so tunnel drift cancels; score parity asserted first
(top-20 detection scores within bf16 rounding).

Usage: python benchmarks/logits_ab.py [preset[,preset...]] [rounds]
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

from benchmarks.timing import timed
from object_detector_tpu.anchors.priors import anchors_for_model
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.retinanet import build_model
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine

DEFAULT_BS = {"ssd300_infer_bs64": 64, "ssd512_resnet50_coco": 64,
              "retinanet_fpn_coco": 32}


def bench_preset(preset: str, rounds: int) -> None:
    cfg0 = get_config(preset)
    bs = DEFAULT_BS.get(preset, cfg0.eval.batch_size)
    s = cfg0.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(cfg0)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg0.model.family, cfg0.anchors, cfg0.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
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
        eval=dataclasses.replace(cfg0.eval, int8_logits_bf16=True)
    )
    infer_a = make_infer(cfg0)  # f32 logits
    infer_b = make_infer(cfg_b)  # bf16 logits

    sa = np.sort(np.asarray(infer_a(qp, images[:8])[1]).ravel())[::-1][:20]
    sb = np.sort(np.asarray(infer_b(qp, images[:8])[1]).ravel())[::-1][:20]
    np.testing.assert_allclose(sa, sb, atol=3e-3)
    print(f"[{preset}] parity: top-20 scores within bf16 rounding", flush=True)

    iters = 20
    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=iters)
        dt_b = timed(infer_b, qp, images, iters=iters)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"[{preset}] round {r}: f32={bs/dt_a:8.1f}  bf16={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(
        f"[{preset}] median: f32={ma:.1f} bf16={mb:.1f} img/s "
        f"(bf16 speedup = {mb/ma:.4f}x)"
    )


def main():
    presets = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["ssd512_resnet50_coco", "retinanet_fpn_coco", "ssd300_infer_bs64"]
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for p in presets:
        bench_preset(p, rounds)


if __name__ == "__main__":
    main()
