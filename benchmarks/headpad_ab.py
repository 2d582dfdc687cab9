"""Same-session A/B: lane-padded class-logit slabs
(EvalConfig.cls_pad_lanes) on the full uint8->detections pipeline.

(B, A, C<128) is already 128-lane padded physically on TPU, so padding the
class dim logically changes no HBM bytes — it converts the head-native
(H, W, a*C) -> (A_l, C) unaligned lane permute into aligned block movement
that can fuse into each level's concat DUS (~2.8 ms of retile+concat at
SSD-512/COCO bs=64 — r3 HLO profile). The transform is EXACT (pad value is
the dtype-min max/sigmoid identity and candidates are sliced back after the
gather), so parity is asserted bitwise. Interleaved ABAB per preset so
tunnel drift cancels.

Usage: python benchmarks/headpad_ab.py [preset[,preset...]] [rounds]
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
        eval=dataclasses.replace(cfg0.eval, cls_pad_lanes=True)
    )
    infer_a = make_infer(cfg0)  # unpadded retile
    infer_b = make_infer(cfg_b)  # lane-padded slabs

    out_a = [np.asarray(x) for x in infer_a(qp, images[:8])]
    out_b = [np.asarray(x) for x in infer_b(qp, images[:8])]
    for xa, xb, nm in zip(out_a, out_b, ("boxes", "scores", "classes", "valid")):
        np.testing.assert_array_equal(xa, xb, err_msg=f"{nm} mismatch")
    print(f"[{preset}] parity: outputs bitwise-equal", flush=True)

    iters = 20
    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=iters)
        dt_b = timed(infer_b, qp, images, iters=iters)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"[{preset}] round {r}: plain={bs/dt_a:8.1f}  padded={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(
        f"[{preset}] median: plain={ma:.1f} padded={mb:.1f} img/s "
        f"(padded speedup = {mb/ma:.4f}x)"
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
