"""A/B: image-pair channel packing of the ResNet stem + stage-1
(PackImagesOp / ConvOp.img_pack) vs the plain spec, on the full int8
uint8->detections pipeline.

Why: the sub-128-channel section underfills the MXU — isolated
signatures measured 1.35x (7x7 stem), 2.4x (1x1 64ch), 1.42x (3x3 64ch)
faster packed (chip_logs/resnet_conv_ab.log). Packing is bit-exact
(block-diag kernels, tiled dequant vectors) and costs one channel-concat
at the input plus one batch-concat after stage 1.

One shared QuantParams (_expand_spec strips packing before calibration/
quantization); interleaved ABAB; bit-exact parity asserted on-chip first.

Usage: python benchmarks/resnet_pack_ab.py [preset] [bs] [rounds]
        preset in {ssd512_resnet50_coco, retinanet_fpn_coco}
"""

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


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd512_resnet50_coco"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else (
        32 if "retinanet" in preset else 64
    )
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg, model, variables, anchors, images = _setup(preset, bs)
    on_tpu = jax.default_backend() == "tpu"
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    retina = cfg.model.family == "retinanet"

    if retina:
        qp, _ = qengine.quantize_retinanet(cfg, variables, [calib])
        spec_a = qengine.build_resnet_trunk_spec(img_pack=False)
        spec_b = qengine.build_resnet_trunk_spec(img_pack=True)
        forward = qengine.retinanet_int8_forward
    else:
        spec_a = qengine.build_resnet_ssd_spec(cfg, img_pack=False)
        spec_b = qengine.build_resnet_ssd_spec(cfg, img_pack=True)
        qp, _ = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"), spec=spec_a,
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    def make_infer(spec):
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
            return det.boxes, det.scores, det.classes, det.valid

        return infer

    infer_a = make_infer(spec_a)
    infer_b = make_infer(spec_b)

    out_a = [np.asarray(t) for t in infer_a(qp, images)]
    out_b = [np.asarray(t) for t in infer_b(qp, images)]
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(a, b)
    print(f"[{preset}] parity: packed == plain, bit-exact", flush=True)

    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=12)
        dt_b = timed(infer_b, qp, images, iters=12)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"[{preset}] round {r}: plain={bs/dt_a:8.1f}  "
            f"packed={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(
        f"[{preset}] median: plain={ma:.1f} packed={mb:.1f} img/s "
        f"(packed speedup = {mb/ma:.4f}x)"
    )


if __name__ == "__main__":
    main()
