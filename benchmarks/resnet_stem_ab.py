"""Same-session A/B: ResNet 7x7/s2 stem as direct strided int8 conv vs
the space-to-depth phase-packed conv (engine._conv_s2d, bit-exact).

Full SSD-512/COCO int8 uint8->detections pipeline at bs=64, interleaved
ABAB so tunnel drift cancels; on-chip bit-exact parity asserted first
(the s2d rewrite reorders int32 MACs, so outputs must be identical).

Priced lever: the stem is 39.4 GMAC at bs=64 (0.24 ms at 325 TOP/s) but
Cin=3 + stride-2 underfill the MXU in the direct emitter; s2d makes it a
dense 4x4/s1 Cin=12 conv. Also applies to RetinaNet (same trunk spec).

Usage: python benchmarks/resnet_stem_ab.py [preset] [bs] [rounds]
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
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd512_resnet50_coco"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = get_config(preset)
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"

    from object_detector_tpu.models.retinanet import build_model

    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
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

    def with_stem_algo(algo):
        return [
            dataclasses.replace(op, algo=algo)
            if isinstance(op, qengine.ConvOp) and op.path.endswith("stem_conv")
            else op
            for op in spec
        ]

    spec_a = with_stem_algo("direct")
    spec_b = with_stem_algo("s2d")
    qp = jax.device_put(qp)

    def make_infer(sp):
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, sp, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
            return det.boxes, det.scores, det.classes, det.valid

        return infer

    infer_a = make_infer(spec_a)
    infer_b = make_infer(spec_b)

    # Parity first (bit-exact: same int32 MACs).
    out_a = jax.device_get(infer_a(qp, images[:8]))
    out_b = jax.device_get(infer_b(qp, images[:8]))
    for xa, xb in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    print("parity: direct == s2d (bit-exact, on-chip)", flush=True)

    iters = 20
    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=iters)
        dt_b = timed(infer_b, qp, images, iters=iters)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"round {r}: direct={bs/dt_a:8.1f} img/s   s2d={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma = float(np.median(med_a))
    mb = float(np.median(med_b))
    print(f"median: direct={ma:.1f} s2d={mb:.1f} img/s (s2d speedup = {mb/ma:.4f}x)")


if __name__ == "__main__":
    main()
