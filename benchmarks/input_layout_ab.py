"""Same-session A/B: NHWC vs HWCN serving input staging (bs=64 int8).

HWCN ((S,S,3,B), batch-minor) is free to assemble host-side and lets the
fused-stem producer conv consume the quantized codes without the 0.45 ms
batch-to-lanes relayout (r3 profile, copy.41). Interleaved ABAB timing in
one process so tunnel drift cancels; on-chip bit-exact parity asserted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed
from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine


def main() -> None:
    cfg = get_config("ssd300_infer_bs64")
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)),
                           train=False)
    params = variables["params"]
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)
    images = jnp.asarray(u8)
    images_t = jnp.asarray(np.transpose(u8, (1, 2, 3, 0)))  # host staging
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_ssd(cfg, params, [calib])
    qp = jax.device_put(qp)
    mean = jnp.asarray(aug_ops.IMAGENET_MEAN).reshape(3, 1)
    std = jnp.asarray(aug_ops.IMAGENET_STD).reshape(3, 1)

    @jax.jit
    def infer_nhwc(q, x):
        img = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = qengine.int8_forward(q, spec, cfg, img)
        det = postprocess(cls, box, anchors, cfg, use_pallas=True)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def infer_hwcn(q, x):
        img = (x.astype(jnp.float32) / 255.0 - mean) / std
        cls, box = qengine.int8_forward(q, spec, cfg, img, input_hwcn=True)
        det = postprocess(cls, box, anchors, cfg, use_pallas=True)
        return det.boxes, det.scores, det.classes, det.valid

    for f, x in ((infer_nhwc, images), (infer_hwcn, images_t)):
        jax.block_until_ready(f(qp, x))
        np.asarray(jax.device_get(f(qp, x)[0][:1]))

    a = jax.device_get(infer_nhwc(qp, images))
    b = jax.device_get(infer_hwcn(qp, images_t))
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    print("parity: NHWC == HWCN (bit-exact, on-chip)", flush=True)

    rounds = []
    for r in range(4):
        t_a = timed(infer_nhwc, qp, images, iters=30)
        t_b = timed(infer_hwcn, qp, images_t, iters=30)
        rounds.append((t_a, t_b))
        print(f"round {r}: nhwc={bs/t_a:8.1f} img/s   "
              f"hwcn={bs/t_b:8.1f} img/s", flush=True)
    med_a = float(np.median([x for x, _ in rounds]))
    med_b = float(np.median([y for _, y in rounds]))
    print(f"median: nhwc={bs/med_a:.1f} hwcn={bs/med_b:.1f} img/s "
          f"(hwcn speedup = {med_a/med_b:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
