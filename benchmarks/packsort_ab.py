"""Same-session A/B: variadic top_k vs packed single-key sort in the NMS
prefilter + merge (ops/packsort.py), on the full SSD-300 int8 headline
pipeline at bs=64. Interleaved ABAB rounds so tunnel drift cancels.

The r3 profile prices the two sorts at ~0.9 ms of ~19.5 ms; the packed
key halves the data moved through the sorting network (one int32 array vs
a (f32, s32) variadic pair). Detections are compared set-wise (tie
buckets may swap near-equal candidates — see ops/packsort.py contract).
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
    cfg_packed = cfg.override({"eval.nms_packed_sort": True})
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)),
                           train=False)
    params = variables["params"]
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_ssd(cfg, params, [calib])
    qp = jax.device_put(qp)

    def make(c):
        @jax.jit
        def infer(q, x):
            img = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
            cls, box = qengine.int8_forward(q, spec, c, img)
            det = postprocess(cls, box, anchors, c, use_pallas=True)
            return det.boxes, det.scores, det.classes, det.valid

        return infer

    infer_ref, infer_packed = make(cfg), make(cfg_packed)
    for f in (infer_ref, infer_packed):
        jax.block_until_ready(f(qp, images))
        np.asarray(jax.device_get(f(qp, images)[0][:1]))

    a = jax.device_get(infer_ref(qp, images))
    b = jax.device_get(infer_packed(qp, images))
    # Set-wise per image: (class, score, box) rounded past the tie bucket.
    mism = 0
    for i in range(bs):
        def key(r, i=i):
            v = np.asarray(r[3][i])
            return sorted(
                zip(
                    np.asarray(r[2][i])[v].tolist(),
                    np.round(np.asarray(r[1][i])[v], 3).tolist(),
                    map(tuple, np.round(np.asarray(r[0][i])[v], 3).tolist()),
                )
            )
        mism += key(a) != key(b)
    print(f"parity: {bs - mism}/{bs} images identical at 1e-3 rounding",
          flush=True)

    rounds = []
    for r in range(4):
        t_a = timed(infer_ref, qp, images, iters=30)
        t_b = timed(infer_packed, qp, images, iters=30)
        rounds.append((t_a, t_b))
        print(f"round {r}: topk={bs/t_a:8.1f} img/s   "
              f"packed={bs/t_b:8.1f} img/s", flush=True)
    med_a = float(np.median([x for x, _ in rounds]))
    med_b = float(np.median([y for _, y in rounds]))
    print(f"median: topk={bs/med_a:.1f} packed={bs/med_b:.1f} img/s "
          f"(packed speedup = {med_a/med_b:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
