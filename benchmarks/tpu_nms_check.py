"""Compiled-mode (real TPU) correctness check: batched Pallas NMS vs the
jnp reference. Interpret-mode tests cover semantics on CPU; this validates
the Mosaic-compiled kernel."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.kernels.nms_pallas import pallas_per_class_nms_batched
from object_detector_tpu.ops import nms as nms_ops


def main():
    rng = np.random.default_rng(0)
    B, A, C = 4, 512, 6
    boxes = rng.uniform(0, 0.9, (B, A, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., :2] + rng.uniform(0.05, 0.3, (B, A, 2)), 0, 1)
    scores = (rng.uniform(0, 1, (B, A, C)) * (rng.uniform(0, 1, (B, A, C)) > 0.7)).astype(np.float32)

    kw = dict(score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=128,
              max_detections=64)
    got = pallas_per_class_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=False, **kw
    )
    ref = jax.vmap(lambda b, s: nms_ops.per_class_nms(b, s, **kw))(
        jnp.asarray(boxes), jnp.asarray(scores)
    )
    mismatches = 0
    for i in range(B):
        gv = np.asarray(got.valid[i])
        rv = np.asarray(ref.valid[i])
        g = {(int(c), round(float(s), 4), tuple(np.round(np.asarray(b), 4)))
             for c, s, b in zip(np.asarray(got.classes[i])[gv],
                                 np.asarray(got.scores[i])[gv],
                                 np.asarray(got.boxes[i])[gv])}
        r = {(int(c), round(float(s), 4), tuple(np.round(np.asarray(b), 4)))
             for c, s, b in zip(np.asarray(ref.classes[i])[rv],
                                 np.asarray(ref.scores[i])[rv],
                                 np.asarray(ref.boxes[i])[rv])}
        if g != r:
            mismatches += 1
            print(f"image {i}: got {len(g)} dets, ref {len(r)}; "
                  f"only-got {sorted(g - r)[:4]} only-ref {sorted(r - g)[:4]}")
    print("PASS" if mismatches == 0 else f"FAIL ({mismatches}/{B} images differ)")


if __name__ == "__main__":
    main()
