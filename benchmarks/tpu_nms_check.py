"""Compiled-mode (real TPU) correctness check: batched Pallas NMS vs the
jnp reference. Interpret-mode tests cover semantics on CPU; this validates
the Mosaic-compiled kernel AND measures the approx_max_k prefilter's
real-world deviation in the production regime (A >> M), where the
class-agnostic + approximate candidate selection is actually active.

Writes benchmarks/tpu_nms_check_results.json (committed as evidence —
VERDICT r1 item 2).
"""

import json
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

RESULTS_PATH = os.path.join(os.path.dirname(__file__), "tpu_nms_check_results.json")


def _det_set(det, i, score_min=0.0):
    v = np.asarray(det.valid[i])
    return {
        (int(c), round(float(s), 4), tuple(np.round(np.asarray(b), 4)))
        for c, s, b in zip(
            np.asarray(det.classes[i])[v],
            np.asarray(det.scores[i])[v],
            np.asarray(det.boxes[i])[v],
        )
        if s >= score_min
    }


def _compare(got, ref, batch, score_min=0.0):
    missing = spurious = total_ref = 0
    for i in range(batch):
        g, r = _det_set(got, i, score_min), _det_set(ref, i, score_min)
        total_ref += len(r)
        missing += len(r - g)
        spurious += len(g - r)
    return dict(
        ref_detections=total_ref, missing=missing, spurious=spurious,
        match_rate=1.0 - missing / max(total_ref, 1),
    )


def case_exact_regime():
    """M >= A: kernel must match the oracle EXACTLY (compiled Mosaic path)."""
    rng = np.random.default_rng(0)
    B, A, C = 4, 512, 6
    boxes = rng.uniform(0, 0.9, (B, A, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., :2] + rng.uniform(0.05, 0.3, (B, A, 2)), 0, 1)
    scores = (rng.uniform(0, 1, (B, A, C)) * (rng.uniform(0, 1, (B, A, C)) > 0.7)).astype(np.float32)

    kw = dict(score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=128,
              max_detections=64)
    got = pallas_per_class_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=False,
        max_per_class=64, **kw
    )
    # Oracle on CPU: its vmapped full-anchor program takes tens of
    # minutes to compile for TPU and proves nothing extra (the kernel
    # under test is the TPU side).
    with jax.default_device(jax.devices("cpu")[0]):
        ref = jax.vmap(lambda b, s: nms_ops.per_class_nms(b, s, **kw))(
            jnp.asarray(boxes), jnp.asarray(scores)
        )
    # Note M = 2*128 = 256 < A = 512 here: approx prefilter ACTIVE. Also run
    # the true exact regime with pre_nms_top_k=256 (M=512=A: no selection).
    kw2 = dict(score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=256,
               max_detections=64)
    got2 = pallas_per_class_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=False,
        max_per_class=64, **kw2
    )
    with jax.default_device(jax.devices("cpu")[0]):
        ref2 = jax.vmap(lambda b, s: nms_ops.per_class_nms(b, s, **kw2))(
            jnp.asarray(boxes), jnp.asarray(scores)
        )
    return {
        "approx_M256_A512": _compare(got, ref, B),
        "exact_M512_A512": _compare(got2, ref2, B),
    }


def case_production_regime():
    """SSD-300 shape: A=8732, C=20, M=512. Trained-ish score profile.

    Three prefilter variants: approx (serving default), exact top_k, and
    the oracle. Detections compared at score >= 0.05 (the levels that
    affect mAP)."""
    rng = np.random.default_rng(1)
    B, A, C = 8, 8732, 20
    boxes = rng.uniform(0, 0.9, (B, A, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., :2] + rng.uniform(0.02, 0.25, (B, A, 2)), 0, 1)
    # trained-ish: background sigmoid ~0.002, ~40 objects/image
    logits = rng.normal(-6.0, 0.7, (B, A, C)).astype(np.float32)
    for b in range(B):
        idx = rng.choice(A, 40, replace=False)
        klass = rng.integers(0, C, 40)
        logits[b, idx, klass] = rng.uniform(1.0, 6.0, 40).astype(np.float32)
    scores = 1.0 / (1.0 + np.exp(-logits))

    kw = dict(score_threshold=0.01, iou_threshold=0.45, pre_nms_top_k=256,
              max_detections=200)
    j_boxes, j_scores = jnp.asarray(boxes), jnp.asarray(scores)
    got_approx = pallas_per_class_nms_batched(
        j_boxes, j_scores, interpret=False, max_per_class=200, **kw)
    got_exact = pallas_per_class_nms_batched(
        j_boxes, j_scores, interpret=False, exact_prefilter=True,
        max_per_class=200, **kw)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = jax.vmap(lambda b, s: nms_ops.per_class_nms(b, s, **kw))(
            jnp.asarray(boxes), jnp.asarray(scores))
    return {
        "approx_vs_oracle_score>=0.05": _compare(got_approx, ref, B, 0.05),
        "exact_vs_oracle_score>=0.05": _compare(got_exact, ref, B, 0.05),
        "approx_vs_oracle_all": _compare(got_approx, ref, B),
        "exact_vs_oracle_all": _compare(got_exact, ref, B),
    }


def main():
    results = {
        "device": str(jax.devices()[0]),
        "small": case_exact_regime(),
        "production_ssd300": case_production_regime(),
    }
    print(json.dumps(results, indent=2))
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)
    ok = (
        results["small"]["exact_M512_A512"]["missing"] == 0
        and results["small"]["exact_M512_A512"]["spurious"] == 0
        and results["production_ssd300"]["exact_vs_oracle_score>=0.05"]["match_rate"] >= 0.999
        and results["production_ssd300"]["approx_vs_oracle_score>=0.05"]["match_rate"] >= 0.99
    )
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
