"""Per-class NMS — XLA-compilable reference implementation.

Greedy hard-NMS with exact semantics, written shape-static so it compiles
under jit: per class, take the top-k scoring anchors, build a (k, k) IoU
matrix once, then run the greedy suppression scan as a `lax.fori_loop` over
score rank (each step is a vectorized row update — no data-dependent
shapes). The Pallas kernel in kernels/nms_pallas.py is the fast path
(SURVEY.md §7 step 6); this module is the correctness oracle and the CPU
fallback, and is itself far faster than O(A²) because k << A.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_detector_tpu.ops import boxes as box_ops

Array = jnp.ndarray


class Detections(NamedTuple):
    boxes: Array  # (D, 4) corner, normalized
    scores: Array  # (D,)
    classes: Array  # (D,) int32, 0-based foreground class id
    valid: Array  # (D,) bool


def greedy_nms_mask(boxes: Array, scores: Array, iou_threshold: float) -> Array:
    """Greedy NMS keep-mask for boxes sorted by descending score.

    boxes: (k, 4) corner form, score-sorted. Returns (k,) bool keep mask.
    """
    k = boxes.shape[0]
    iou = box_ops.iou(boxes, boxes)  # (k, k)
    overlap = iou > iou_threshold

    def body(i, state):
        suppressed = state
        is_kept = ~suppressed[i]
        # Suppress all lower-ranked boxes overlapping box i (only if i kept).
        row = overlap[i] & (jnp.arange(k) > i) & is_kept
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    return ~suppressed


def per_class_nms(
    boxes: Array,  # (A, 4) decoded corner boxes (shared across classes)
    scores: Array,  # (A, C) per-class scores
    *,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    pre_nms_top_k: int = 400,
    max_detections: int = 200,
) -> Detections:
    """Per-class greedy NMS + cross-class top-k merge, one image.

    Batch via `jax.vmap`. All shapes static: every class is processed with
    k = pre_nms_top_k candidates; invalid slots carry score 0 and are
    dropped by the final top-k + validity mask.
    """
    num_anchors, num_classes = scores.shape
    k = min(pre_nms_top_k, num_anchors)

    def one_class(cls_scores: Array) -> tuple[Array, Array]:
        top_scores, top_idx = jax.lax.top_k(cls_scores, k)
        cls_boxes = jnp.take(boxes, top_idx, axis=0)
        keep = greedy_nms_mask(cls_boxes, top_scores, iou_threshold)
        keep &= top_scores > score_threshold
        kept_scores = jnp.where(keep, top_scores, 0.0)
        return cls_boxes, kept_scores

    all_boxes, all_scores = jax.vmap(one_class, in_axes=1)(scores)
    # (C, k, 4), (C, k) -> flatten and merge.
    flat_boxes = all_boxes.reshape(-1, 4)
    flat_scores = all_scores.reshape(-1)
    flat_classes = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), k)

    top_scores, top_idx = jax.lax.top_k(flat_scores, max_detections)
    out_boxes = jnp.take(flat_boxes, top_idx, axis=0)
    out_classes = jnp.take(flat_classes, top_idx, axis=0)
    valid = top_scores > 0.0
    return Detections(
        boxes=out_boxes, scores=top_scores, classes=out_classes, valid=valid
    )


def nms_numpy_reference(boxes, scores, iou_threshold):
    """O(n²) numpy greedy NMS — test oracle only (SURVEY.md §4)."""
    import numpy as np

    order = np.argsort(-scores)
    boxes = np.asarray(boxes)[order]
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in range(len(boxes)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        for j in range(i + 1, len(boxes)):
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = max(0.0, boxes[i, 2] - boxes[i, 0]) * max(0.0, boxes[i, 3] - boxes[i, 1])
            a2 = max(0.0, boxes[j, 2] - boxes[j, 0]) * max(0.0, boxes[j, 3] - boxes[j, 1])
            union = a1 + a2 - inter
            if union > 0 and inter / union > iou_threshold:
                suppressed[j] = True
    return np.asarray(keep, dtype=np.int64)
