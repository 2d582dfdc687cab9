"""Pallas per-class NMS kernel (BASELINE north-star: on-chip decode-to-
detections; SURVEY.md §7 step 6).

Design (TPU-first, not a CUDA port):
- XLA does what it is best at outside the kernel: per-class `top_k`
  candidate selection and the final cross-class merge.
- The kernel owns the part XLA schedules poorly — the sequential greedy
  suppression — with the whole working set (boxes, scores, the (k, k) IoU
  matrix) resident in VMEM, one grid program per class.
- Greedy semantics via argmax-emit: each iteration keeps the highest
  remaining score and zeroes everything it overlaps. `max_out` iterations
  (the per-class detection cap) instead of k — ~4x fewer sequential steps
  than rank-scan NMS at k=512, identical results (greedy NMS truncated at
  max_out keeps exactly the first max_out survivors).
- Boxes travel as (4, k) so coordinates lie along lanes; k is padded to a
  multiple of 128 (f32 tile lane width).

Interpret mode runs on CPU for tests; compiled mode on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from object_detector_tpu.ops.nms import Detections

Array = jnp.ndarray

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(
    bt_ref,  # (1, 4, k) boxes, coordinate-major
    scores_ref,  # (1, k)
    out_ref,  # (1, k) kept scores
    *,
    k: int,
    max_out: int,
    iou_threshold: float,
    score_threshold: float,
):
    bt = bt_ref[0]  # (4, k)
    x1 = bt[0:1, :]
    y1 = bt[1:2, :]
    x2 = bt[2:3, :]
    y2 = bt[3:4, :]
    x1c = jnp.reshape(x1, (k, 1))
    y1c = jnp.reshape(y1, (k, 1))
    x2c = jnp.reshape(x2, (k, 1))
    y2c = jnp.reshape(y2, (k, 1))

    iw = jnp.maximum(jnp.minimum(x2c, x2) - jnp.maximum(x1c, x1), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2) - jnp.maximum(y1c, y1), 0.0)
    inter = iw * ih  # (k, k)
    area_r = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (1, k)
    area_c = jnp.reshape(area_r, (k, 1))
    union = area_c + area_r - inter
    overlap = (inter > iou_threshold * union).astype(jnp.float32)  # (k, k)

    scores = scores_ref[:]  # (1, k)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(_, carry):
        remaining, kept = carry
        i = jnp.argmax(remaining)  # flat index in 0..k-1
        s = jnp.max(remaining)
        valid = (s > score_threshold).astype(jnp.float32)
        onehot = (col_ids == i).astype(jnp.float32)
        kept = kept + onehot * valid
        row = jax.lax.dynamic_slice(overlap, (i, 0), (1, k))
        suppress = jnp.maximum(row, onehot) * valid
        remaining = remaining * (1.0 - suppress)
        return remaining, kept

    _, kept = jax.lax.fori_loop(
        0, max_out, body, (scores, jnp.zeros((1, k), jnp.float32))
    )
    out_ref[:] = scores * kept


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold", "iou_threshold", "pre_nms_top_k", "max_detections",
        "max_per_class", "interpret",
    ),
)
def pallas_per_class_nms(
    boxes: Array,  # (A, 4) decoded corner boxes, one image
    scores: Array,  # (A, C)
    *,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    pre_nms_top_k: int = 400,
    max_detections: int = 200,
    max_per_class: int = 100,
    interpret: bool | None = None,
) -> Detections:
    """Drop-in replacement for ops.nms.per_class_nms (vmap over batch)."""
    num_anchors, num_classes = scores.shape
    k = _round_up(min(pre_nms_top_k, num_anchors), _LANE)
    k_eff = min(pre_nms_top_k, num_anchors)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Per-class top-k gather (XLA's strength), padded to the lane width.
    top_scores, top_idx = jax.lax.top_k(scores.T, k_eff)  # (C, k_eff)
    cls_boxes = jnp.take(boxes, top_idx.reshape(-1), axis=0).reshape(
        num_classes, k_eff, 4
    )
    pad = k - k_eff
    if pad:
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
        cls_boxes = jnp.pad(cls_boxes, ((0, 0), (0, pad), (0, 0)))
    boxes_t = jnp.transpose(cls_boxes, (0, 2, 1))  # (C, 4, k)

    kernel = functools.partial(
        _nms_kernel,
        k=k,
        max_out=min(max_per_class, max_detections, k),
        iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold),
    )
    kept_scores = pl.pallas_call(
        kernel,
        grid=(num_classes,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k), lambda c: (c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_classes, k), jnp.float32),
        interpret=interpret,
    )(boxes_t, top_scores.astype(jnp.float32))

    # Cross-class merge: top max_detections by kept score.
    flat_scores = kept_scores.reshape(-1)
    merged_scores, merged_idx = jax.lax.top_k(flat_scores, max_detections)
    out_boxes = jnp.take(cls_boxes.reshape(-1, 4), merged_idx, axis=0)
    out_classes = (merged_idx // k).astype(jnp.int32)
    valid = merged_scores > 0.0
    return Detections(
        boxes=out_boxes, scores=merged_scores, classes=out_classes, valid=valid
    )
