"""GT↔anchor matching and target encoding — fully vectorized, vmap-able.

Reference semantics are unverifiable (SURVEY.md §0); this implements the SSD
paper's bipartite + threshold matching (arXiv:1512.02325 §2.2) with a
RetinaNet-style ignore band, all knobs in MatcherConfig:

  1. every valid GT force-matches its best-IoU anchor (bipartite step),
  2. every anchor whose best GT IoU >= positive_iou is positive,
  3. anchors in [negative_iou, positive_iou) are ignored (class target -1),
  4. the rest are background (class target 0).

Class targets: int32 in {-1 (ignore), 0 (background), 1..C (foreground)}.
Box targets: SSD-encoded offsets against the anchor set.

Operates on one image; batch via `jax.vmap`. GT arrays are padded to a
static `max_boxes` with a validity mask (static shapes for XLA).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from object_detector_tpu.core.config import MatcherConfig
from object_detector_tpu.ops import boxes as box_ops

Array = jnp.ndarray


class MatchTargets(NamedTuple):
    cls: Array  # (A,) int32: -1 ignore / 0 background / 1..C foreground
    box: Array  # (A, 4) float32 encoded offsets (zeros for non-positive)
    matched_gt: Array  # (A,) int32 index of matched GT (0 if none)


def match(
    gt_boxes: Array,  # (M, 4) corner, padded
    gt_labels: Array,  # (M,) int32 in 1..C (0 pad ok)
    gt_valid: Array,  # (M,) bool
    anchors_center: Array,  # (A, 4)
    cfg: MatcherConfig,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
) -> MatchTargets:
    anchors_corner = box_ops.center_to_corner(anchors_center)
    # (A, M) IoU; invalid GT columns forced to -1 so they never win an argmax.
    iou = box_ops.iou(anchors_corner, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    # Threshold step: best GT per anchor.
    best_gt_iou = jnp.max(iou, axis=1)  # (A,)
    best_gt_idx = jnp.argmax(iou, axis=1)  # (A,)

    # Bipartite step: best anchor per GT, force-matched. Implemented as a
    # scatter over anchors: anchor a <- gt j if a == argmax_a iou[:, j].
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (M,)
    num_anchors = anchors_center.shape[0]
    if cfg.force_match_best:
        # forced[a] = index of the GT that force-matched anchor a, else -1.
        # Later GTs win ties (scatter semantics: last write wins), which is
        # deterministic under XLA's indexed scatter.
        gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
        forced = jnp.full((num_anchors,), -1, dtype=jnp.int32)
        scatter_idx = jnp.where(gt_valid, best_anchor_per_gt, num_anchors)  # drop pads
        forced = forced.at[scatter_idx].set(
            jnp.where(gt_valid, gt_ids, -1), mode="drop"
        )
        is_forced = forced >= 0
        matched_gt = jnp.where(is_forced, forced, best_gt_idx)
        # Forced anchors count as positives regardless of IoU.
        positive = is_forced | (best_gt_iou >= cfg.positive_iou)
    else:
        matched_gt = best_gt_idx
        positive = best_gt_iou >= cfg.positive_iou
        is_forced = jnp.zeros_like(positive)

    ignore = (~positive) & (best_gt_iou >= cfg.negative_iou)

    # Row gathers as a one-hot matmul: vmapped jnp.take lowers to a
    # batched gather that XLA executes at ~11 GB/s on TPU (measured 3.5 ms
    # per train step, chip_logs/train_profile.log); the (A, M) one-hot
    # contraction runs on the MXU instead and is exact (each row has a
    # single 1.0, so the f32 sum reduces to the selected element).
    m = gt_boxes.shape[0]
    onehot = (
        matched_gt[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # (A, M)
    matched_labels = jnp.round(onehot @ gt_labels.astype(jnp.float32)).astype(
        jnp.int32
    )
    cls = jnp.where(positive, matched_labels, 0)
    cls = jnp.where(ignore, -1, cls)

    matched_boxes = onehot @ gt_boxes.astype(jnp.float32)
    encoded = box_ops.encode(
        matched_boxes, anchors_center, center_variance, size_variance
    )
    box = jnp.where(positive[:, None], encoded, 0.0)
    return MatchTargets(cls=cls, box=box, matched_gt=matched_gt)
