"""Detection losses: sigmoid focal + smooth-L1, plus classic SSD
softmax + hard-negative-mining (both behind TrainConfig.use_focal).

Inputs come from ops/matching.py targets: per-anchor class ids in
{-1 ignore, 0 background, 1..C} and encoded box offsets. Everything is
batched (B, A, ...) and jit/vmap friendly; normalization is by the number
of positive anchors per batch (SSD/RetinaNet convention, SURVEY.md §2 #10).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def sigmoid_focal_loss(
    logits: Array,  # (B, A, C) foreground class logits
    cls_targets: Array,  # (B, A) int32 in {-1, 0, 1..C}
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Per-anchor focal loss summed over classes -> (B, A).

    One-vs-all sigmoid formulation (RetinaNet, arXiv:1708.02002): background
    anchors contribute as all-negative rows; ignored anchors are masked by
    the caller.
    """
    num_classes = logits.shape[-1]
    # One-hot over foreground classes; background (0) and ignore (-1) -> all zeros.
    onehot = jax.nn.one_hot(cls_targets - 1, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, onehot)
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    loss = alpha_t * jnp.power(1.0 - p_t, gamma) * ce
    return jnp.sum(loss, axis=-1)


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    """Numerically-stable sigmoid cross-entropy (max(x,0) - x*z + log1p(e^-|x|))."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def smooth_l1(pred: Array, target: Array, beta: float = 1.0) -> Array:
    """Huber/smooth-L1 per element; summed over the last (coord) axis."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.sum(loss, axis=-1)


def softmax_ce_with_background(
    logits: Array,  # (B, A, C+1) — class 0 is background
    cls_targets: Array,  # (B, A)
) -> Array:
    labels = jnp.maximum(cls_targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def hard_negative_mine(
    per_anchor_loss: Array,  # (B, A) classification loss
    positive: Array,  # (B, A) bool
    valid: Array,  # (B, A) bool (not ignored)
    negatives_per_positive: int = 3,
) -> Array:
    """Classic SSD OHNM: keep the top-k loss negatives, k = 3x positives.

    Returns a bool mask of anchors whose classification loss is kept.
    Implemented with a sort-based rank (static shapes; no data-dependent
    top-k sizes, SURVEY.md §7 'no dynamic shapes').
    """
    negative = valid & (~positive)
    neg_loss = jnp.where(negative, per_anchor_loss, -jnp.inf)
    # rank[i] = how many negatives in this row have strictly larger loss.
    order = jnp.argsort(-neg_loss, axis=1)
    ranks = jnp.argsort(order, axis=1)
    num_pos = jnp.sum(positive, axis=1, keepdims=True)
    max_neg = negatives_per_positive * jnp.maximum(num_pos, 1)
    keep_neg = negative & (ranks < max_neg)
    return positive | keep_neg


def detection_loss(
    cls_logits: Array,  # (B, A, C) focal / (B, A, C+1) softmax
    box_preds: Array,  # (B, A, 4)
    cls_targets: Array,  # (B, A)
    box_targets: Array,  # (B, A, 4)
    *,
    use_focal: bool = True,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    smooth_l1_beta: float = 1.0,
    box_loss_weight: float = 1.0,
    negatives_per_positive: int = 3,
) -> Tuple[Array, Dict[str, Array]]:
    """Total scalar loss + metrics dict. Compute in float32."""
    cls_logits = cls_logits.astype(jnp.float32)
    box_preds = box_preds.astype(jnp.float32)
    positive = cls_targets > 0
    valid = cls_targets >= 0  # ignore band excluded everywhere
    num_pos = jnp.maximum(jnp.sum(positive), 1).astype(jnp.float32)

    if use_focal:
        per_anchor = sigmoid_focal_loss(cls_logits, cls_targets, focal_alpha, focal_gamma)
        cls_loss = jnp.sum(jnp.where(valid, per_anchor, 0.0)) / num_pos
    else:
        per_anchor = softmax_ce_with_background(cls_logits, cls_targets)
        keep = hard_negative_mine(per_anchor, positive, valid, negatives_per_positive)
        cls_loss = jnp.sum(jnp.where(keep, per_anchor, 0.0)) / num_pos

    box_l = smooth_l1(box_preds, box_targets, smooth_l1_beta)
    box_loss = jnp.sum(jnp.where(positive, box_l, 0.0)) / num_pos

    total = cls_loss + box_loss_weight * box_loss
    return total, {
        "loss": total,
        "cls_loss": cls_loss,
        "box_loss": box_loss,
        "num_positives": num_pos,
    }
