"""Vectorized box geometry: conversions, IoU, SSD encode/decode.

All boxes are normalized to [0, 1]. Two layouts:
  - corner:  (x1, y1, x2, y2)
  - center:  (cx, cy, w, h)

Everything is pure jnp, shape-static, and safe under vmap/jit — this module
is the parity-risk concentrate (SURVEY.md §7 hard part #2), so semantics
(variances, clipping order) are parameterized rather than baked in.
Reference file:line citations are impossible (SURVEY.md §0: reference mount
empty); semantics follow SSD arXiv:1512.02325 §2.2.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

EPS = 1e-8


def corner_to_center(boxes: Array) -> Array:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate([x1 + 0.5 * w, y1 + 0.5 * h, w, h], axis=-1)


def center_to_corner(boxes: Array) -> Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw = 0.5 * w
    hh = 0.5 * h
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def area(boxes: Array) -> Array:
    """Area of corner-form boxes; negative extents clamp to 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def intersection(a: Array, b: Array) -> Array:
    """Pairwise intersection areas.

    a: (..., N, 4), b: (..., M, 4) corner boxes -> (..., N, M).
    """
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def iou(a: Array, b: Array) -> Array:
    """Pairwise IoU matrix: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    inter = intersection(a, b)
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, EPS)


def encode(
    gt_corner: Array,
    anchors_center: Array,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
) -> Array:
    """Encode corner-form GT boxes against center-form anchors.

    Returns (Δcx/w_a/vc, Δcy/h_a/vc, log(w/w_a)/vs, log(h/h_a)/vs) — the SSD
    regression targets (arXiv:1512.02325 eq. 2).
    """
    gt = corner_to_center(gt_corner)
    t_xy = (gt[..., :2] - anchors_center[..., :2]) / (
        anchors_center[..., 2:] * center_variance
    )
    t_wh = (
        jnp.log(jnp.maximum(gt[..., 2:], EPS) / anchors_center[..., 2:])
        / size_variance
    )
    return jnp.concatenate([t_xy, t_wh], axis=-1)


def decode(
    offsets: Array,
    anchors_center: Array,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
    clip: bool = True,
) -> Array:
    """Invert `encode`: regression offsets + anchors -> corner boxes."""
    cxy = offsets[..., :2] * center_variance * anchors_center[..., 2:] + anchors_center[..., :2]
    wh = jnp.exp(offsets[..., 2:] * size_variance) * anchors_center[..., 2:]
    boxes = center_to_corner(jnp.concatenate([cxy, wh], axis=-1))
    if clip:
        boxes = jnp.clip(boxes, 0.0, 1.0)
    return boxes
