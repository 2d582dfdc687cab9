"""Fused on-device augmentation — the BASELINE north-star preprocessing.

TPU-first design (not a port of the reference's per-image Pillow/OpenCV
pipeline, SURVEY.md §2 #5): every geometric op (zoom-out "expand", SSD
min-IoU crop, horizontal flip, resize) composes into ONE affine source
rectangle per image, applied with a single bilinear resample
(`jax.image.scale_and_translate` — an XLA-native gather/matmul). Photometric
jitter is pure elementwise work that XLA fuses into the same program. The
whole thing is `vmap`ped over the batch and lives inside the jitted train
step, so augmentation costs one HBM round-trip.

Crop validity uses a fixed pool of candidate rects with mask-argmax selection
instead of rejection sampling (SURVEY.md §7 hard part #3 — no while loops
under jit).

Boxes: normalized corner (x1, y1, x2, y2) in source-image coordinates.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from object_detector_tpu.core.config import AugmentConfig
from object_detector_tpu.ops import boxes as box_ops

Array = jnp.ndarray

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

# Hue rotation operates in YIQ space: RGB -> YIQ, rotate IQ plane, back.
_RGB2YIQ = jnp.array(
    [[0.299, 0.587, 0.114],
     [0.596, -0.274, -0.322],
     [0.211, -0.523, 0.312]], jnp.float32
)
_YIQ2RGB = jnp.array(
    [[1.0, 0.956, 0.621],
     [1.0, -0.272, -0.647],
     [1.0, -1.106, 1.703]], jnp.float32
)


class AugmentedExample(NamedTuple):
    image: Array  # (S, S, 3) float32, ImageNet-normalized
    boxes: Array  # (M, 4) corner, normalized to the output image
    labels: Array  # (M,) int32
    valid: Array  # (M,) bool


# --------------------------------------------------------------------------
# Photometric ops (elementwise; input/output in [0, 1])
# --------------------------------------------------------------------------

def photometric_jitter(img: Array, key: Array, cfg: AugmentConfig) -> Array:
    k_b, k_c, k_s, k_h, k_order = jax.random.split(key, 5)

    def brightness(x):
        delta = jax.random.uniform(
            k_b, (), minval=-cfg.brightness_delta, maxval=cfg.brightness_delta
        )
        return x + delta

    def contrast(x):
        f = jax.random.uniform(
            k_c, (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
        )
        mean = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
        return (x - mean) * f + mean

    def saturation(x):
        f = jax.random.uniform(
            k_s, (), minval=cfg.saturation_range[0], maxval=cfg.saturation_range[1]
        )
        gray = jnp.mean(x, axis=-1, keepdims=True)
        return (x - gray) * f + gray

    def hue(x):
        theta = jax.random.uniform(
            k_h, (), minval=-cfg.hue_delta, maxval=cfg.hue_delta
        ) * (2.0 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        rot = rot.at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)
        m = _YIQ2RGB @ rot @ _RGB2YIQ
        return x @ m.T

    img = brightness(img)
    # SSD randomizes contrast-before vs contrast-after; branchless blend of
    # the two orders via lax.cond on a coin flip.
    coin = jax.random.bernoulli(k_order)
    img = jax.lax.cond(
        coin,
        lambda x: hue(saturation(contrast(x))),
        lambda x: contrast(hue(saturation(x))),
        img,
    )
    return jnp.clip(img, 0.0, 1.0)


# --------------------------------------------------------------------------
# Geometric ops: one source-rect per image
# --------------------------------------------------------------------------

def _sample_crop_candidates(
    key: Array, boxes: Array, valid: Array, cfg: AugmentConfig
) -> Tuple[Array, Array]:
    """Sample K candidate crop rects; score validity. Returns (rects, ok).

    rects: (K, 4) corner form in source coords. ok: (K,) bool — rect meets
    its sampled min-IoU constraint AND keeps >=1 GT center inside.
    """
    k = cfg.crop_candidates
    k_rect, k_iou = jax.random.split(key)
    ks = jax.random.split(k_rect, k)

    def one(kk):
        ka, kr, kx, ky = jax.random.split(kk, 4)
        area = jax.random.uniform(
            ka, (), minval=cfg.crop_area_range[0], maxval=cfg.crop_area_range[1]
        )
        log_r = jax.random.uniform(
            kr, (),
            minval=jnp.log(cfg.crop_aspect_range[0]),
            maxval=jnp.log(cfg.crop_aspect_range[1]),
        )
        ratio = jnp.exp(log_r)
        w = jnp.sqrt(area * ratio)
        h = jnp.sqrt(area / ratio)
        w = jnp.minimum(w, 1.0)
        h = jnp.minimum(h, 1.0)
        x1 = jax.random.uniform(kx, ()) * (1.0 - w)
        y1 = jax.random.uniform(ky, ()) * (1.0 - h)
        return jnp.stack([x1, y1, x1 + w, y1 + h])

    rects = jax.vmap(one)(ks)  # (K, 4)

    # Each candidate draws one of the SSD min-IoU thresholds.
    thresholds = jnp.asarray(cfg.crop_min_ious)
    t_idx = jax.random.randint(k_iou, (k,), 0, len(cfg.crop_min_ious))
    min_iou = thresholds[t_idx]  # (K,)

    iou = box_ops.iou(rects, boxes)  # (K, M)
    iou = jnp.where(valid[None, :], iou, -1.0)
    meets_iou = jnp.max(iou, axis=1) >= min_iou

    centers = 0.5 * (boxes[:, :2] + boxes[:, 2:])  # (M, 2)
    inside = (
        (centers[None, :, 0] > rects[:, None, 0])
        & (centers[None, :, 0] < rects[:, None, 2])
        & (centers[None, :, 1] > rects[:, None, 1])
        & (centers[None, :, 1] < rects[:, None, 3])
        & valid[None, :]
    )
    keeps_center = jnp.any(inside, axis=1)
    has_gt = jnp.any(valid)
    ok = meets_iou & keeps_center & has_gt
    return rects, ok


def sample_source_rect(
    key: Array, boxes: Array, valid: Array, cfg: AugmentConfig
) -> Array:
    """Sample the per-image source rect combining expand (zoom-out) and
    min-IoU crop. Identity rect = (0, 0, 1, 1). Expand rects extend outside
    [0,1] (out-of-range pixels are mean-filled by the resampler)."""
    k_mode, k_expand, k_ex, k_ey, k_crop = jax.random.split(key, 5)

    # Expand: rect of size r>=1 containing the unit square.
    r = jax.random.uniform(k_expand, (), minval=1.0, maxval=cfg.expand_max_ratio)
    ex = jax.random.uniform(k_ex, ()) * (r - 1.0)
    ey = jax.random.uniform(k_ey, ()) * (r - 1.0)
    expand_rect = jnp.stack([-ex, -ey, r - ex, r - ey])

    # Crop: first valid candidate (mask argmax), else identity.
    rects, ok = _sample_crop_candidates(k_crop, boxes, valid, cfg)
    idx = jnp.argmax(ok)
    crop_rect = jnp.where(jnp.any(ok), rects[idx], jnp.array([0.0, 0.0, 1.0, 1.0]))

    identity = jnp.array([0.0, 0.0, 1.0, 1.0])
    u_mode, u_expand, u_crop = (
        jax.random.uniform(k_mode, (3,))[i] for i in range(3)
    )
    do_expand = u_expand < cfg.expand_prob
    do_crop = u_crop < cfg.crop_prob
    # SSD applies expand xor crop per sample (zoom-out or zoom-in); u_mode
    # arbitrates when both fire.
    pick_expand = do_expand & ((~do_crop) | (u_mode < 0.5))
    pick_crop = do_crop & ~pick_expand
    rect = jnp.where(pick_expand, expand_rect, jnp.where(pick_crop, crop_rect, identity))
    return rect


def apply_geometric(
    image: Array,  # (H, W, 3) float32 in [0,1]
    boxes: Array,  # (M, 4)
    valid: Array,  # (M,)
    rect: Array,  # (4,) source rect
    flip: Array,  # () bool
    out_size: int,
    fill: Array | None = None,
) -> Tuple[Array, Array, Array]:
    """Resample `rect` of the image to (out_size, out_size); adjust boxes.

    Implemented with jax.image.scale_and_translate over a mean-subtracted
    image so out-of-bounds pixels read as the fill color.
    """
    h, w = image.shape[0], image.shape[1]
    if fill is None:
        fill = jnp.mean(image, axis=(0, 1))
    x1, y1, x2, y2 = rect[0], rect[1], rect[2], rect[3]
    rw = x2 - x1
    rh = y2 - y1

    # Output pixel grid (0..S) maps to source pixels: src = (dst/S*rw + x1)*W.
    scale_x = out_size / (rw * w)
    scale_y = out_size / (rh * h)
    trans_x = -x1 * w * scale_x
    trans_y = -y1 * h * scale_y

    shifted = image - fill
    out = jax.image.scale_and_translate(
        shifted,
        shape=(out_size, out_size, 3),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale_y, scale_x]),
        translation=jnp.stack([trans_y, trans_x]),
        method="linear",
    )
    out = out + fill

    # Boxes into rect coordinates.
    new_boxes = jnp.stack(
        [
            (boxes[:, 0] - x1) / rw,
            (boxes[:, 1] - y1) / rh,
            (boxes[:, 2] - x1) / rw,
            (boxes[:, 3] - y1) / rh,
        ],
        axis=-1,
    )
    # Validity: box center must remain inside the crop (SSD rule).
    centers = 0.5 * (new_boxes[:, :2] + new_boxes[:, 2:])
    center_in = jnp.all((centers > 0.0) & (centers < 1.0), axis=-1)
    new_boxes = jnp.clip(new_boxes, 0.0, 1.0)
    degenerate = (new_boxes[:, 2] - new_boxes[:, 0] <= 1e-4) | (
        new_boxes[:, 3] - new_boxes[:, 1] <= 1e-4
    )
    new_valid = valid & center_in & (~degenerate)

    # Horizontal flip.
    out = jnp.where(flip, out[:, ::-1, :], out)
    flipped = jnp.stack(
        [1.0 - new_boxes[:, 2], new_boxes[:, 1], 1.0 - new_boxes[:, 0], new_boxes[:, 3]],
        axis=-1,
    )
    new_boxes = jnp.where(flip, flipped, new_boxes)
    return out, new_boxes, new_valid


def normalize(img: Array) -> Array:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def augment_example(
    image_u8: Array,  # (H, W, 3) uint8
    boxes: Array,
    labels: Array,
    valid: Array,
    key: Array,
    cfg: AugmentConfig,
    out_size: int,
) -> AugmentedExample:
    """Full train-time augmentation for one example (vmap over batch)."""
    k_photo, k_rect, k_flip = jax.random.split(key, 3)
    img = image_u8.astype(jnp.float32) / 255.0
    img = photometric_jitter(img, k_photo, cfg)
    rect = sample_source_rect(k_rect, boxes, valid, cfg)
    flip = jax.random.bernoulli(k_flip, cfg.hflip_prob)
    img, boxes, valid = apply_geometric(img, boxes, valid, rect, flip, out_size)
    img = normalize(img)
    return AugmentedExample(image=img, boxes=boxes, labels=labels, valid=valid)


def preprocess_eval(image_u8: Array, out_size: int) -> Array:
    """Eval-time path: resize + normalize only."""
    img = image_u8.astype(jnp.float32) / 255.0
    h, w = img.shape[0], img.shape[1]
    out = jax.image.scale_and_translate(
        img,
        shape=(out_size, out_size, 3),
        spatial_dims=(0, 1),
        scale=jnp.array([out_size / h, out_size / w]),
        translation=jnp.zeros(2),
        method="linear",
    )
    return normalize(out)


def augment_batch(
    images_u8: Array,  # (B, S, S, 3) uint8
    boxes: Array,  # (B, M, 4)
    labels: Array,  # (B, M)
    valid: Array,  # (B, M)
    key: Array,
    cfg: AugmentConfig,
    out_size: int,
) -> AugmentedExample:
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(
        lambda i, b, l, v, k: augment_example(i, b, l, v, k, cfg, out_size)
    )(images_u8, boxes, labels, valid, keys)
