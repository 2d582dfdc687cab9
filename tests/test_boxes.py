"""Unit tests: box geometry (IoU vs brute force, encode∘decode identity)."""

import jax.numpy as jnp
import numpy as np

from object_detector_tpu.ops import boxes as box_ops


def _random_boxes(rng, n):
    x1 = rng.uniform(0, 0.8, n)
    y1 = rng.uniform(0, 0.8, n)
    w = rng.uniform(0.05, 0.2, n)
    h = rng.uniform(0.05, 0.2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def _iou_brute(a, b):
    out = np.zeros((len(a), len(b)), dtype=np.float64)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            xx1, yy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            xx2, yy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a2 = (bj[2] - bj[0]) * (bj[3] - bj[1])
            union = a1 + a2 - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_matches_brute_force(rng):
    a = _random_boxes(rng, 13)
    b = _random_boxes(rng, 7)
    got = np.asarray(box_ops.iou(jnp.asarray(a), jnp.asarray(b)))
    want = _iou_brute(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_corner_center_roundtrip(rng):
    boxes = _random_boxes(rng, 32)
    back = box_ops.center_to_corner(box_ops.corner_to_center(jnp.asarray(boxes)))
    np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-6)


def test_encode_decode_identity(rng):
    gt = _random_boxes(rng, 64)
    anchors = box_ops.corner_to_center(jnp.asarray(_random_boxes(rng, 64)))
    enc = box_ops.encode(jnp.asarray(gt), anchors)
    dec = box_ops.decode(enc, anchors, clip=False)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-5)


def test_decode_respects_variances(rng):
    gt = _random_boxes(rng, 16)
    anchors = box_ops.corner_to_center(jnp.asarray(_random_boxes(rng, 16)))
    enc1 = box_ops.encode(jnp.asarray(gt), anchors, 0.1, 0.2)
    enc2 = box_ops.encode(jnp.asarray(gt), anchors, 0.2, 0.4)
    np.testing.assert_allclose(np.asarray(enc1), np.asarray(enc2) * 2.0, atol=1e-5)


def test_iou_of_identical_boxes_is_one(rng):
    a = _random_boxes(rng, 5)
    got = np.asarray(box_ops.iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)
