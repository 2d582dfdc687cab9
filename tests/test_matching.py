"""Unit tests: matcher invariants (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors import priors
from object_detector_tpu.core.config import MatcherConfig, ssd300_anchor_config
from object_detector_tpu.ops import boxes as box_ops
from object_detector_tpu.ops import matching


def _setup():
    anchors = jnp.asarray(priors.ssd_anchors(ssd300_anchor_config(), 300))
    cfg = MatcherConfig()
    return anchors, cfg


def _pad_gt(boxes, labels, max_boxes=20):
    m = len(boxes)
    gt_boxes = np.zeros((max_boxes, 4), np.float32)
    gt_labels = np.zeros((max_boxes,), np.int32)
    gt_valid = np.zeros((max_boxes,), bool)
    gt_boxes[:m] = boxes
    gt_labels[:m] = labels
    gt_valid[:m] = True
    return jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid)


def test_every_gt_gets_at_least_one_anchor():
    anchors, cfg = _setup()
    # A tiny box that overlaps nothing well — must still be force-matched.
    boxes = np.array(
        [[0.01, 0.01, 0.04, 0.02], [0.4, 0.4, 0.6, 0.6]], np.float32
    )
    gt_boxes, gt_labels, gt_valid = _pad_gt(boxes, [3, 7])
    t = matching.match(gt_boxes, gt_labels, gt_valid, anchors, cfg)
    cls = np.asarray(t.cls)
    matched = np.asarray(t.matched_gt)
    for gt_idx, label in [(0, 3), (1, 7)]:
        pos_for_gt = (cls > 0) & (matched == gt_idx)
        assert pos_for_gt.any(), f"GT {gt_idx} unmatched"
        assert (cls[pos_for_gt] == label).all()


def test_high_iou_anchors_are_positive():
    anchors, cfg = _setup()
    # Pick an actual anchor as GT -> IoU 1.0 with itself.
    a_corner = np.asarray(box_ops.center_to_corner(anchors))
    gt_boxes, gt_labels, gt_valid = _pad_gt(a_corner[100:101], [5])
    t = matching.match(gt_boxes, gt_labels, gt_valid, anchors, cfg)
    assert int(t.cls[100]) == 5


def test_no_positives_without_gt():
    anchors, cfg = _setup()
    gt_boxes, gt_labels, gt_valid = _pad_gt(np.zeros((0, 4), np.float32), [])
    t = matching.match(gt_boxes, gt_labels, gt_valid, anchors, cfg)
    assert not (np.asarray(t.cls) > 0).any()


def test_encoded_targets_decode_back_to_gt():
    anchors, cfg = _setup()
    boxes = np.array([[0.2, 0.3, 0.5, 0.7]], np.float32)
    gt_boxes, gt_labels, gt_valid = _pad_gt(boxes, [1])
    t = matching.match(gt_boxes, gt_labels, gt_valid, anchors, cfg)
    pos = np.asarray(t.cls) > 0
    decoded = np.asarray(box_ops.decode(t.box, anchors, clip=False))
    np.testing.assert_allclose(decoded[pos], np.tile(boxes, (pos.sum(), 1)), atol=1e-4)


def test_ignore_band():
    anchors, _ = _setup()
    cfg = MatcherConfig(positive_iou=0.5, negative_iou=0.4)
    boxes = np.array([[0.3, 0.3, 0.62, 0.62]], np.float32)
    gt_boxes, gt_labels, gt_valid = _pad_gt(boxes, [2])
    t = matching.match(gt_boxes, gt_labels, gt_valid, anchors, cfg)
    cls = np.asarray(t.cls)
    assert (cls == -1).any(), "expected some anchors in the ignore band"
    assert (cls > 0).any() and (cls == 0).any()


def test_match_is_vmappable():
    anchors, cfg = _setup()
    boxes = np.array([[0.2, 0.2, 0.5, 0.5]], np.float32)
    gt_boxes, gt_labels, gt_valid = _pad_gt(boxes, [4])
    batched = jax.vmap(lambda b, l, v: matching.match(b, l, v, anchors, cfg))(
        jnp.stack([gt_boxes, gt_boxes]),
        jnp.stack([gt_labels, gt_labels]),
        jnp.stack([gt_valid, gt_valid]),
    )
    assert batched.cls.shape == (2, anchors.shape[0])
    np.testing.assert_array_equal(np.asarray(batched.cls[0]), np.asarray(batched.cls[1]))
