"""Unit tests: jit NMS vs O(n²) numpy oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.ops import nms as nms_ops


def _clustered_boxes(rng, n_clusters=6, per_cluster=8):
    boxes, scores = [], []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(0.15, 0.85, 2)
        w, h = rng.uniform(0.1, 0.2, 2)
        for _ in range(per_cluster):
            jx, jy = rng.normal(0, 0.01, 2)
            boxes.append([cx - w / 2 + jx, cy - h / 2 + jy, cx + w / 2 + jx, cy + h / 2 + jy])
            scores.append(rng.uniform(0.1, 1.0))
    return (
        np.asarray(boxes, np.float32).clip(0, 1),
        np.asarray(scores, np.float32),
    )


def test_greedy_nms_matches_numpy_oracle(rng):
    boxes, scores = _clustered_boxes(rng)
    order = np.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_scores = scores[order]
    keep_mask = np.asarray(
        nms_ops.greedy_nms_mask(jnp.asarray(sorted_boxes), jnp.asarray(sorted_scores), 0.5)
    )
    got_kept = order[keep_mask]
    want_kept = nms_ops.nms_numpy_reference(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(got_kept), np.sort(want_kept))


def test_per_class_nms_shapes_and_validity(rng):
    A, C = 128, 5
    boxes = rng.uniform(0, 1, (A, 4)).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, :2] + 0.1, 0, 1)
    scores = rng.uniform(0, 1, (A, C)).astype(np.float32) * (rng.uniform(0, 1, (A, C)) > 0.8)
    det = nms_ops.per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=64, max_detections=32,
    )
    assert det.boxes.shape == (32, 4)
    assert det.scores.shape == (32,)
    v = np.asarray(det.valid)
    s = np.asarray(det.scores)
    # Scores sorted descending; invalid entries have score 0.
    assert (np.diff(s) <= 1e-6).all()
    assert (s[~v] == 0).all()
    assert (s[v] > 0.05).all()


def test_per_class_nms_suppresses_within_class_only():
    # Two identical boxes, different classes -> both survive.
    boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.1, 0.1, 0.4, 0.4]], np.float32)
    scores = np.array([[0.9, 0.0], [0.0, 0.8]], np.float32)
    det = nms_ops.per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.1, iou_threshold=0.5, pre_nms_top_k=2, max_detections=4,
    )
    v = np.asarray(det.valid)
    assert v.sum() == 2
    assert set(np.asarray(det.classes)[v].tolist()) == {0, 1}


def test_per_class_nms_jits():
    boxes = jnp.zeros((64, 4))
    scores = jnp.zeros((64, 3))
    fn = jax.jit(
        lambda b, s: nms_ops.per_class_nms(
            b, s, score_threshold=0.1, iou_threshold=0.5,
            pre_nms_top_k=32, max_detections=16,
        )
    )
    det = fn(boxes, scores)
    assert not bool(np.asarray(det.valid).any())
