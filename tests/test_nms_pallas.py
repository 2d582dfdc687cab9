"""Pallas NMS (interpret mode on CPU) vs the jnp reference (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from object_detector_tpu.kernels.nms_pallas import pallas_per_class_nms
from object_detector_tpu.ops import nms as nms_ops


def _random_scene(rng, A=256, C=4):
    boxes = rng.uniform(0, 0.9, (A, 4)).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, :2] + rng.uniform(0.05, 0.3, (A, 2)), 0, 1)
    scores = (rng.uniform(0, 1, (A, C)) * (rng.uniform(0, 1, (A, C)) > 0.7)).astype(
        np.float32
    )
    return jnp.asarray(boxes), jnp.asarray(scores)


def _as_set(det, tol=1e-5):
    v = np.asarray(det.valid)
    items = []
    for box, score, cls in zip(
        np.asarray(det.boxes)[v], np.asarray(det.scores)[v], np.asarray(det.classes)[v]
    ):
        items.append((int(cls), round(float(score), 5), tuple(np.round(box, 5))))
    return sorted(items)


def test_pallas_matches_reference_nms(rng):
    boxes, scores = _random_scene(rng)
    kw = dict(
        score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=128, max_detections=64
    )
    ref = nms_ops.per_class_nms(boxes, scores, **kw)
    got = pallas_per_class_nms(boxes, scores, interpret=True, **kw)
    assert _as_set(got) == _as_set(ref)


def test_pallas_nms_respects_max_per_class(rng):
    # 300 disjoint boxes in one class -> per-class cap limits survivors.
    n = 128
    xs = np.linspace(0, 0.99, n)
    boxes = np.stack([xs, np.zeros(n), xs + 0.005, np.full(n, 0.01)], -1).astype(
        np.float32
    )
    scores = np.ones((n, 1), np.float32)
    det = pallas_per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.1, iou_threshold=0.5, pre_nms_top_k=128,
        max_detections=128, max_per_class=16, interpret=True,
    )
    assert int(np.asarray(det.valid).sum()) == 16


def test_postprocess_pallas_matches_jnp_path(rng):
    """End-to-end postprocess(): pallas (interpret) vs jnp NMS paths."""
    import jax

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import tiny_test_config
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = tiny_test_config()
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))
    A, C = anchors.shape[0], cfg.model.num_classes
    # Keep every anchor as a candidate (M >= A) so both paths see identical
    # candidate sets and parity is exact, not statistical.
    cfg = cfg.override({"eval.pre_nms_top_k": A})
    cls = jnp.asarray(rng.normal(-4.0, 1.5, (2, A, C)).astype(np.float32))
    box = jnp.asarray(rng.normal(0, 0.5, (2, A, 4)).astype(np.float32))
    det_p = postprocess(cls, box, anchors, cfg, use_pallas=True)
    det_j = postprocess(cls, box, anchors, cfg, use_pallas=False)
    for i in range(2):
        assert _as_set(
            type(det_p)(det_p.boxes[i], det_p.scores[i], det_p.classes[i], det_p.valid[i])
        ) == _as_set(
            type(det_j)(det_j.boxes[i], det_j.scores[i], det_j.classes[i], det_j.valid[i])
        )


def test_pallas_nms_empty_scene():
    boxes = jnp.zeros((64, 4))
    scores = jnp.zeros((64, 3))
    det = pallas_per_class_nms(
        boxes, scores, score_threshold=0.1, iou_threshold=0.5,
        pre_nms_top_k=64, max_detections=32, interpret=True,
    )
    assert not bool(np.asarray(det.valid).any())
