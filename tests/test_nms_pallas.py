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


def test_pallas_A_much_greater_than_M_realistic(rng):
    """Approximation bound at the PRODUCTION regime (A=8732 >> M=512).

    The class-agnostic candidate prefilter is only exact when M >= A
    (ADVICE r1); this test bounds the deviation where it actually runs:
    SSD-300 anchor count, 20 classes, a trained-ish score profile
    (background logits ~ -6, a few dozen strong object peaks). Every
    oracle detection above 0.05 must be reproduced by the pallas path
    (class + box + score), and no spurious >=0.05 detections may appear.
    """
    import jax

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_vgg16_voc")
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))
    A, C = anchors.shape[0], cfg.model.num_classes
    assert A == 8732 and 2 * cfg.eval.pre_nms_top_k < A  # the approx regime
    B = 2
    cls = rng.normal(-6.0, 0.7, (B, A, C)).astype(np.float32)
    for b in range(B):
        n_obj = 40
        idx = rng.choice(A, n_obj, replace=False)
        klass = rng.integers(0, C, n_obj)
        cls[b, idx, klass] = rng.uniform(1.0, 6.0, n_obj).astype(np.float32)
    box = rng.normal(0, 0.3, (B, A, 4)).astype(np.float32)
    # Cap parity: make the per-class cap unobservable for this comparison.
    cfg = cfg.override({"eval.nms_max_per_class": cfg.eval.max_detections})

    det_p = postprocess(jnp.asarray(cls), jnp.asarray(box), anchors, cfg,
                        use_pallas=True)
    det_j = postprocess(jnp.asarray(cls), jnp.asarray(box), anchors, cfg,
                        use_pallas=False)
    for i in range(B):
        strong = lambda det: {  # noqa: E731
            (int(c), round(float(s), 4), tuple(np.round(np.asarray(bx), 4)))
            for c, s, bx, v in zip(
                np.asarray(det.classes[i]), np.asarray(det.scores[i]),
                np.asarray(det.boxes[i]), np.asarray(det.valid[i]))
            if v and s >= 0.05
        }
        p, j = strong(det_p), strong(det_j)
        missing = j - p
        spurious = p - j
        assert not missing, f"image {i}: oracle dets lost: {sorted(missing)[:5]}"
        assert not spurious, f"image {i}: spurious dets: {sorted(spurious)[:5]}"


def test_pallas_class_starvation_is_bounded(rng):
    """Adversarial prefilter stress: one class's candidates all rank below
    another's. With per-class top-k the weak class keeps its detections;
    class-agnostic selection can starve it. This documents the failure
    mode and bounds it: strong-class detections survive exactly, and the
    weak class retains its top detections (its best anchors still make the
    global top-M because M = 2*pre_nms_top_k >> #strong anchors)."""
    from object_detector_tpu.kernels.nms_pallas import pallas_per_class_nms
    from object_detector_tpu.ops import nms as nms_ops

    A, C = 4096, 2
    k = 128  # M = 256
    boxes = rng.uniform(0, 0.9, (A, 4)).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, :2] + rng.uniform(0.05, 0.2, (A, 2)), 0, 1)
    scores = np.zeros((A, C), np.float32)
    scores[:, 0] = rng.uniform(0.5, 1.0, A)   # strong class everywhere
    scores[:, 1] = rng.uniform(0.1, 0.3, A)   # weak class everywhere
    kw = dict(score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=k,
              max_detections=64, max_per_class=64)
    got = pallas_per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=True, **kw)
    ref = nms_ops.per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=k,
        max_detections=64)
    gv, rv = np.asarray(got.valid), np.asarray(ref.valid)
    got_strong = {round(float(s), 4) for s, c in
                  zip(np.asarray(got.scores)[gv], np.asarray(got.classes)[gv]) if c == 0}
    ref_strong = {round(float(s), 4) for s, c in
                  zip(np.asarray(ref.scores)[rv], np.asarray(ref.classes)[rv]) if c == 0}
    # The strong class is unaffected by starvation.
    assert got_strong == ref_strong
    # The weak class IS starved here (all its anchors rank below class 0) —
    # the bound: it still contributes nothing above the strong class's
    # scores, so the global top-64 merged detections are identical.
    got_all = sorted(np.asarray(got.scores)[gv])[-32:]
    ref_all = sorted(np.asarray(ref.scores)[rv])[-32:]
    np.testing.assert_allclose(got_all, ref_all, atol=1e-5)


def test_row_activity_sort_is_exact(rng, monkeypatch):
    """The row-activity sort in _nms_rows groups dead (image, class) rows
    into chunks the kernel's early-exit skips; outputs are inverse-permuted,
    so results must be bit-identical to the unsorted path. _ROW_CHUNK is
    patched small so the sort path (total_rows > chunk) runs at test sizes
    (production: B*C rows >> 256)."""
    from object_detector_tpu.kernels import nms_pallas

    monkeypatch.setattr(nms_pallas, "_ROW_CHUNK", 8)
    R, k, max_out = 24, 64, 16
    # Mixed activity: a third of the rows fully dead, varied counts elsewhere.
    scores = rng.uniform(0.1, 1.0, (R, k)).astype(np.float32)
    scores *= (rng.uniform(0, 1, (R, k)) > 0.6)
    scores[::3] = 0.0
    order = np.argsort(-scores, axis=1)
    scores = np.take_along_axis(scores, order, axis=1)  # desc per row
    boxes = rng.uniform(0, 0.9, (R, k, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (R, k, 2)).astype(np.float32)
    coords = np.stack(
        [boxes[..., 0], boxes[..., 1], boxes[..., 0] + wh[..., 0],
         boxes[..., 1] + wh[..., 1]]
    )  # (4, R, k)
    kw = dict(max_out=max_out, iou_threshold=0.5, score_threshold=0.05,
              interpret=True)
    s_sorted, c_sorted = nms_pallas._nms_rows(
        jnp.asarray(coords), jnp.asarray(scores), sort_rows=True, **kw)
    s_plain, c_plain = nms_pallas._nms_rows(
        jnp.asarray(coords), jnp.asarray(scores), sort_rows=False, **kw)
    np.testing.assert_array_equal(np.asarray(s_sorted), np.asarray(s_plain))
    np.testing.assert_array_equal(np.asarray(c_sorted), np.asarray(c_plain))


def test_class_top_k_off_equals_large(rng):
    """class_top_k >= M (lane-rounded) is a no-op: identical detections."""
    boxes, scores = _random_scene(rng, A=256, C=4)
    kw = dict(
        score_threshold=0.02, iou_threshold=0.5, pre_nms_top_k=128,
        max_detections=64, interpret=True,
    )
    base = pallas_per_class_nms(boxes, scores, **kw)
    same = pallas_per_class_nms(boxes, scores, class_top_k=4096, **kw)
    assert _as_set(base) == _as_set(same)


def test_class_top_k_matches_truncated_oracle(rng):
    """With M >= A (no agnostic approximation), narrowing to class_top_k
    must equal the jnp oracle's documented per-class pre_nms_top_k
    truncation (ops/nms.py) with the same k."""
    A, C, k2 = 384, 3, 128
    boxes, scores = _random_scene(rng, A=A, C=C)
    # Dense scores so the truncation is actually observable.
    scores = jnp.asarray(rng.uniform(0.02, 1.0, (A, C)).astype(np.float32))
    ref = nms_ops.per_class_nms(
        boxes, scores, score_threshold=0.01, iou_threshold=0.5,
        pre_nms_top_k=k2, max_detections=64,
    )
    got = pallas_per_class_nms(
        boxes, scores, score_threshold=0.01, iou_threshold=0.5,
        pre_nms_top_k=A,  # M = A: keep every anchor as a shared candidate
        class_top_k=k2, max_detections=64, max_per_class=64, interpret=True,
    )
    assert _as_set(got) == _as_set(ref)


def test_class_top_k_decode_path(rng):
    """pallas_decode_nms narrowing: postprocess parity vs the jnp path
    when class_top_k keeps every above-threshold candidate."""
    import jax

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import tiny_test_config
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = tiny_test_config()
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))
    A, C = anchors.shape[0], cfg.model.num_classes
    cfg = cfg.override(
        {"eval.pre_nms_top_k": A, "eval.nms_class_top_k": A}
    )
    cls = jnp.asarray(rng.normal(-4.0, 1.5, (2, A, C)).astype(np.float32))
    box = jnp.asarray(rng.normal(0, 0.5, (2, A, 4)).astype(np.float32))
    det_p = postprocess(cls, box, anchors, cfg, use_pallas=True)
    det_j = postprocess(cls, box, anchors, cfg, use_pallas=False)
    for i in range(2):
        assert _as_set(
            type(det_p)(det_p.boxes[i], det_p.scores[i], det_p.classes[i],
                        det_p.valid[i])
        ) == _as_set(
            type(det_j)(det_j.boxes[i], det_j.scores[i], det_j.classes[i],
                        det_j.valid[i])
        )


def test_coord_bf16_detection_set_close(rng):
    """bf16 coordinate planes: scores/ordering exact; only suppression
    decisions within ~0.4% of the IoU threshold may flip. On random
    scenes the detection set should match f32 near-exactly."""
    from object_detector_tpu.kernels.nms_pallas import (
        pallas_per_class_nms_batched,
    )

    B, A, C = 4, 600, 6
    boxes = rng.uniform(0, 1, (B, A, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(
        boxes[..., :2] + rng.uniform(0.02, 0.3, (B, A, 2)), 0, 1
    )
    scores = (rng.uniform(0, 1, (B, A, C)) ** 6).astype(np.float32)
    kw = dict(
        score_threshold=0.05, iou_threshold=0.45, pre_nms_top_k=128,
        max_detections=50, max_per_class=25, interpret=True,
    )
    d32 = pallas_per_class_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), **kw
    )
    d16 = pallas_per_class_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), coord_bf16=True, **kw
    )
    s32 = set(
        zip(
            np.asarray(d32.classes)[np.asarray(d32.valid)].tolist(),
            np.round(
                np.asarray(d32.scores)[np.asarray(d32.valid)], 5
            ).tolist(),
        )
    )
    s16 = set(
        zip(
            np.asarray(d16.classes)[np.asarray(d16.valid)].tolist(),
            np.round(
                np.asarray(d16.scores)[np.asarray(d16.valid)], 5
            ).tolist(),
        )
    )
    jac = len(s32 & s16) / max(len(s32 | s16), 1)
    assert jac > 0.97, f"bf16-coord detection set diverged: jaccard={jac}"


def _random_levels(rng, B=2, C=5, shapes=((8, 8, 4), (4, 4, 6), (2, 2, 4))):
    """Per-level native head tensors + matching concat + anchors."""
    lvl_cls, lvl_box = [], []
    for h, w, a in shapes:
        lvl_cls.append(
            jnp.asarray(rng.normal(-3.0, 1.5, (B, h, w, a * C)).astype(np.float32))
        )
        lvl_box.append(
            jnp.asarray(rng.normal(0, 0.4, (B, h, w, a * 4)).astype(np.float32))
        )
    A = sum(h * w * a for h, w, a in shapes)
    cls_cat = jnp.concatenate(
        [t.reshape(B, -1, C) for t in lvl_cls], axis=1
    )
    box_cat = jnp.concatenate(
        [t.reshape(B, -1, 4) for t in lvl_box], axis=1
    )
    anchors = rng.uniform(0.2, 0.8, (A, 4)).astype(np.float32)
    anchors[:, 2:] = rng.uniform(0.05, 0.3, (A, 2))  # center-form w/h > 0
    return lvl_cls, lvl_box, cls_cat, box_cat, jnp.asarray(anchors)


def test_per_level_decode_nms_matches_concat(rng):
    """pallas_decode_nms_levels == pallas_decode_nms on the concatenated
    tensors: the two-stage exact prefilter selects the same candidate set
    as the one-shot global top-M (both paths exercise a level wider than
    M — gather branch — and levels narrower than M — whole-level
    branch)."""
    from object_detector_tpu.kernels.nms_pallas import (
        pallas_decode_nms,
        pallas_decode_nms_levels,
    )

    shapes = ((8, 8, 4), (4, 4, 6), (2, 2, 4))
    lvl_cls, lvl_box, cls_cat, box_cat, anchors = _random_levels(
        rng, shapes=shapes
    )
    kw = dict(
        score_threshold=0.01,
        iou_threshold=0.5,
        pre_nms_top_k=64,  # m_eff=128 < level0's 256 anchors
        max_detections=16,
        max_per_class=8,
        exact_prefilter=True,
        interpret=True,
    )
    det_cat = pallas_decode_nms(cls_cat, box_cat, anchors, **kw)
    det_lvl = pallas_decode_nms_levels(
        tuple(lvl_cls), tuple(lvl_box), anchors,
        tuple(s[2] for s in shapes), **kw
    )
    for i in range(cls_cat.shape[0]):
        assert _as_set(
            type(det_cat)(det_cat.boxes[i], det_cat.scores[i],
                          det_cat.classes[i], det_cat.valid[i])
        ) == _as_set(
            type(det_lvl)(det_lvl.boxes[i], det_lvl.scores[i],
                          det_lvl.classes[i], det_lvl.valid[i])
        )


def test_per_level_all_levels_fit(rng):
    """When every level fits inside M (stage 1 keeps whole levels) the
    per-level path must still equal the one-shot path exactly."""
    from object_detector_tpu.kernels.nms_pallas import (
        pallas_decode_nms,
        pallas_decode_nms_levels,
    )

    shapes = ((4, 4, 4), (2, 2, 6))
    lvl_cls, lvl_box, cls_cat, box_cat, anchors = _random_levels(
        rng, C=3, shapes=shapes
    )
    kw = dict(
        score_threshold=0.01, iou_threshold=0.45, pre_nms_top_k=64,
        max_detections=10, max_per_class=10, exact_prefilter=True,
        interpret=True,
    )
    det_cat = pallas_decode_nms(cls_cat, box_cat, anchors, **kw)
    det_lvl = pallas_decode_nms_levels(
        tuple(lvl_cls), tuple(lvl_box), anchors,
        tuple(s[2] for s in shapes), **kw
    )
    for i in range(cls_cat.shape[0]):
        assert _as_set(
            type(det_cat)(det_cat.boxes[i], det_cat.scores[i],
                          det_cat.classes[i], det_cat.valid[i])
        ) == _as_set(
            type(det_lvl)(det_lvl.boxes[i], det_lvl.scores[i],
                          det_lvl.classes[i], det_lvl.valid[i])
        )
