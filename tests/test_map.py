"""Unit tests: VOC07/continuous AP vs tiny hand-checked PR curves."""

import numpy as np

from object_detector_tpu.eval.map import MeanAPEvaluator, _average_precision


def test_perfect_detection_ap_is_one():
    ev = MeanAPEvaluator(num_classes=2, style="voc07")
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    ev.add_image("a", gt, np.array([0.9]), np.array([0]), gt, np.array([1]))
    res = ev.result()
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_missed_detection_ap_is_zero():
    ev = MeanAPEvaluator(num_classes=1, style="voc07")
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    ev.add_image(
        "a",
        np.array([[0.6, 0.6, 0.9, 0.9]], np.float32),  # no overlap
        np.array([0.9]),
        np.array([0]),
        gt,
        np.array([1]),
    )
    assert ev.result()["mAP"] == 0.0


def test_duplicate_detections_are_fp():
    ev = MeanAPEvaluator(num_classes=1, style="voc10")
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    dets = np.tile(gt, (2, 1))
    ev.add_image("a", dets, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([1]))
    # P-R: tp at rank1 (P=1, R=1), fp at rank2 -> AP (continuous) = 1.0
    assert abs(ev.result()["mAP"] - 1.0) < 1e-6


def test_half_recall_voc07():
    ev = MeanAPEvaluator(num_classes=1, style="voc07")
    gt = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.8, 0.8]], np.float32)
    ev.add_image("a", gt[:1], np.array([0.9]), np.array([0]), gt, np.array([1, 1]))
    # recall 0.5 with precision 1: 11-pt AP = 6/11.
    assert abs(ev.result()["mAP"] - 6 / 11) < 1e-6


def test_difficult_gt_not_counted():
    ev = MeanAPEvaluator(num_classes=1, style="voc07")
    gt = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.8, 0.8]], np.float32)
    difficult = np.array([False, True])
    ev.add_image("a", gt[:1], np.array([0.9]), np.array([0]), gt, np.array([1, 1]), difficult)
    assert abs(ev.result()["mAP"] - 1.0) < 1e-6  # only 1 non-difficult GT


def test_crowd_gt_ignored_in_voc_styles():
    """COCO crowd regions evaluated under a VOC style must act like
    difficult boxes (ignored), not ordinary GT (ADVICE r2): one clean GT
    matched perfectly + one crowd region => mAP 1.0, and a detection on
    the crowd region is not an FP."""
    for style in ("voc07", "voc10"):
        ev = MeanAPEvaluator(num_classes=1, style=style)
        gt = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]], np.float32)
        crowd = np.array([False, True])
        dets = gt  # one det on the clean GT, one on the crowd region
        ev.add_image(
            "a", dets, np.array([0.9, 0.8]), np.array([0, 0]),
            gt, np.array([1, 1]), gt_crowd=crowd,
        )
        assert abs(ev.result()["mAP"] - 1.0) < 1e-6, style


def test_average_precision_styles_disagree_correctly():
    recall = np.array([0.5])
    precision = np.array([1.0])
    assert abs(_average_precision(recall, precision, "voc07") - 6 / 11) < 1e-9
    assert abs(_average_precision(recall, precision, "voc10") - 0.5) < 1e-9


def test_coco_style_runs():
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    ev.add_image("a", gt, np.array([0.9]), np.array([0]), gt, np.array([1]))
    res = ev.result()
    assert abs(res["mAP"] - 1.0) < 1e-6 and res["AP50"] == res["AP75"] == 1.0


# ---------------------------------------------------------------------------
# COCO protocol (hand-computed oracles; pycocotools not installed here)
# ---------------------------------------------------------------------------

SIZE = (100.0, 100.0)  # image size so normalized boxes -> pixel areas


def test_coco_iou_graded_thresholds():
    # det IoU with GT = 0.72: TP at thresholds .5..:.70 (5 of 10), FP above.
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.1, 0.1]], np.float32)  # 10x10 px
    det = np.array([[0.0, 0.0, 0.1, 0.072]], np.float32)  # inter 72, union 100
    ev.add_image("a", det, np.array([0.9]), np.array([0]), gt, np.array([1]),
                 image_size=SIZE)
    res = ev.result()
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert res["AP75"] == 0.0
    assert abs(res["mAP"] - 0.5) < 1e-6


def test_coco_101_point_interpolation():
    # 2 GT, one TP + one far FP: rc=[0.5,0.5], envelope pr=[1.0,...].
    # 101-pt AP = 51/101 (recall thresholds 0.00..0.50 inclusive hit
    # precision 1.0) — distinguishes from VOC continuous (0.5) and
    # VOC07 11-pt (6/11).
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.1, 0.1], [0.5, 0.5, 0.6, 0.6]], np.float32)
    dets = np.array([[0.0, 0.0, 0.1, 0.1], [0.8, 0.8, 0.9, 0.9]], np.float32)
    ev.add_image("a", dets, np.array([0.9, 0.8]), np.array([0, 0]),
                 gt, np.array([1, 1]), image_size=SIZE)
    res = ev.result()
    assert abs(res["AP50"] - 51 / 101) < 1e-9


def test_coco_ar_maxdets_tiers():
    # 2 GT, 2 perfect dets: AR1 only sees the top-scored det.
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.1, 0.1], [0.5, 0.5, 0.6, 0.6]], np.float32)
    ev.add_image("a", gt, np.array([0.9, 0.8]), np.array([0, 0]),
                 gt, np.array([1, 1]), image_size=SIZE)
    res = ev.result()
    assert abs(res["AR1"] - 0.5) < 1e-9
    assert abs(res["AR10"] - 1.0) < 1e-9
    assert abs(res["AR100"] - 1.0) < 1e-9
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_coco_crowd_absorbs_detections():
    # Crowd IoU = intersection / det area: dets inside the crowd region are
    # ignored (not FP) and one crowd region absorbs multiple dets.
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.5, 0.5], [0.6, 0.6, 0.8, 0.8]], np.float32)
    crowd = np.array([True, False])
    dets = np.array([
        [0.1, 0.1, 0.2, 0.2],   # inside crowd -> ignored
        [0.3, 0.3, 0.45, 0.45], # also inside crowd -> ignored
        [0.6, 0.6, 0.8, 0.8],   # perfect on the real GT
    ], np.float32)
    ev.add_image("a", dets, np.array([0.95, 0.9, 0.8]), np.array([0, 0, 0]),
                 gt, np.array([1, 1]), gt_crowd=crowd, image_size=SIZE)
    res = ev.result()
    assert abs(res["mAP"] - 1.0) < 1e-9, res


def test_coco_without_crowd_handling_would_differ():
    # Control for the crowd test: same dets but the region is a normal GT
    # -> the two inside dets are FPs (IoU vs the big box < 0.5).
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.5, 0.5], [0.6, 0.6, 0.8, 0.8]], np.float32)
    dets = np.array([
        [0.1, 0.1, 0.2, 0.2],
        [0.3, 0.3, 0.45, 0.45],
        [0.6, 0.6, 0.8, 0.8],
    ], np.float32)
    ev.add_image("a", dets, np.array([0.95, 0.9, 0.8]), np.array([0, 0, 0]),
                 gt, np.array([1, 1]), image_size=SIZE)
    res = ev.result()
    assert res["mAP"] < 0.8


def test_coco_area_ranges():
    # 10x10px GT is "small" (<32²); 97x97px GT is "large" (>96²).
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.1, 0.1], [0.01, 0.01, 0.98, 0.98]], np.float32)
    ev.add_image("a", gt, np.array([0.9, 0.8]), np.array([0, 0]),
                 gt, np.array([1, 1]), image_size=SIZE)
    res = ev.result()
    assert abs(res["mAP"] - 1.0) < 1e-9
    assert abs(res["APs"] - 1.0) < 1e-9  # large GT+det ignored in this range
    assert abs(res["APl"] - 1.0) < 1e-9
    assert res["APm"] == 0.0  # no medium GT anywhere -> empty cell


def test_coco_difficult_gt_ignored():
    # VOC-style difficult flags also act as ignore regions in COCO mode.
    ev = MeanAPEvaluator(num_classes=1, style="coco")
    gt = np.array([[0.0, 0.0, 0.1, 0.1], [0.5, 0.5, 0.6, 0.6]], np.float32)
    difficult = np.array([False, True])
    ev.add_image("a", gt[:1], np.array([0.9]), np.array([0]),
                 gt, np.array([1, 1]), gt_difficult=difficult, image_size=SIZE)
    assert abs(ev.result()["mAP"] - 1.0) < 1e-9
