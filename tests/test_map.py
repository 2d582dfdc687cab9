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
