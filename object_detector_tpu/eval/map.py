"""mAP evaluators — VOC07 (11-point), VOC10 (continuous), COCO (.5:.95).

Host-side numpy reduce over accumulated detections (SURVEY.md §3.3: the
inference sweep is the hot loop; this reduce is cheap). Detections arrive as
normalized corner boxes + scores + 0-based class ids per image.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np


def _iou_single(box: np.ndarray, others: np.ndarray) -> np.ndarray:
    if len(others) == 0:
        return np.zeros((0,), np.float64)
    xx1 = np.maximum(box[0], others[:, 0])
    yy1 = np.maximum(box[1], others[:, 1])
    xx2 = np.minimum(box[2], others[:, 2])
    yy2 = np.minimum(box[3], others[:, 3])
    inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (others[:, 2] - others[:, 0]) * (others[:, 3] - others[:, 1])
    union = a + b - inter
    return np.where(union > 0, inter / union, 0.0)


def _average_precision(recall: np.ndarray, precision: np.ndarray, style: str) -> float:
    if style == "voc07":
        # 11-point interpolation (VOC2007 devkit convention).
        ap = 0.0
        for t in np.linspace(0.0, 1.0, 11):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    # Continuous: area under the monotone precision envelope.
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _class_ap(
    detections: List[Tuple[str, float, np.ndarray]],  # (image_id, score, box)
    gts: Mapping[str, np.ndarray],  # image_id -> (G, 4)
    gt_difficult: Mapping[str, np.ndarray],  # image_id -> (G,) bool
    iou_threshold: float,
    style: str,
) -> float | None:
    npos = sum(int((~d).sum()) for d in gt_difficult.values())
    if npos == 0:
        return None  # class absent from this split
    detections = sorted(detections, key=lambda d: -d[1])
    matched: Dict[str, np.ndarray] = {
        k: np.zeros(len(v), bool) for k, v in gts.items()
    }
    tp = np.zeros(len(detections))
    fp = np.zeros(len(detections))
    for i, (img_id, _, box) in enumerate(detections):
        gt_boxes = gts.get(img_id, np.zeros((0, 4)))
        ious = _iou_single(box, gt_boxes)
        j = int(np.argmax(ious)) if len(ious) else -1
        if j >= 0 and ious[j] >= iou_threshold:
            if gt_difficult[img_id][j]:
                continue  # VOC: difficult GT neither TP nor FP
            if not matched[img_id][j]:
                matched[img_id][j] = True
                tp[i] = 1
            else:
                fp[i] = 1  # duplicate detection
        else:
            fp[i] = 1
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / npos
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    return _average_precision(recall, precision, style)


class MeanAPEvaluator:
    """Accumulate per-image detections + GT; compute (m)AP at the end.

    add_image(image_id, det_boxes, det_scores, det_classes,
              gt_boxes, gt_labels, gt_difficult) with 0-based det classes
    and 1-based gt labels (matching the data layer convention).
    """

    def __init__(self, num_classes: int, style: str = "voc07"):
        self.num_classes = num_classes
        self.style = style
        self._dets: Dict[int, List[Tuple[str, float, np.ndarray]]] = defaultdict(list)
        self._gts: Dict[int, Dict[str, np.ndarray]] = defaultdict(dict)
        self._diff: Dict[int, Dict[str, np.ndarray]] = defaultdict(dict)
        self._images: set = set()

    def add_image(
        self,
        image_id: str,
        det_boxes: np.ndarray,
        det_scores: np.ndarray,
        det_classes: np.ndarray,
        gt_boxes: np.ndarray,
        gt_labels: np.ndarray,
        gt_difficult: np.ndarray | None = None,
    ) -> None:
        if image_id in self._images:
            raise ValueError(f"duplicate image_id {image_id}")
        self._images.add(image_id)
        if gt_difficult is None:
            gt_difficult = np.zeros(len(gt_labels), bool)
        for c in range(self.num_classes):
            sel = det_classes == c
            for score, box in zip(det_scores[sel], det_boxes[sel]):
                self._dets[c].append((image_id, float(score), np.asarray(box)))
            gsel = gt_labels == (c + 1)
            self._gts[c][image_id] = np.asarray(gt_boxes)[gsel]
            self._diff[c][image_id] = np.asarray(gt_difficult)[gsel]

    def result(self, iou_threshold: float = 0.5) -> Dict[str, float]:
        if self.style == "coco":
            return self._coco_result()
        aps = []
        per_class = {}
        for c in range(self.num_classes):
            ap = _class_ap(
                self._dets[c], self._gts[c], self._diff[c], iou_threshold, self.style
            )
            if ap is not None:
                aps.append(ap)
                per_class[f"ap/class_{c}"] = ap
        out = {"mAP": float(np.mean(aps)) if aps else 0.0}
        out.update(per_class)
        return out

    def _coco_result(self) -> Dict[str, float]:
        thresholds = np.arange(0.5, 1.0, 0.05)
        maps = []
        for t in thresholds:
            aps = []
            for c in range(self.num_classes):
                ap = _class_ap(self._dets[c], self._gts[c], self._diff[c], t, "voc10")
                if ap is not None:
                    aps.append(ap)
            maps.append(float(np.mean(aps)) if aps else 0.0)
        return {
            "mAP": float(np.mean(maps)),
            "AP50": maps[0],
            "AP75": maps[5],
        }
