"""Batched inference sweep -> mAP (SURVEY.md §3.3 evaluate stack)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.data.pipeline import DecodedCache
from object_detector_tpu.data.types import Dataset
from object_detector_tpu.eval.map import MeanAPEvaluator
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess


def make_predict_fn(cfg: DetectorConfig, model: Any, anchors_center: np.ndarray,
                    use_pallas: Optional[bool] = None):
    """jitted (variables, uint8 images) -> Detections batch."""
    anchors_const = jnp.asarray(anchors_center)

    @jax.jit
    def predict(variables, images_u8):
        images = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
        cls_logits, box_offsets = model.apply(variables, images, train=False)
        return postprocess(cls_logits, box_offsets, anchors_const, cfg, use_pallas)

    return predict


def evaluate_dataset(
    cfg: DetectorConfig,
    model: Any,
    variables: Any,
    dataset: Dataset,
    cache: Optional[DecodedCache] = None,
    use_pallas: Optional[bool] = None,
) -> Dict[str, float]:
    """Run the val sweep and return the mAP dict for cfg.eval.map_style."""
    if cache is None:
        cache = DecodedCache(
            dataset, cfg.model.image_size, cfg.data.max_boxes, cfg.data.num_workers
        )
    anchors = _anchors_for(cfg)
    predict = make_predict_fn(cfg, model, anchors, use_pallas)
    evaluator = MeanAPEvaluator(dataset.num_classes, cfg.eval.map_style)

    bs = cfg.eval.batch_size
    n = len(dataset)
    for start in range(0, n, bs):
        idx = np.arange(start, min(start + bs, n))
        pad = bs - len(idx)
        padded_idx = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
        batch = cache.gather(padded_idx)
        det = predict(variables, jnp.asarray(batch["image"]))
        det = jax.device_get(det)
        for row, record_i in enumerate(idx):
            rec = dataset.records[record_i]
            keep = det.valid[row]
            evaluator.add_image(
                rec.image_id,
                det.boxes[row][keep],
                det.scores[row][keep],
                det.classes[row][keep],
                rec.boxes,
                rec.labels,
                rec.difficult,
            )
    return evaluator.result()


def _anchors_for(cfg: DetectorConfig) -> np.ndarray:
    from object_detector_tpu.anchors.priors import anchors_for_model

    return anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
