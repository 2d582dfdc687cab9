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
from object_detector_tpu.ops.postprocess import postprocess, postprocess_levels


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


def make_int8_predict_fn(
    cfg: DetectorConfig,
    variables: Any,
    anchors_center: np.ndarray,
    calibration_images_u8: np.ndarray,
    use_pallas: Optional[bool] = None,
):
    """Quantize once (PTQ) and return a jitted uint8-images -> Detections fn.

    The production serving path (quant/engine.py): int8 trunk + int8 heads.
    `calibration_images_u8` is a small representative uint8 batch.
    """
    from object_detector_tpu.quant import engine as qengine

    anchors_const = jnp.asarray(anchors_center)
    calib = aug_ops.normalize(
        jnp.asarray(calibration_images_u8).astype(jnp.float32) / 255.0
    )
    if cfg.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
        forward = qengine.retinanet_int8_forward
        int8_fpn = "fpn/lateral3" in qp.w_int8
    else:
        qp, spec = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
        int8_fpn = True
    qp = jax.device_put(qp)
    pallas = cfg.eval.use_pallas_nms if use_pallas is None else use_pallas
    per_level = cfg.eval.per_level_heads and pallas and int8_fpn

    @jax.jit
    def predict(images_u8):
        images = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
        if per_level:
            cls_lvls, box_lvls = forward(qp, spec, cfg, images,
                                         concat_heads=False)
            return postprocess_levels(cls_lvls, box_lvls, anchors_const, cfg)
        cls_logits, box_offsets = forward(qp, spec, cfg, images)
        return postprocess(cls_logits, box_offsets, anchors_const, cfg, use_pallas)

    return predict


def evaluate_dataset(
    cfg: DetectorConfig,
    model: Any,
    variables: Any,
    dataset: Dataset,
    cache: Optional[DecodedCache] = None,
    use_pallas: Optional[bool] = None,
    int8: bool = False,
) -> Dict[str, float]:
    """Run the val sweep and return the mAP dict for cfg.eval.map_style."""
    if cache is None:
        cache = DecodedCache(
            dataset, cfg.model.image_size, cfg.data.max_boxes, cfg.data.num_workers,
            max_ram_bytes=int(cfg.data.max_cache_ram_gb * 2**30),
            spill_dir=cfg.data.cache_spill_dir or None,
        )
    anchors = _anchors_for(cfg)
    if int8:
        n_calib = min(len(cache), cfg.eval.batch_size)
        int8_predict = make_int8_predict_fn(
            cfg, variables, anchors, cache.images[:n_calib], use_pallas
        )
        predict = lambda _v, imgs: int8_predict(imgs)  # noqa: E731
    else:
        predict = make_predict_fn(cfg, model, anchors, use_pallas)
    evaluator = MeanAPEvaluator(dataset.num_classes, cfg.eval.map_style)

    bs = cfg.eval.batch_size
    n = len(dataset)
    # Static batch shape: the final partial batch OVERLAPS the previous one
    # (start = n - bs) instead of padding with repeats, so every device row
    # is a real image; already-processed rows are skipped host-side.
    starts = list(range(0, n, bs))
    if n >= bs and starts and starts[-1] + bs > n:
        starts[-1] = n - bs
    done = 0
    for start in starts:
        idx = np.arange(start, min(start + bs, n))
        pad = bs - len(idx)  # only when the whole dataset is < one batch
        padded_idx = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
        batch = cache.gather(padded_idx)
        det = predict(variables, jnp.asarray(batch["image"]))
        det = jax.device_get(det)
        for row, record_i in enumerate(idx):
            if record_i < done:
                continue  # overlap row already evaluated
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
                gt_crowd=rec.crowd_mask,
                image_size=(rec.width, rec.height),
            )
        done = int(idx[-1]) + 1
    return evaluator.result()


def _anchors_for(cfg: DetectorConfig) -> np.ndarray:
    from object_detector_tpu.anchors.priors import anchors_for_model

    return anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
