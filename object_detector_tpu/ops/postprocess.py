"""Raw head outputs -> final detections (decode + score + per-class NMS).

This is the inference postprocessor (SURVEY.md §2 component #11). The whole
path is jittable and batched; on TPU the NMS stage can run through the
Pallas kernel (EvalConfig.use_pallas_nms), elsewhere through ops/nms.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.ops import boxes as box_ops
from object_detector_tpu.ops import nms as nms_ops

Array = jnp.ndarray


def scores_from_logits(cls_logits: Array, family: str) -> Array:
    """(B, A, C[+1]) logits -> (B, A, C) foreground probabilities."""
    if family == "retinanet" or cls_logits.shape[-1] == 0:
        return jax.nn.sigmoid(cls_logits)
    # SSD softmax head has background at index 0; sigmoid heads don't.
    # We standardize on sigmoid (one-vs-all) heads for both families — the
    # C+1 softmax path is kept for the hard-negative-mining trainer.
    return jax.nn.sigmoid(cls_logits)


def postprocess(
    cls_logits: Array,  # (B, A, C)
    box_offsets: Array,  # (B, A, 4)
    anchors_center: Array,  # (A, 4)
    cfg: DetectorConfig,
    use_pallas: bool | None = None,
) -> nms_ops.Detections:
    """Batched decode -> per-class NMS. Returns batch-stacked Detections."""
    if use_pallas is None:
        use_pallas = cfg.eval.use_pallas_nms
    if use_pallas:
        # Fused candidate-sparse path: prefilter on raw logits, then
        # sigmoid + decode only the gathered candidates; batch folded into
        # kernel rows — no vmap.
        from object_detector_tpu.kernels.nms_pallas import pallas_decode_nms

        # cls_logits pass through at their native dtype: when the int8
        # heads emit bf16 (EvalConfig.int8_logits_bf16) the class-max
        # prefilter + candidate gather read half the bytes; sigmoid runs
        # in f32 on the gathered candidates inside pallas_decode_nms.
        return pallas_decode_nms(
            cls_logits,
            box_offsets.astype(jnp.float32),
            jnp.asarray(anchors_center),
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            pre_nms_top_k=cfg.eval.pre_nms_top_k,
            max_detections=cfg.eval.max_detections,
            max_per_class=cfg.eval.nms_max_per_class,
            center_variance=cfg.anchors.center_variance,
            size_variance=cfg.anchors.size_variance,
            exact_prefilter=cfg.eval.nms_exact_prefilter,
            recall_target=cfg.eval.nms_recall_target,
            packed_sort=cfg.eval.nms_packed_sort,
            class_top_k=cfg.eval.nms_class_top_k,
            coord_bf16=cfg.eval.nms_coord_bf16,
        )

    scores = scores_from_logits(cls_logits.astype(jnp.float32), cfg.model.family)
    decoded = box_ops.decode(
        box_offsets.astype(jnp.float32),
        anchors_center,
        cfg.anchors.center_variance,
        cfg.anchors.size_variance,
        clip=True,
    )  # (B, A, 4)
    nms_fn = partial(
        nms_ops.per_class_nms,
        score_threshold=cfg.eval.score_threshold,
        iou_threshold=cfg.eval.nms_iou_threshold,
        pre_nms_top_k=cfg.eval.pre_nms_top_k,
        max_detections=cfg.eval.max_detections,
    )
    return jax.vmap(nms_fn)(decoded, scores)


def postprocess_levels(
    level_logits,  # per level: (B, H, W, a*C) head-native raw logits
    level_offsets,  # per level: (B, H, W, a*4) box offsets
    anchors_center: Array,  # (A, 4) full level-major anchor set
    cfg: DetectorConfig,
) -> nms_ops.Detections:
    """Per-level decode -> NMS: consumes the heads' native per-level
    tensors so the concatenated (B, A, C) logits (251 MB bf16 at
    SSD-512/COCO bs=64, ~2.8 ms to assemble — r3 HLO profile) never
    exist. Exact same candidate set as `postprocess` with use_pallas=True
    (two-stage exact prefilter; see pallas_decode_nms_levels). Pallas
    path only — pair with EvalConfig.per_level_heads.

    STATUS (r3, v5e-1, chip_logs/per_level_ab.log): MEASURED LOSS —
    0.90x SSD-300, 0.93x SSD-512, 1.01x RetinaNet vs the concat path
    with exact stage-1 sorts, and still 0.91x/0.95x with approx_max_k
    stage 1 after the COCO prefilter flip (oracle-parity clean both
    times). The per-level selection machinery (per-level top-k + local
    gathers + anchor-slot masked reduces) costs more than the (B, A, C)
    assembly it avoids in both regimes. Kept off-default as the
    documented negative result."""
    from object_detector_tpu.kernels.nms_pallas import pallas_decode_nms_levels

    return pallas_decode_nms_levels(
        tuple(level_logits),
        tuple(l.astype(jnp.float32) for l in level_offsets),
        jnp.asarray(anchors_center),
        tuple(cfg.anchors.anchors_per_level),
        score_threshold=cfg.eval.score_threshold,
        iou_threshold=cfg.eval.nms_iou_threshold,
        pre_nms_top_k=cfg.eval.pre_nms_top_k,
        max_detections=cfg.eval.max_detections,
        max_per_class=cfg.eval.nms_max_per_class,
        center_variance=cfg.anchors.center_variance,
        size_variance=cfg.anchors.size_variance,
        exact_prefilter=cfg.eval.nms_exact_prefilter,
        recall_target=cfg.eval.nms_recall_target,
        packed_sort=cfg.eval.nms_packed_sort,
        class_top_k=cfg.eval.nms_class_top_k,
        coord_bf16=cfg.eval.nms_coord_bf16,
    )
