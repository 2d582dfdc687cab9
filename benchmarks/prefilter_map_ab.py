"""Full-eval mAP parity A/B: exact vs approx NMS prefilter (ADVICE r3 #2).

The COCO presets (SSD-512, RetinaNet) ship nms_exact_prefilter=False
(approx_max_k, recall_target 0.95). The r3 evidence for that flip was
zero top-20 score deviation on a check corpus — a proxy. This harness runs
the FULL eval pipeline (synthetic corpus -> int8 serving path -> COCO-style
mAP) twice per preset, identical except for the prefilter, and reports
every mAP metric side by side.

Random-init weights make the score field near-uniform around the class
prior (~1% of anchors above threshold, dense near-ties) — the ADVERSARIAL
case for an approximate top-k, since ties straddle the recall boundary.
A trained model's sparse, well-separated scores are strictly easier.

    python benchmarks/prefilter_map_ab.py            # both presets
    python benchmarks/prefilter_map_ab.py --preset retinanet_fpn_coco
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from object_detector_tpu.core.config import get_config
from object_detector_tpu.data.synthetic import make_synthetic_dataset
from object_detector_tpu.eval.evaluator import evaluate_dataset
from object_detector_tpu.models.retinanet import build_model


def run_preset(preset: str, num_images: int) -> dict:
    results = {}
    for exact in (True, False):
        cfg = get_config(preset).override({
            "eval.nms_exact_prefilter": exact,
            # Synthetic corpus has 3 classes; both arms share the override
            # so the ONLY difference is the prefilter. The prefilter itself
            # operates on the class-agnostic (B, A) max — anchor counts
            # (A=24564 / 49104) are the preset's real ones.
            "model.num_classes": 3,
        })
        dataset = make_synthetic_dataset(
            num_images=num_images, image_size=cfg.model.image_size,
            max_objects=4, seed=7,
        )
        s = cfg.model.image_size
        model = build_model(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False
        )
        m = evaluate_dataset(cfg, model, variables, dataset, int8=True)
        results["exact" if exact else "approx"] = m
        dets = _collect_detections(cfg, model, variables, dataset)
        results[("exact" if exact else "approx") + "_dets"] = dets
        print(f"[{preset}] exact_prefilter={exact}: "
              f"{json.dumps({k: round(v, 6) for k, v in m.items()})}",
              flush=True)
    det_cmp = _compare_detections(
        results.pop("exact_dets"), results.pop("approx_dets")
    )
    print(f"[{preset}] detection-level diff: {json.dumps(det_cmp)}",
          flush=True)
    keys = sorted(set(results["exact"]) & set(results["approx"]))
    diffs = {k: abs(results["exact"][k] - results["approx"][k]) for k in keys}
    worst = max(diffs, key=diffs.get) if diffs else None
    summary = {
        "preset": preset,
        "max_abs_map_diff": max(diffs.values()) if diffs else None,
        "worst_metric": worst,
        "detection_diff": det_cmp,
        "exact": results["exact"],
        "approx": results["approx"],
    }
    print(json.dumps(summary), flush=True)
    return summary


def _collect_detections(cfg, model, variables, dataset):
    """Raw valid detections (boxes, scores, classes) for every image.

    Detection-level comparison is strictly more sensitive than mAP: the
    adversarial random-init corpus scores mAP 0.0 in BOTH arms (no
    detection overlaps GT), which proves nothing — while a per-detection
    diff catches any candidate the approx prefilter drops or reorders.
    """
    import numpy as np

    from object_detector_tpu.anchors.priors import anchors_for_model
    from object_detector_tpu.data.pipeline import DecodedCache
    from object_detector_tpu.eval.evaluator import make_int8_predict_fn

    s = cfg.model.image_size
    anchors = anchors_for_model(cfg.model.family, cfg.anchors, s)
    cache = DecodedCache(dataset, s, cfg.data.max_boxes, num_workers=2)
    idx = np.arange(len(dataset))
    batch = cache.gather(idx)
    images = jnp.asarray(batch["image"])
    predict = make_int8_predict_fn(cfg, variables, anchors, batch["image"][:8])
    out = []
    bs = cfg.eval.batch_size
    for i in range(0, len(idx), bs):
        chunk = images[i:i + bs]
        if chunk.shape[0] < bs:  # pad tail
            pad = bs - chunk.shape[0]
            chunk = jnp.concatenate([chunk, chunk[:pad]], 0)[:bs]
        det = predict(chunk)
        out.append(jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid)
        ))
    return out


def _compare_detections(a_list, b_list):
    import numpy as np

    n_total = n_valid_mismatch = n_cell_diff = 0
    max_dscore = 0.0
    max_dbox = 0.0
    for (ab, asr, ac, av), (bb, bsr, bc, bv) in zip(a_list, b_list):
        n_total += int(av.sum())
        n_valid_mismatch += int((av != bv).sum())
        both = av & bv
        n_cell_diff += int((both & ((ac != bc) |
                            (np.abs(asr - bsr) > 1e-6))).sum())
        if both.any():
            max_dscore = max(max_dscore,
                             float(np.abs((asr - bsr))[both].max()))
            max_dbox = max(max_dbox,
                           float(np.abs((ab - bb))[both].max()))
    return {
        "total_valid_dets_exact": n_total,
        "valid_mask_mismatches": n_valid_mismatch,
        "paired_class_or_score_diffs": n_cell_diff,
        "max_abs_score_diff": round(max_dscore, 8),
        "max_abs_box_coord_diff": round(max_dbox, 8),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None,
                    help="one preset (default: both COCO presets)")
    ap.add_argument("--num-images", type=int, default=64)
    args = ap.parse_args()
    presets = (
        [args.preset] if args.preset
        else ["ssd512_resnet50_coco", "retinanet_fpn_coco"]
    )
    out = [run_preset(p, args.num_images) for p in presets]
    print(json.dumps({"prefilter_map_ab": out}))


if __name__ == "__main__":
    main()
