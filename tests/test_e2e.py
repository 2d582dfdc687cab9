"""End-to-end integration (SURVEY.md §4): tiny synthetic train -> mAP > 0
-> checkpoint resume -> single-image predict. Exercises the real training
loop (prefetcher, sharded step, orbax, metrics), evaluator, and Predictor.
"""

import json
import os

import jax
import numpy as np
import pytest

# Whole module rides a 60-step training fixture (~3.5 min on this 1-CPU
# host) — slow tier; run with --runslow.
pytestmark = pytest.mark.slow

from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.data.synthetic import make_synthetic_dataset
from object_detector_tpu.eval.evaluator import evaluate_dataset
from object_detector_tpu.models.retinanet import build_model
from object_detector_tpu.train.loop import train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cfg = tiny_test_config()
    cfg = cfg.override({
        "train.num_steps": 60,
        "train.base_lr": 5e-3,
        "train.checkpoint_every": 30,
        "data.augment.crop_prob": 0.0,       # keep tiny-run signal clean
        "data.augment.expand_prob": 0.0,
    })
    dataset = make_synthetic_dataset(num_images=16, image_size=cfg.model.image_size)
    metrics_path = str(root / "metrics.jsonl")
    state = train(
        cfg,
        dataset,
        metrics_path=metrics_path,
        checkpoint_dir=str(root / "ckpt"),
    )
    return cfg, dataset, state, root, metrics_path


def test_training_loss_decreases(trained):
    _, _, _, _, metrics_path = trained
    rows = [json.loads(line) for line in open(metrics_path)]
    losses = [r["loss"] for r in rows if r["kind"] == "train"]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_eval_map_positive(trained):
    cfg, dataset, state, _, _ = trained
    model = build_model(cfg)
    variables = {"params": state.params}
    result = evaluate_dataset(cfg, model, variables, dataset)
    assert result["mAP"] > 0.05, f"synthetic mAP too low: {result}"


def test_resume_from_checkpoint(trained):
    cfg, dataset, state, root, _ = trained
    cfg2 = cfg.override({"train.num_steps": 70})
    state2 = train(
        cfg2,
        dataset,
        resume=True,
        checkpoint_dir=str(root / "ckpt"),
    )
    assert int(state2.step) == 70
    # Resumed run continued from the saved params, not a fresh init.
    assert int(state.step) == 60


def test_int8_eval_matches_float(trained):
    """mAP parity of the int8 PTQ engine on the TRAINED model — the
    closest available analogue of the BASELINE ±0.3 mAP tolerance."""
    cfg, dataset, state, _, _ = trained
    model = build_model(cfg)
    variables = {"params": state.params}
    float_map = evaluate_dataset(cfg, model, variables, dataset)["mAP"]
    int8_map = evaluate_dataset(cfg, model, variables, dataset, int8=True)["mAP"]
    # A 60-step tiny model keeps every detection marginal (scores ~0.2-0.5),
    # which is the worst case for PTQ: tiny logit shifts flip borderline
    # matches. Measured delta ~0.04 here; converged models sit well under
    # the BASELINE ±0.3. Bound guards against gross quantization breakage.
    assert abs(float_map - int8_map) < 0.08, (float_map, int8_map)
    assert int8_map > 0.3, f"int8 path collapsed: {int8_map}"


def test_predictor_on_synthetic(trained):
    cfg, dataset, state, root, _ = trained
    from object_detector_tpu.cli.predictor import Predictor
    from object_detector_tpu.data.synthetic import render_synthetic_image

    predictor = Predictor(
        cfg, {"params": state.params}, class_names=dataset.class_names
    )
    img = render_synthetic_image(dataset.records[0], cfg.model.image_size)
    out_path = str(root / "pred.png")
    dets = predictor.predict_array(img, score_threshold=0.2)
    # Trained-for-60-steps model: just require the API works end to end and
    # boxes are in-image.
    for d in dets:
        assert 0 <= d.box[0] <= img.shape[1] and 0 <= d.box[3] <= img.shape[0]
        assert d.class_name in dataset.class_names
