"""CLI entry points mirroring the reference surface (BASELINE: train,
predict-on-image, evaluate-mAP).

    python -m object_detector_tpu train    --preset ssd300_voc_train_dp8 --data-root /data/VOCdevkit
    python -m object_detector_tpu predict  --preset ssd300_vgg16_voc --checkpoint ckpt/ --image dog.jpg --output out.jpg
    python -m object_detector_tpu evaluate --preset ssd300_vgg16_voc --checkpoint ckpt/ --data-root /data/VOCdevkit

Config fields are overridable with --set train.base_lr=3e-3 (repeatable).
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from typing import Any, Dict, List

from object_detector_tpu.core.config import DetectorConfig, get_config, list_presets


def _parse_overrides(pairs: List[str]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        if not raw:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        try:
            out[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            out[key] = raw
    return out


def _load_config(args: argparse.Namespace) -> DetectorConfig:
    cfg = get_config(args.preset)
    overrides = _parse_overrides(args.set or [])
    if getattr(args, "data_root", None):
        overrides.setdefault("data.root", args.data_root)
    return cfg.override(overrides)


def _load_dataset(cfg: DetectorConfig, split: str):
    if cfg.data.dataset == "voc":
        from object_detector_tpu.data.voc import load_voc

        return load_voc(cfg.data.root, split)
    if cfg.data.dataset == "coco":
        from object_detector_tpu.data.coco import load_coco

        return load_coco(cfg.data.root, split)
    from object_detector_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(image_size=cfg.model.image_size)


def _restore_variables(cfg: DetectorConfig, checkpoint_dir: str):
    import jax

    from object_detector_tpu.train.checkpoint import CheckpointManager
    from object_detector_tpu.train.loop import init_model_state

    rng = jax.random.key(0)
    model, state = init_model_state(cfg, rng)
    mgr = CheckpointManager(checkpoint_dir)
    restored = mgr.restore(state, rng)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {checkpoint_dir}")
    state = restored[0]
    params = state.ema_params if state.ema_params is not None else state.params
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, variables


def cmd_train(args: argparse.Namespace) -> int:
    from object_detector_tpu.parallel.mesh import maybe_init_distributed
    from object_detector_tpu.train.loop import train

    maybe_init_distributed()
    cfg = _load_config(args)
    dataset = _load_dataset(cfg, cfg.data.train_split)
    train(
        cfg,
        dataset,
        num_steps=args.steps,
        metrics_path=args.metrics,
        resume=args.resume,
        checkpoint_dir=args.checkpoint,
        profile_dir=args.profile,
    )
    return 0


def cmd_predict(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    from object_detector_tpu.cli.predictor import Predictor

    if args.checkpoint:
        _, variables = _restore_variables(cfg, args.checkpoint)
    else:  # random weights — smoke mode
        import jax

        from object_detector_tpu.train.loop import init_model_state

        _, state = init_model_state(cfg, jax.random.key(0))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

    class_names = None
    if cfg.data.dataset == "voc":
        from object_detector_tpu.data.voc import VOC_CLASSES

        class_names = VOC_CLASSES
    predictor = Predictor(cfg, variables, class_names, int8=args.int8)
    dets = predictor.predict_file(args.image, args.score_threshold, args.output)
    for d in dets:
        print(
            json.dumps(
                {
                    "class": d.class_name,
                    "score": round(d.score, 4),
                    "box": [round(float(v), 1) for v in d.box],
                }
            )
        )
    return 0


def cmd_evaluate(args: argparse.Namespace) -> int:
    cfg = _load_config(args)
    from object_detector_tpu.eval.evaluator import evaluate_dataset

    dataset = _load_dataset(cfg, args.split or cfg.data.val_split)
    model, variables = _restore_variables(cfg, args.checkpoint)
    result = evaluate_dataset(cfg, model, variables, dataset, int8=args.int8)
    print(json.dumps(result))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="object_detector_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--preset", default="ssd300_vgg16_voc", choices=list_presets())
        sp.add_argument("--set", action="append", metavar="KEY=VALUE")
        sp.add_argument("--data-root", default=None)

    sp = sub.add_parser("train", help="train a detector")
    common(sp)
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--metrics", default=None, help="JSONL metrics path")
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--profile", default=None, help="jax.profiler trace dir")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("predict", help="detect objects in one image")
    common(sp)
    sp.add_argument("--image", required=True)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--output", default=None, help="draw detections here")
    sp.add_argument("--score-threshold", type=float, default=0.3)
    sp.add_argument("--int8", action="store_true",
                    help="serve through the int8 PTQ engine")
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("evaluate", help="compute mAP on a val split")
    common(sp)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--split", default=None)
    sp.add_argument("--int8", action="store_true",
                    help="serve through the int8 PTQ engine")
    sp.set_defaults(fn=cmd_evaluate)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
