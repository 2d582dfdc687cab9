"""CLI surface tests: parser, config overrides, preset wiring."""

import pytest

from object_detector_tpu.cli.main import _parse_overrides, build_parser
from object_detector_tpu.core.config import get_config, list_presets


def test_all_presets_build():
    for name in list_presets():
        cfg = get_config(name)
        assert cfg.name == name
        assert cfg.anchors.num_anchors > 0


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(["train", "--preset", "ssd300_voc_train_dp8", "--steps", "10"])
    assert args.command == "train" and args.steps == 10
    args = p.parse_args(["predict", "--image", "x.jpg"])
    assert args.command == "predict"
    args = p.parse_args(["evaluate", "--checkpoint", "c"])
    assert args.command == "evaluate"


def test_overrides_parse_types():
    got = _parse_overrides(["train.base_lr=3e-3", "model.num_classes=80", "data.root=/x y"])
    assert got["train.base_lr"] == 3e-3
    assert got["model.num_classes"] == 80
    assert got["data.root"] == "/x y"


def test_override_applies_nested():
    cfg = get_config("ssd300_vgg16_voc").override({"train.base_lr": 0.5})
    assert cfg.train.base_lr == 0.5


def test_override_rejects_unknown_field():
    with pytest.raises(KeyError):
        get_config("ssd300_vgg16_voc").override({"train.nonexistent": 1})
