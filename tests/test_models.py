"""Model assembly smoke tests: output shapes match anchor layouts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_tpu.anchors.priors import anchors_for_model, retinanet_anchors
from object_detector_tpu.core.config import (
    DetectorConfig,
    ModelConfig,
    retinanet_anchor_config,
    tiny_test_config,
)
from object_detector_tpu.models.retinanet import RetinaNetModel, build_model
from object_detector_tpu.models.ssd import SSDModel


def test_tiny_ssd_shapes():
    cfg = tiny_test_config()
    model = SSDModel(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    cls, box = model.apply(variables, x, train=False)
    assert cls.shape == (2, cfg.anchors.num_anchors, 3)
    assert box.shape == (2, cfg.anchors.num_anchors, 4)


def test_tiny_ssd_class_prior_bias():
    cfg = tiny_test_config()
    model = SSDModel(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    cls, _ = model.apply(variables, x, train=False)
    p = jax.nn.sigmoid(np.asarray(cls))
    # Focal-style bias init: background prior ~0.01 at init.
    assert 0.001 < p.mean() < 0.05


def test_retinanet_shapes_small():
    size = 256
    cfg = DetectorConfig(
        name="retinanet_small",
        model=ModelConfig(
            family="retinanet", backbone="resnet50", image_size=size,
            num_classes=4, fpn_channels=32, head_depth=1,
            compute_dtype="float32",
        ),
        anchors=retinanet_anchor_config(size),
    )
    model = build_model(cfg)
    assert isinstance(model, RetinaNetModel)
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    cls, box = model.apply(variables, x, train=False)
    expected = retinanet_anchors(size).shape[0]
    assert cls.shape == (1, expected, 4)
    assert box.shape == (1, expected, 4)
    assert cfg.anchors.num_anchors == expected


def test_resnet_batch_stats_update():
    size = 256
    cfg = DetectorConfig(
        model=ModelConfig(
            family="retinanet", backbone="resnet50", image_size=size,
            num_classes=2, fpn_channels=32, head_depth=1,
            compute_dtype="float32",
        ),
        anchors=retinanet_anchor_config(size),
    )
    model = build_model(cfg)
    x = jnp.ones((2, size, size, 3))
    variables = model.init(jax.random.key(0), x, train=True)
    assert "batch_stats" in variables
    (_, _), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "BatchNorm running stats did not update in train mode"
