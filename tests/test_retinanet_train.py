"""RetinaNet train-step smoke: loss decreases on a fixed batch (CPU)."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import retinanet_anchors
from object_detector_tpu.core.config import (
    DataConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
    retinanet_anchor_config,
)
from object_detector_tpu.train.loop import init_model_state
from object_detector_tpu.train.step import make_train_step


@pytest.mark.slowest
def test_retinanet_overfit_smoke():
    size = 128
    cfg = DetectorConfig(
        name="retinanet_tiny",
        model=ModelConfig(
            family="retinanet", backbone="resnet50", image_size=size,
            num_classes=3, fpn_channels=32, head_depth=1,
            compute_dtype="float32",
        ),
        anchors=retinanet_anchor_config(size),
        data=DataConfig(dataset="synthetic", max_boxes=4),
        train=TrainConfig(batch_size=2, num_steps=10, warmup_steps=0,
                          base_lr=1e-2, optimizer="sgd"),
    )
    model, state = init_model_state(cfg, jax.random.key(0))
    anchors = retinanet_anchors(size)
    assert cfg.anchors.num_anchors == anchors.shape[0]
    step_fn = make_train_step(cfg, model, anchors, mesh=None, augment=False)

    rng = np.random.default_rng(0)
    m = cfg.data.max_boxes
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8)),
        "boxes": jnp.tile(jnp.array([[[0.2, 0.2, 0.7, 0.7]]]), (2, m, 1)),
        "labels": jnp.ones((2, m), jnp.int32),
        "valid": jnp.asarray(np.tile(np.arange(m) < 1, (2, 1))),
    }
    losses = []
    key = jax.random.key(1)
    for _ in range(12):
        state, metrics = step_fn(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"retinanet not learning: {losses[:3]} -> {losses[-3:]}"
    # BatchNorm stats must have updated through the step.
    assert state.batch_stats, "resnet batch_stats missing from train state"
