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


@pytest.mark.slow  # ~20 s of XLA:CPU compile; knob priced on-chip r5
# (chip_logs/r5_pricing_ab.log) — default-tier re-budget, VERDICT r4 #9
def test_remat_block1_identical_values_and_grads():
    """remat_block1 recomputes the same ops in the same dtype, so params,
    forward outputs AND gradients must be bitwise identical to the plain
    path (it changes scheduling/memory, never math)."""
    cfg = tiny_test_config()
    cfg_r = cfg.override({"model.remat_block1": True})
    model_a, model_r = SSDModel(cfg), SSDModel(cfg_r)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 64, 64, 3)), jnp.float32
    )
    va = model_a.init(jax.random.key(0), x)
    vr = model_r.init(jax.random.key(0), x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        va, vr,
    )

    def loss(m, v):
        c, b = m.apply(v, x)
        return jnp.mean(c**2) + jnp.mean(b**2)

    la = jax.jit(lambda v: loss(model_a, v))(va)
    lr = jax.jit(lambda v: loss(model_r, v))(vr)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lr))
    ga = jax.jit(jax.grad(lambda v: loss(model_a, v)))(va)
    gr = jax.jit(jax.grad(lambda v: loss(model_r, v)))(vr)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ga, gr,
    )


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_pack_block1_bitexact_and_grad():
    """Image-pair packed block-1 == plain path: identical param tree,
    forward equal within reassociation tolerance (same MAC set, XLA may
    re-tree the accumulation over the widened channel dim), matching
    grads; odd batch falls back to plain."""
    cfg = tiny_test_config()
    cfg_p = cfg.override({"model.pack_block1": True})
    model_a, model_b = SSDModel(cfg), SSDModel(cfg_p)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64, 64, 3)), jnp.float32
    )
    va = model_a.init(jax.random.key(0), x)
    vb = model_b.init(jax.random.key(0), x)
    # Identical parameter pytree (paths + shapes + values).
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        va, vb,
    )
    del chex
    cls_a, box_a = model_a.apply(va, x)
    cls_b, box_b = model_b.apply(vb, x)
    np.testing.assert_allclose(
        np.asarray(cls_a), np.asarray(cls_b), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(box_a), np.asarray(box_b), rtol=1e-4, atol=1e-5
    )

    def loss(m, v):
        c, b = m.apply(v, x)
        return jnp.mean(c**2) + jnp.mean(b**2)

    ga = jax.grad(lambda v: loss(model_a, v))(va)
    gb = jax.grad(lambda v: loss(model_b, v))(vb)

    def _close(a, b):
        # Normalized max-error: reassociation drift compounds through the
        # depth (measured ~3e-3 of each leaf's scale on this tiny net);
        # structural bugs (wrong pairing/unpack/block placement) produce
        # O(1) normalized errors.
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)
        assert err < 1e-2, f"grad diverged: normalized max err {err}"

    jax.tree.map(_close, ga, gb)
    # Odd batch: packed model must fall back and still work.
    cls_o, _ = model_b.apply(vb, x[:3])
    assert cls_o.shape[0] == 3
