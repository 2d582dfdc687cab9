"""Int8 PTQ engine tests (CPU): spec parity with the flax model + int8
accuracy against the float reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.quant import engine


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model = SSDModel(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    return cfg, model, variables["params"], x


def test_float_spec_matches_flax_model(setup):
    """The op-list executor must reproduce SSDModel.apply exactly."""
    cfg, model, params, x = setup
    want_cls, want_box = model.apply({"params": params}, x, train=False)
    spec = engine.build_ssd_spec(cfg)
    got_cls, got_box = engine.float_forward(params, spec, cfg, x)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_box), np.asarray(want_box), atol=1e-4)


def test_int8_close_to_float(setup):
    cfg, _, params, x = setup
    qp, spec = engine.quantize_ssd(cfg, params, [x])
    f_cls, f_box = engine.float_forward(params, spec, cfg, x)
    q_cls, q_box = engine.int8_forward(qp, spec, cfg, x)
    # Random-weight activations are near-zero-mean; PTQ noise should keep
    # logits within a small absolute band.
    cls_err = np.abs(np.asarray(q_cls) - np.asarray(f_cls))
    box_err = np.abs(np.asarray(q_box) - np.asarray(f_box))
    assert np.percentile(cls_err, 99) < 0.15, np.percentile(cls_err, 99)
    assert np.percentile(box_err, 99) < 0.15, np.percentile(box_err, 99)


def test_int8_weights_are_int8(setup):
    cfg, _, params, x = setup
    qp, spec = engine.quantize_ssd(cfg, params, [x])
    for path, w in qp.w_int8.items():
        assert w.dtype == np.int8
        assert qp.w_scale[path].shape == (w.shape[-1],)


def test_calibration_scales_positive(setup):
    cfg, _, params, x = setup
    spec = engine.build_ssd_spec(cfg)
    scales = engine.calibrate_scales(params, spec, [x])
    assert all(v > 0 for v in scales.values())
    assert "__input__" in scales


# --------------------------------------------------------------------------
# ResNet trunk: BN folding + int8
# --------------------------------------------------------------------------

import dataclasses as _dc

from object_detector_tpu.core.config import (
    AnchorConfig,
    DetectorConfig,
    ModelConfig,
)


@pytest.fixture(scope="module")
def resnet_setup():
    size = 256
    cfg = DetectorConfig(
        name="ssd256_resnet_test",
        model=ModelConfig(family="ssd", backbone="resnet50", image_size=size,
                          num_classes=4, compute_dtype="float32"),
        anchors=AnchorConfig(
            feature_sizes=(32, 16, 8, 4, 2),
            sizes=((20., 40.), (40., 80.), (80., 130.), (130., 180.), (180., 230.)),
            aspect_ratios=((2.0,),) * 5,
        ),
    )
    model = SSDModel(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (2, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    return cfg, model, variables, x


@pytest.mark.slow
def test_resnet_folded_float_matches_flax(resnet_setup):
    cfg, model, variables, x = resnet_setup
    want_cls, want_box = model.apply(variables, x, train=False)
    folded = engine.fold_resnet50(variables["params"], variables["batch_stats"])
    spec = engine.build_spec(cfg)
    got_cls, got_box = engine.float_forward(folded, spec, cfg, x)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_box), np.asarray(want_box),
                               atol=2e-3)


@pytest.mark.slow
def test_retinanet_int8_close_to_float():
    from object_detector_tpu.core.config import retinanet_anchor_config
    from object_detector_tpu.models.retinanet import RetinaNetModel

    size = 128
    cfg = DetectorConfig(
        name="retinanet_quant_test",
        model=ModelConfig(family="retinanet", backbone="resnet50",
                          image_size=size, num_classes=3, fpn_channels=32,
                          head_depth=1, compute_dtype="float32"),
        anchors=retinanet_anchor_config(size),
    )
    model = RetinaNetModel(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (2, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    f_cls, f_box = model.apply(variables, x, train=False)
    qp, spec = engine.quantize_retinanet(cfg, variables, [x])
    q_cls, q_box = engine.retinanet_int8_forward(qp, spec, cfg, x,
                                                 dtype=jnp.float32)
    assert q_cls.shape == f_cls.shape and q_box.shape == f_box.shape
    cls_err = np.abs(np.asarray(q_cls) - np.asarray(f_cls))
    box_err = np.abs(np.asarray(q_box) - np.asarray(f_box))
    assert np.percentile(cls_err, 99) < 0.3, np.percentile(cls_err, 99)
    assert np.percentile(box_err, 99) < 0.3, np.percentile(box_err, 99)


@pytest.mark.slow
def test_resnet_int8_close_to_float(resnet_setup):
    cfg, _, variables, x = resnet_setup
    qp, spec = engine.quantize_ssd(
        cfg, variables["params"], [x], batch_stats=variables["batch_stats"]
    )
    folded = engine.fold_resnet50(variables["params"], variables["batch_stats"])
    f_cls, f_box = engine.float_forward(folded, spec, cfg, x)
    q_cls, q_box = engine.int8_forward(qp, spec, cfg, x)
    cls_err = np.abs(np.asarray(q_cls) - np.asarray(f_cls))
    box_err = np.abs(np.asarray(q_box) - np.asarray(f_box))
    assert np.percentile(cls_err, 99) < 0.25, np.percentile(cls_err, 99)
    assert np.percentile(box_err, 99) < 0.25, np.percentile(box_err, 99)


def test_pallas_l2norm_matches_jnp():
    """Fused Pallas L2Norm+requant == the jnp formulation (interpret mode;
    identical arithmetic up to float associativity of the folded scale)."""
    import numpy as np

    from object_detector_tpu.kernels.l2norm_pallas import l2norm_requant

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.integers(-127, 128, (2, 9, 9, 512), dtype=np.int8))
    gamma = jnp.asarray(rng.random(512, dtype=np.float32) * 20.0)
    s0 = 0.137
    qf = q0.astype(jnp.float32)
    sq = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
    ln = qf * jax.lax.rsqrt(sq + 1e-12) * gamma
    ref = jnp.clip(jnp.round(ln / s0), -127, 127).astype(jnp.int8)

    got = l2norm_requant(q0, gamma, s0, interpret=True)
    # Folded gamma/s0 can flip round() on exact .5 boundaries — allow
    # off-by-one on a vanishing fraction, zero tolerance otherwise.
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
