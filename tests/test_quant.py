"""Int8 PTQ engine tests (CPU): spec parity with the flax model + int8
accuracy against the float reference."""

import dataclasses

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


def _retinanet_setup():
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
    return cfg, model, variables, x


@pytest.mark.slow
def test_fpn_heads_float_runner_matches_flax():
    """The functional FPN+heads calibration runner (which defines the int8
    dataflow's requant points) must reproduce the flax modules exactly."""
    cfg, model, variables, x = _retinanet_setup()
    want_cls, want_box = model.apply(variables, x, train=False)
    folded = engine.fold_resnet50(variables["params"], variables["batch_stats"])
    taps, _ = engine.run_float(folded, engine.build_resnet_trunk_spec(), x)
    got_cls, got_box, absmax = engine.run_float_fpn_heads(
        variables["params"], cfg, taps
    )
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_box), np.asarray(want_box), atol=2e-3)
    # absmax covers every requant point of the int8 dataflow.
    want_keys = {"fpn/pre3", "fpn/pre4", "fpn/pre5"}
    want_keys |= {f"fpn/P{i}" for i in range(3, 8)}
    for head in ("cls_head", "box_head"):
        for i in range(cfg.model.head_depth):
            want_keys |= {f"{head}/conv{i}@P{lvl}" for lvl in range(3, 8)}
    assert set(absmax) == want_keys


@pytest.mark.slow
def test_retinanet_int8_close_to_float():
    cfg, model, variables, x = _retinanet_setup()
    f_cls, f_box = model.apply(variables, x, train=False)

    # Full int8 path: trunk + FPN + shared heads (r3 default).
    qp, spec = engine.quantize_retinanet(cfg, variables, [x])
    assert "fpn/lateral3" in qp.w_int8 and "cls_head/out" in qp.w_int8
    q_cls, q_box = engine.retinanet_int8_forward(qp, spec, cfg, x,
                                                 dtype=jnp.float32)
    assert q_cls.shape == f_cls.shape and q_box.shape == f_box.shape
    cls_err = np.abs(np.asarray(q_cls) - np.asarray(f_cls))
    box_err = np.abs(np.asarray(q_box) - np.asarray(f_box))
    assert np.percentile(cls_err, 99) < 0.3, np.percentile(cls_err, 99)
    assert np.percentile(box_err, 99) < 0.3, np.percentile(box_err, 99)

    # Legacy float-FPN fallback still supported and at least as accurate.
    qp_f, spec_f = engine.quantize_retinanet(
        cfg, variables, [x], quantize_fpn_heads=False
    )
    assert "fpn/lateral3" not in qp_f.w_int8
    l_cls, l_box = engine.retinanet_int8_forward(qp_f, spec_f, cfg, x,
                                                 dtype=jnp.float32)
    assert np.percentile(np.abs(np.asarray(l_cls) - np.asarray(f_cls)), 99) < 0.3


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


def test_bf16_logits_close_and_postprocess_runs(setup):
    """int8_logits_bf16: cls logits deviate only by bf16 rounding (<=0.5%
    relative) and the Pallas decode+NMS path accepts bf16 logits end-to-end
    (prefilter in bf16, sigmoid/decode f32 on gathered candidates)."""
    import dataclasses as dc

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.ops.postprocess import postprocess

    cfg, _, params, x = setup
    qp, spec = engine.quantize_ssd(cfg, params, [x])
    cls_f32, box_f32 = engine.int8_forward(qp, spec, cfg, x)
    cfg_bf16 = cfg.replace(eval=dc.replace(cfg.eval, int8_logits_bf16=True))
    cls_bf16, box_bf16 = engine.int8_forward(qp, spec, cfg_bf16, x)
    assert cls_bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(box_f32), np.asarray(box_bf16))
    err = np.abs(np.asarray(cls_bf16, np.float32) - np.asarray(cls_f32))
    scale = np.maximum(np.abs(np.asarray(cls_f32)), 1.0)
    assert (err / scale).max() < 0.005, (err / scale).max()

    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))
    det = postprocess(cls_bf16, box_bf16, anchors, cfg_bf16, use_pallas=True)
    det_ref = postprocess(cls_f32, box_f32, anchors, cfg, use_pallas=True)
    assert det.boxes.shape == det_ref.boxes.shape
    # Same candidate universe up to bf16 near-ties: top-score detections
    # must agree closely.
    s = np.sort(np.asarray(det.scores).ravel())[::-1][:20]
    s_ref = np.sort(np.asarray(det_ref.scores).ravel())[::-1][:20]
    np.testing.assert_allclose(s, s_ref, atol=2e-3)


@pytest.mark.parametrize("size", [64, 65, 70])
def test_s2d_stem_conv_bitexact(size):
    """Space-to-depth 7x7/s2 stem conv == direct conv, bit-exact in int32
    (same MACs reordered; zero int8 codes are exact conv padding). Odd
    sizes exercise the even-phase pad path."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, size, size, 3), dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (7, 7, 3, 16), dtype=np.int8))
    direct = engine.ConvOp("stem", kernel=7, stride=2, padding=3)
    s2d = engine.ConvOp("stem", kernel=7, stride=2, padding=3, algo="s2d")
    a = engine._conv(x, w, direct, jnp.int32)
    b = engine._conv(x, w, s2d, jnp.int32)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_s2d_resnet_trunk_spec_parity(resnet_setup):
    """Full int8 ResNet trunk forward with the s2d stem == direct stem,
    bit-exact (the requant epilogues see identical int32 accumulators)."""
    cfg, _, variables, x = resnet_setup
    qp, spec = engine.quantize_ssd(
        cfg, variables["params"], [x], batch_stats=variables["batch_stats"]
    )
    spec_direct = [
        dataclasses.replace(op, algo="direct")
        if isinstance(op, engine.ConvOp) and op.algo == "s2d" else op
        for op in spec
    ]
    spec_s2d = [
        dataclasses.replace(op, algo="s2d")
        if isinstance(op, engine.ConvOp) and op.path.endswith("stem_conv")
        else op
        for op in spec_direct
    ]
    q_cls_a, q_box_a = engine.int8_forward(qp, spec_direct, cfg, x)
    q_cls_b, q_box_b = engine.int8_forward(qp, spec_s2d, cfg, x)
    np.testing.assert_array_equal(np.asarray(q_cls_a), np.asarray(q_cls_b))
    np.testing.assert_array_equal(np.asarray(q_box_a), np.asarray(q_box_b))


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


def test_fused_stem_matches_unfused():
    """Odd-pair conv1_1 + halo mask + Pallas conv1_2+pool == the unfused
    int8 chain, bit-exact (same int32 MACs, same f32 epilogue, pool
    commutes with requant). Two band sizes exercise the banding/halo DMA
    path."""
    import numpy as np

    from object_detector_tpu.kernels import stem_pallas

    rng = np.random.default_rng(3)
    B, H, W = 2, 20, 20
    x_q = jnp.asarray(rng.integers(-9, 10, (B, H, W, 3), dtype=np.int8))
    w1 = rng.integers(-9, 10, (3, 3, 3, 64)).astype(np.int8)
    w2 = rng.integers(-9, 10, (3, 3, 64, 64)).astype(np.int8)
    deq1 = (rng.random(64).astype(np.float32) + 0.5) * 1e-2
    b1 = rng.normal(size=64).astype(np.float32) * 0.1
    deq2 = (rng.random(64).astype(np.float32) + 0.5) * 1e-2
    b2 = rng.normal(size=64).astype(np.float32) * 0.1
    s1, s2 = 0.043, 0.021

    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )

    def requant(acc, deq, b, s):
        y = jnp.maximum(acc.astype(jnp.float32) * deq + b, 0.0)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    q1 = requant(conv(x_q, w1), deq1, b1, s1)
    q2 = requant(conv(q1, w2), deq2, b2, s2)
    ref = jax.lax.reduce_window(
        q2, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    # Fused path, engine semantics: conv1_1pp epilogue requants with
    # x2-tiled scales then zeroes the halo.
    acc1 = stem_pallas.conv11_pair_acc(
        x_q, jnp.asarray(stem_pallas.pack_conv11_pair(w1))
    )
    # UNMASKED codes: halo positions hold garbage; the kernel must zero
    # them in VMEM itself.
    q1pp = requant(acc1, np.tile(deq1, 2), np.tile(b1, 2), s1)
    masked = jnp.where(jnp.asarray(stem_pallas.stem_halo_mask(H, W)), q1pp, 0)

    # Layout: pair J holds conv1_1 columns (2J-1, 2J) in channel groups.
    np.testing.assert_array_equal(
        np.asarray(masked[:, 1:-1, 0 : W // 2, 64:]), np.asarray(q1[:, :, 0::2, :])
    )
    np.testing.assert_array_equal(
        np.asarray(masked[:, 1:-1, 1 : W // 2 + 1, :64]), np.asarray(q1[:, :, 1::2, :])
    )

    for band_rows in (20, 10):
        got = stem_pallas.conv12_pool_pair(
            q1pp,
            jnp.asarray(stem_pallas.pack_conv12_pair(w2)),
            jnp.asarray(np.tile(deq2, 2)),
            jnp.asarray(np.tile(b2, 2)),
            jnp.float32(s2),
            out_width=W // 2,
            interpret=True,
            band_rows=band_rows,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

def test_pack_conv11_pair_square_equivalent():
    """The square (kw=3) conv1_1 packing is the kw=2 packing plus an
    all-zero kx-plane — same accumulator for any input (A/B emitter knob,
    benchmarks/stem_producer_bench.py)."""
    from object_detector_tpu.kernels import stem_pallas

    rng = np.random.default_rng(3)
    w1 = rng.integers(-9, 10, (3, 3, 3, 64)).astype(np.int8)
    rect = stem_pallas.pack_conv11_pair(w1)
    square = stem_pallas.pack_conv11_pair(w1, square=True)
    assert square.shape == (3, 3, 6, 128) and rect.shape == (3, 2, 6, 128)
    np.testing.assert_array_equal(square[:, :2], rect)
    np.testing.assert_array_equal(square[:, 2], 0)
    x_q = jnp.asarray(rng.integers(-9, 10, (2, 8, 8, 3), dtype=np.int8))
    np.testing.assert_array_equal(
        np.asarray(stem_pallas.conv11_pair_acc(x_q, jnp.asarray(rect))),
        np.asarray(stem_pallas.conv11_pair_acc(x_q, jnp.asarray(square))),
    )


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_fused_stem_input_hwcn_parity(setup):
    """int8_forward(input_hwcn=True) on the (S,S,3,B)-staged batch ==
    the NHWC result, bit-exact: the quantize is elementwise and the
    fused-stem producer consumes the HWCN operand directly (the layout
    exists to kill the 0.45 ms batch-to-lanes relayout, copy.41)."""
    cfg, model, params, x = setup
    spec = engine.build_ssd_spec(cfg, fused_stem=True)
    qp, _ = engine.quantize_ssd(cfg, params, [x], spec=spec)
    cls_a, box_a = engine.int8_forward(qp, spec, cfg, x)
    x_t = jnp.transpose(x, (1, 2, 3, 0))
    cls_b, box_b = engine.int8_forward(qp, spec, cfg, x_t, input_hwcn=True)
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
@pytest.mark.parametrize("carry", ["0", "1"])
def test_fused_stem_spec_full_trunk_parity(setup, monkeypatch, carry):
    """run_int8 over the fused-stem spec == the unfused spec, end to end
    through the whole trunk (bit-exact block-1, identical downstream) —
    in BOTH stem output modes: launcher slice (default) and zero-padded
    full-width carry (ODT_STEM_CARRY=1, off-default dead end)."""
    monkeypatch.setenv("ODT_STEM_CARRY", carry)
    cfg, model, params, x = setup
    spec_a = engine.build_ssd_spec(cfg)
    spec_b = engine.build_ssd_spec(cfg, fused_stem=True)
    qp_a, _ = engine.quantize_ssd(cfg, params, [x], spec=spec_a)
    qp_b, _ = engine.quantize_ssd(cfg, params, [x], spec=spec_b)
    cls_a, box_a = engine.int8_forward(qp_a, spec_a, cfg, x)
    cls_b, box_b = engine.int8_forward(qp_b, spec_b, cfg, x)
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_fused_stem_parity_odd_pool2_width(monkeypatch):
    """End-to-end parity at image_size=60 with the zero-padded-width
    CARRY path forced on (off by default — measured 1.3% slower, see
    run_int8), where pool2's true width is ODD (15): the carry-through
    must absorb the PadToEvenOp ceil pad with its zero junk column (the
    SSD-300 shape path: 152 -> 76 -> PadToEven -> pool3; see run_int8
    junk tracking). Feature maps stay (8, 4), so the tiny heads/anchors
    are unchanged."""
    import dataclasses

    monkeypatch.setenv("ODT_STEM_CARRY", "1")
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_size=60)
    )
    model = SSDModel(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (2, 60, 60, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    spec_a = engine.build_ssd_spec(cfg)
    spec_b = engine.build_ssd_spec(cfg, fused_stem=True)
    qp_a, _ = engine.quantize_ssd(cfg, params, [x], spec=spec_a)
    qp_b, _ = engine.quantize_ssd(cfg, params, [x], spec=spec_b)
    cls_a, box_a = engine.int8_forward(qp_a, spec_a, cfg, x)
    cls_b, box_b = engine.int8_forward(qp_b, spec_b, cfg, x)
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))


def test_stem_fused_producer_matches_two_stage():
    """The fully-fused stem (conv1_1 in-kernel over the tap-stacked input,
    stem_pallas.stem_fused_producer) == the unfused int8 chain, bit-exact:
    same int32 MACs (x6 @ w1flat is the odd-pair conv by construction),
    same f32 epilogue order, same halo masking."""
    import numpy as np

    from object_detector_tpu.kernels import stem_pallas

    rng = np.random.default_rng(7)
    B, H, W = 2, 20, 20
    x_q = jnp.asarray(rng.integers(-9, 10, (B, H, W, 3), dtype=np.int8))
    w1 = rng.integers(-9, 10, (3, 3, 3, 64)).astype(np.int8)
    w2 = rng.integers(-9, 10, (3, 3, 64, 64)).astype(np.int8)
    deq1 = (rng.random(64).astype(np.float32) + 0.5) * 1e-2
    b1 = rng.normal(size=64).astype(np.float32) * 0.1
    deq2 = (rng.random(64).astype(np.float32) + 0.5) * 1e-2
    b2 = rng.normal(size=64).astype(np.float32) * 0.1
    s1, s2 = 0.043, 0.021

    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )

    def requant(acc, deq, b, s):
        y = jnp.maximum(acc.astype(jnp.float32) * deq + b, 0.0)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    q1 = requant(conv(x_q, w1), deq1, b1, s1)
    q2 = requant(conv(q1, w2), deq2, b2, s2)
    ref = jax.lax.reduce_window(
        q2, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    w1r = stem_pallas.pack_conv11_pair(w1)
    w1flat = stem_pallas.pack_conv11_flat(w1r)
    # x6 @ w1flat must equal the producer conv's accumulator exactly.
    codes_pp = x_q.reshape(B, H, W // 2, 6)
    x6 = stem_pallas.build_stem_x6(codes_pp)
    acc_ref = stem_pallas.conv11_pair_acc(x_q, jnp.asarray(w1r))
    acc_x6 = jax.lax.dot_general(
        x6.astype(jnp.int32), jnp.asarray(w1flat, jnp.int32),
        (((3,), (0,)), ((), ())),
    )
    np.testing.assert_array_equal(np.asarray(acc_x6), np.asarray(acc_ref))

    for band_rows in (20, 10):
        got = stem_pallas.stem_fused_producer(
            codes_pp,
            jnp.asarray(w1flat),
            jnp.asarray(np.tile(deq1, 2)),
            jnp.asarray(np.tile(b1, 2)),
            jnp.float32(s1),
            jnp.asarray(stem_pallas.pack_conv12_pair(w2)),
            jnp.asarray(np.tile(deq2, 2)),
            jnp.asarray(np.tile(b2, 2)),
            jnp.float32(s2),
            out_width=W // 2,
            interpret=True,
            band_rows=band_rows,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_fused_stem_spec_fp_env_parity(setup, monkeypatch):
    """run_int8 with ODT_STEM_FP=1 (fully-fused stem) == the default
    two-stage fused path, end to end through heads, bit-exact."""
    cfg, model, params, x = setup
    spec = engine.build_ssd_spec(cfg, fused_stem=True)
    qp, _ = engine.quantize_ssd(cfg, params, [x], spec=spec)
    cls_a, box_a = engine.int8_forward(qp, spec, cfg, x)
    monkeypatch.setenv("ODT_STEM_FP", "1")
    cls_b, box_b = engine.int8_forward(qp, spec, cfg, x)
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))


def test_fused_bottleneck_matches_unfused():
    """BottleneckOp Pallas kernel == unfused conv1/conv2/conv3+residual
    int8 chain, bit-exact (same int32 MACs, same f32 epilogue op
    sequence). Odd band split exercises the halo rows + edge masking."""
    import numpy as np

    from object_detector_tpu.kernels import bottleneck_pallas

    rng = np.random.default_rng(7)
    B, H, W, C, Cm = 2, 12, 16, 32, 16
    x_q = jnp.asarray(rng.integers(-31, 32, (B, H, W, C), dtype=np.int8))
    w1 = rng.integers(-9, 10, (1, 1, C, Cm)).astype(np.int8)
    w2 = rng.integers(-9, 10, (3, 3, Cm, Cm)).astype(np.int8)
    w3 = rng.integers(-9, 10, (1, 1, Cm, C)).astype(np.int8)
    deq1 = (rng.random(Cm).astype(np.float32) + 0.5) * 1e-2
    b1 = rng.normal(size=Cm).astype(np.float32) * 0.1
    deq2 = (rng.random(Cm).astype(np.float32) + 0.5) * 1e-2
    b2 = rng.normal(size=Cm).astype(np.float32) * 0.1
    deq3 = (rng.random(C).astype(np.float32) + 0.5) * 1e-2
    b3 = rng.normal(size=C).astype(np.float32) * 0.1
    s1, s2, s3, rs = 0.043, 0.021, 0.037, 0.029

    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )

    def requant(acc, deq, b, s, extra=None):
        y = acc.astype(jnp.float32) * deq + b
        if extra is not None:
            y = y + extra
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    q1 = requant(conv(x_q, w1), deq1, b1, s1)
    q2 = requant(conv(q1, w2), deq2, b2, s2)
    ref = requant(
        conv(q2, w3), deq3, b3, s3, extra=x_q.astype(jnp.float32) * rs
    )

    for band_rows in (4, None):  # 3 bands of 4 rows; auto (=4 for H=12)
        got = bottleneck_pallas.fused_bottleneck(
            x_q,
            jnp.asarray(w1).reshape(C, Cm), jnp.asarray(deq1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(deq2), jnp.asarray(b2),
            jnp.asarray(w3).reshape(Cm, C), jnp.asarray(deq3), jnp.asarray(b3),
            s1=s1, s2=s2, s3=s3, resid_scale=rs,
            band_rows=band_rows, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_bottleneck_spec_matches_unfused_spec():
    """run_int8 over a fused-bottleneck ResNet spec == the unfused spec,
    bit-exact, from ONE shared QuantParams (paths are identical by
    _expand_spec construction)."""
    import numpy as np

    rng = np.random.default_rng(11)

    def conv_p(kh, kw, cin, cout):
        return {
            "kernel": rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)
            * 0.1,
            "bias": rng.normal(size=cout).astype(np.float32) * 0.05,
        }

    C, Cm = 24, 8
    base = "backbone/stageX_block2"
    params = {
        "backbone": {
            "stageX_block2": {
                "conv1": conv_p(1, 1, C, Cm),
                "conv2": conv_p(3, 3, Cm, Cm),
                "conv3": conv_p(1, 1, Cm, C),
            }
        }
    }
    fused_spec = [engine.BottleneckOp(base)]
    unfused_spec = engine._expand_spec(fused_spec)

    imgs = jnp.asarray(rng.random((2, 8, 8, C)).astype(np.float32))
    scales = engine.calibrate_scales(params, unfused_spec, [imgs], use_l2norm=False)
    qp = engine.quantize_params(params, fused_spec, scales, quantize_heads=False)

    # Neither spec has taps; compare the final activation via a TapOp.
    fused_spec = fused_spec + [engine.TapOp(0)]
    unfused_spec = unfused_spec + [engine.TapOp(0)]
    t_fused = engine.run_int8(qp, fused_spec, imgs)
    t_unfused = engine.run_int8(qp, unfused_spec, imgs)
    for a, b in zip(jax.tree_util.tree_leaves(t_fused),
                    jax.tree_util.tree_leaves(t_unfused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_per_level_heads_match_concat_ssd(setup):
    """int8_forward(concat_heads=False) + postprocess_levels must produce
    the same detection set as the concat path + postprocess (per-level
    two-stage prefilter is exact; see pallas_decode_nms_levels)."""
    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.ops.postprocess import (
        postprocess,
        postprocess_levels,
    )
    from tests.test_nms_pallas import _as_set

    cfg, model, params, x = setup
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))
    qp, spec = engine.quantize_ssd(cfg, params, [x])
    cls_cat, box_cat = engine.int8_forward(qp, spec, cfg, x)
    lvl_cls, lvl_box = engine.int8_forward(qp, spec, cfg, x,
                                           concat_heads=False)
    # Per-level native tensors must concat back to the one-shot outputs.
    b = x.shape[0]
    np.testing.assert_array_equal(
        np.asarray(
            jnp.concatenate(
                [t.reshape(b, -1, cfg.model.num_classes) for t in lvl_cls],
                axis=1,
            )
        ),
        np.asarray(cls_cat),
    )
    det_cat = postprocess(cls_cat, box_cat, anchors, cfg, use_pallas=True)
    det_lvl = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
    for i in range(b):
        assert _as_set(
            type(det_cat)(det_cat.boxes[i], det_cat.scores[i],
                          det_cat.classes[i], det_cat.valid[i])
        ) == _as_set(
            type(det_lvl)(det_lvl.boxes[i], det_lvl.scores[i],
                          det_lvl.classes[i], det_lvl.valid[i])
        )


@pytest.mark.slow
def test_per_level_heads_match_concat_retinanet():
    """RetinaNet int8 FPN/heads per-level path == concat path."""
    from object_detector_tpu.anchors.priors import anchors_for_model
    from object_detector_tpu.ops.postprocess import (
        postprocess,
        postprocess_levels,
    )
    from tests.test_nms_pallas import _as_set

    cfg, model, variables, x = _retinanet_setup()
    anchors = jnp.asarray(
        anchors_for_model("retinanet", cfg.anchors, cfg.model.image_size)
    )
    qp, spec = engine.quantize_retinanet(cfg, variables, [x])
    cls_cat, box_cat = engine.retinanet_int8_forward(qp, spec, cfg, x)
    lvl_cls, lvl_box = engine.retinanet_int8_forward(
        qp, spec, cfg, x, concat_heads=False
    )
    det_cat = postprocess(cls_cat, box_cat, anchors, cfg, use_pallas=True)
    det_lvl = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
    for i in range(x.shape[0]):
        assert _as_set(
            type(det_cat)(det_cat.boxes[i], det_cat.scores[i],
                          det_cat.classes[i], det_cat.valid[i])
        ) == _as_set(
            type(det_lvl)(det_lvl.boxes[i], det_lvl.scores[i],
                          det_lvl.classes[i], det_lvl.valid[i])
        )


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_img_pack_trunk_spec_matches_unpacked(resnet_setup):
    """Full int8 ResNet trunk with image-pair packing (PackImagesOp +
    block-diag ConvOps over stem/stage-1) == the unpacked spec, bit-exact
    from ONE shared QuantParams: the off-diagonal kernel zeros contribute
    nothing to the int32 accumulators and the per-channel dequant/bias
    vectors are tiled x2."""
    cfg, _, variables, x = resnet_setup
    qp, spec = engine.quantize_ssd(
        cfg, variables["params"], [x], batch_stats=variables["batch_stats"]
    )
    spec_packed = engine.build_resnet_trunk_spec(
        img_pack=True
    ) + engine._extras_spec(cfg, 3)
    q_cls_a, q_box_a = engine.int8_forward(qp, spec, cfg, x)
    q_cls_b, q_box_b = engine.int8_forward(qp, spec_packed, cfg, x)
    np.testing.assert_array_equal(np.asarray(q_cls_a), np.asarray(q_cls_b))
    np.testing.assert_array_equal(np.asarray(q_box_a), np.asarray(q_box_b))


@pytest.mark.slow  # dead-end-path parity; tier re-budget (VERDICT r3 #7)
def test_img_pack_odd_batch_falls_back(resnet_setup):
    """A packed spec with an odd batch must run the identical unpacked
    math (pack_ok resolves statically from the batch shape)."""
    cfg, _, variables, x = resnet_setup
    qp, spec = engine.quantize_ssd(
        cfg, variables["params"], [x], batch_stats=variables["batch_stats"]
    )
    spec_packed = engine.build_resnet_trunk_spec(
        img_pack=True
    ) + engine._extras_spec(cfg, 3)
    x1 = x[:1]
    q_cls_a, q_box_a = engine.int8_forward(qp, spec, cfg, x1)
    q_cls_b, q_box_b = engine.int8_forward(qp, spec_packed, cfg, x1)
    np.testing.assert_array_equal(np.asarray(q_cls_a), np.asarray(q_cls_b))
    np.testing.assert_array_equal(np.asarray(q_box_a), np.asarray(q_box_b))


def test_build_spec_resnet_img_pack_env_resolution(resnet_setup, monkeypatch):
    """build_spec resolves the SSD ResNet img_pack default from the
    ODT_IMG_PACK env (backend auto otherwise; CPU test backend => off)."""
    cfg, _, _, _ = resnet_setup
    spec_auto = engine.build_spec(cfg)
    assert not any(isinstance(op, engine.PackImagesOp) for op in spec_auto)
    monkeypatch.setenv("ODT_IMG_PACK", "1")
    spec_on = engine.build_spec(cfg)
    assert any(isinstance(op, engine.PackImagesOp) for op in spec_on)
    assert any(isinstance(op, engine.UnpackImagesOp) for op in spec_on)
    monkeypatch.setenv("ODT_IMG_PACK", "0")
    spec_off = engine.build_spec(cfg)
    assert not any(isinstance(op, engine.PackImagesOp) for op in spec_off)


@pytest.mark.slow  # 256px interpret-mode trunk x2 (~4 min); the fast
# kernel-level parity is tests/test_resnet_stem_pallas.py (default tier)
def test_stem_kernel_trunk_spec_matches_plain(resnet_setup, monkeypatch):
    """Full int8 ResNet trunk with the fused Pallas stem
    (StemPoolPallasOp — kernels/resnet_stem_pallas.py) == the plain
    quantize+conv+pool spec, bit-exact from ONE shared QuantParams
    (interpret mode on CPU; on-chip A/B in
    benchmarks/resnet_stem_kernel_ab.py)."""
    cfg, _, variables, x = resnet_setup
    qp, spec = engine.quantize_ssd(
        cfg, variables["params"], [x], batch_stats=variables["batch_stats"]
    )
    monkeypatch.setenv("ODT_STEM_KERNEL", "1")
    spec_kernel = engine.build_resnet_trunk_spec() + engine._extras_spec(cfg, 3)
    assert isinstance(spec_kernel[0], engine.StemPoolPallasOp)
    q_cls_a, q_box_a = engine.int8_forward(qp, spec, cfg, x)
    q_cls_b, q_box_b = engine.int8_forward(qp, spec_kernel, cfg, x)
    np.testing.assert_array_equal(np.asarray(q_cls_a), np.asarray(q_cls_b))
    np.testing.assert_array_equal(np.asarray(q_box_a), np.asarray(q_box_b))
