"""Pretrained-weight conversion tests (SURVEY.md §2 #14) — fake torchvision
state_dicts (no network in this environment)."""

import numpy as np
import pytest

from object_detector_tpu.utils import weights


def _fake_vgg_state():
    state = {}
    # torchvision vgg16.features conv indices with (out, in) shapes.
    shapes = {
        0: (64, 3), 2: (64, 64),
        5: (128, 64), 7: (128, 128),
        10: (256, 128), 12: (256, 256), 14: (256, 256),
        17: (512, 256), 19: (512, 512), 21: (512, 512),
        24: (512, 512), 26: (512, 512), 28: (512, 512),
    }
    rng = np.random.default_rng(0)
    for idx, (o, i) in shapes.items():
        state[f"features.{idx}.weight"] = rng.normal(size=(o, i, 3, 3)).astype(np.float32)
        state[f"features.{idx}.bias"] = rng.normal(size=(o,)).astype(np.float32)
    return state


def test_vgg16_conversion_layout():
    state = _fake_vgg_state()
    params = weights.vgg16_from_torch(state)
    assert params["conv1_1"]["kernel"].shape == (3, 3, 3, 64)  # HWIO
    assert params["conv5_3"]["kernel"].shape == (3, 3, 512, 512)
    # Transpose correctness: torch (O,I,kh,kw) -> flax (kh,kw,I,O).
    w_torch = state["features.0.weight"]
    np.testing.assert_array_equal(
        params["conv1_1"]["kernel"][1, 2, 0, 5], w_torch[5, 0, 1, 2]
    )


def test_inject_backbone_into_model_params():
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.vgg import VGG16Backbone

    backbone = VGG16Backbone(compute_dtype=jnp.float32)
    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    converted = weights.vgg16_from_torch(_fake_vgg_state())
    merged = weights.inject_backbone({"backbone": variables["params"]}, converted)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["conv1_1"]["kernel"]),
        converted["conv1_1"]["kernel"],
    )
    # fc6/fc7 untouched (not present in the torchvision conv stack).
    assert "fc6" in merged["backbone"]


def test_inject_rejects_shape_mismatch():
    bad = {"conv1_1": {"kernel": np.zeros((3, 3, 3, 99), np.float32),
                       "bias": np.zeros((99,), np.float32)}}
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.models.vgg import VGG16Backbone

    backbone = VGG16Backbone(compute_dtype=jnp.float32)
    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(ValueError):
        weights.inject_backbone({"backbone": variables["params"]}, bad)


def test_resnet50_conversion():
    rng = np.random.default_rng(1)
    state = {"conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32)}
    for bn in ["bn1"]:
        for k, shape in [("weight", 64), ("bias", 64), ("running_mean", 64), ("running_var", 64)]:
            state[f"{bn}.{k}"] = rng.normal(size=(shape,)).astype(np.float32)
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    in_ch = 64
    for s, (n, w) in enumerate(zip(stage_sizes, widths), start=1):
        for b in range(n):
            pre = f"layer{s}.{b}"
            dims = [(w, in_ch if b == 0 else w * 4, 1), (w, w, 3), (w * 4, w, 1)]
            for i, (o, i_ch, k) in enumerate(dims, start=1):
                state[f"{pre}.conv{i}.weight"] = rng.normal(size=(o, i_ch, k, k)).astype(np.float32)
                for kk, sz in [("weight", o), ("bias", o), ("running_mean", o), ("running_var", o)]:
                    state[f"{pre}.bn{i}.{kk}"] = np.abs(rng.normal(size=(sz,))).astype(np.float32)
            if b == 0:
                state[f"{pre}.downsample.0.weight"] = rng.normal(
                    size=(w * 4, in_ch if s == 1 else widths[s - 2] * 4, 1, 1)
                ).astype(np.float32)
                for kk, sz in [("weight", w * 4), ("bias", w * 4), ("running_mean", w * 4), ("running_var", w * 4)]:
                    state[f"{pre}.downsample.1.{kk}"] = np.abs(rng.normal(size=(sz,))).astype(np.float32)
        in_ch = w * 4
    params, stats = weights.resnet50_from_torch(state)
    assert params["stem_conv"]["kernel"].shape == (7, 7, 3, 64)
    assert "stage1_block1" in params and "proj" in params["stage1_block1"]
    assert "stage4_block3" in params and "proj" not in params["stage4_block3"]
    assert stats["stage2_block1"]["bn2"]["mean"].shape == (128,)


def test_vgg16_fc6_fc7_atrous_subsample():
    """SSD fc->conv conversion: fc6 decimates 4096->1024 outputs and 7x7->3x3
    spatial taps (stride 3), fc7 decimates both sides of the 4096x4096
    linear; layouts land as flax HWIO and values trace back to the right
    source entries."""
    rng = np.random.default_rng(2)
    state = {
        "classifier.0.weight": rng.normal(size=(4096, 25088)).astype(np.float32),
        "classifier.0.bias": rng.normal(size=(4096,)).astype(np.float32),
        "classifier.3.weight": rng.normal(size=(4096, 4096)).astype(np.float32),
        "classifier.3.bias": rng.normal(size=(4096,)).astype(np.float32),
    }
    for idx in weights._VGG_FEATURE_IDX:
        state[f"features.{idx}.weight"] = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        state[f"features.{idx}.bias"] = rng.normal(size=(8,)).astype(np.float32)
    out = weights.vgg16_from_torch(state)
    assert out["fc6"]["kernel"].shape == (3, 3, 512, 1024)
    assert out["fc7"]["kernel"].shape == (1, 1, 1024, 1024)
    assert out["fc6"]["bias"].shape == (1024,)

    # fc6 kernel[ky,kx,i,o] == classifier.0.weight[4o, i*49 + (3ky)*7 + 3kx]
    w0 = state["classifier.0.weight"].reshape(4096, 512, 7, 7)
    np.testing.assert_allclose(
        out["fc6"]["kernel"][1, 2, 5, 7], w0[28, 5, 3, 6]
    )
    np.testing.assert_allclose(out["fc6"]["bias"][3], state["classifier.0.bias"][12])
    # fc7 kernel[0,0,i,o] == classifier.3.weight[4o, 4i]
    np.testing.assert_allclose(
        out["fc7"]["kernel"][0, 0, 9, 2], state["classifier.3.weight"][8, 36]
    )
