"""Pretrained-weight conversion tests (SURVEY.md §2 #14).

No network in this environment, so fixtures are synthetic — but they are
built FROM `torchvision_state_dict_shapes`, the hard-coded canonical
key+shape inventory of the real torchvision artifacts, and every converter
test first passes the strict validator. A key-name or layout drift between
our converters and the real state_dict layout now fails these tests instead
of surfacing at (unavailable) real-artifact load time (VERDICT r2 item #7).
"""

import numpy as np
import pytest

from object_detector_tpu.utils import weights


def _fake_state(arch: str, with_head: bool = True, seed: int = 0):
    """Random state_dict with the exact canonical keys+shapes."""
    rng = np.random.default_rng(seed)
    state = {}
    for key, shape in weights.torchvision_state_dict_shapes(arch).items():
        if not with_head and key.startswith(("classifier.", "fc.")):
            continue
        if key.endswith("num_batches_tracked"):
            state[key] = np.asarray(100, np.int64)
        elif "running_var" in key:
            state[key] = np.abs(rng.normal(size=shape)).astype(np.float32)
        else:
            state[key] = rng.normal(size=shape).astype(np.float32)
    return state


def test_inventory_counts():
    # torchvision vgg16: 13 convs + 3 linears, weight+bias each.
    assert len(weights.torchvision_state_dict_shapes("vgg16")) == 2 * (13 + 3)
    # resnet50: conv1+bn1, 16 bottlenecks (3 conv+bn each), 4 downsamples, fc.
    r50 = weights.torchvision_state_dict_shapes("resnet50")
    assert sum(1 for k in r50 if k.endswith(".weight") and "bn" not in k
               and "downsample.1" not in k and k != "fc.weight") == 1 + 16 * 3 + 4
    assert r50["layer3.0.downsample.0.weight"] == (1024, 512, 1, 1)
    assert r50["layer4.2.conv3.weight"] == (2048, 512, 1, 1)


def test_validator_accepts_canonical_and_rejects_drift():
    state = _fake_state("vgg16")
    weights.validate_torch_state_dict(state, "vgg16")
    headless = _fake_state("vgg16", with_head=False)
    with pytest.raises(ValueError, match="missing keys"):
        weights.validate_torch_state_dict(headless, "vgg16")
    weights.validate_torch_state_dict(headless, "vgg16", allow_missing_fc=True)
    bad = dict(state)
    bad["features.0.weight"] = bad["features.0.weight"][:, :, :2, :2]
    with pytest.raises(ValueError, match="shape mismatches"):
        weights.validate_torch_state_dict(bad, "vgg16")
    extra = dict(state)
    extra["features.99.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unexpected keys"):
        weights.validate_torch_state_dict(extra, "vgg16")

    r50 = _fake_state("resnet50")
    weights.validate_torch_state_dict(r50, "resnet50")
    del r50["layer2.1.bn3.running_mean"]
    with pytest.raises(ValueError, match="missing keys"):
        weights.validate_torch_state_dict(r50, "resnet50")


def test_vgg16_conversion_layout():
    state = _fake_state("vgg16")
    weights.validate_torch_state_dict(state, "vgg16")
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

    from object_detector_tpu.models.vgg import VGG16Backbone

    backbone = VGG16Backbone(compute_dtype=jnp.float32)
    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    converted = weights.vgg16_from_torch(_fake_state("vgg16", with_head=False))
    merged = weights.inject_backbone({"backbone": variables["params"]}, converted)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["conv1_1"]["kernel"]),
        converted["conv1_1"]["kernel"],
    )
    # fc6/fc7 untouched (headless dict has no classifier to convert from).
    assert "fc6" in merged["backbone"]


def test_full_vgg16_conversion_injects_into_model():
    """End-to-end: canonical state_dict -> convert -> inject into the REAL
    SSD backbone param tree, every layer shape-checked (incl. fc6/fc7)."""
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.models.vgg import VGG16Backbone

    backbone = VGG16Backbone(compute_dtype=jnp.float32)
    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 300, 300, 3)))
    state = _fake_state("vgg16")
    weights.validate_torch_state_dict(state, "vgg16")
    converted = weights.vgg16_from_torch(state)
    assert set(converted) == set(weights._VGG_FEATURE_IDX.values()) | {"fc6", "fc7"}
    merged = weights.inject_backbone({"backbone": variables["params"]}, converted)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["fc7"]["bias"]),
        state["classifier.3.bias"][::4],
    )


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
    state = _fake_state("resnet50", seed=1)
    weights.validate_torch_state_dict(state, "resnet50")
    params, stats = weights.resnet50_from_torch(state)
    assert params["stem_conv"]["kernel"].shape == (7, 7, 3, 64)
    assert "stage1_block1" in params and "proj" in params["stage1_block1"]
    assert "stage4_block3" in params and "proj" not in params["stage4_block3"]
    assert stats["stage2_block1"]["bn2"]["mean"].shape == (128,)
    # Every converted block matches the model's expected channel widths:
    # inject into the real ResNet50Backbone and shape-check.
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.models.resnet import ResNet50Backbone

    backbone = ResNet50Backbone(compute_dtype=jnp.float32)
    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    merged = weights.inject_backbone({"backbone": variables["params"]}, params)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["stage3_block6"]["conv3"]["kernel"]),
        params["stage3_block6"]["conv3"]["kernel"],
    )


def test_vgg16_fc6_fc7_atrous_subsample():
    """SSD fc->conv conversion: fc6 decimates 4096->1024 outputs and 7x7->3x3
    spatial taps (stride 3), fc7 decimates both sides of the 4096x4096
    linear; layouts land as flax HWIO and values trace back to the right
    source entries."""
    state = _fake_state("vgg16", seed=2)
    out = weights.vgg16_from_torch(state)
    assert out["fc6"]["kernel"].shape == (3, 3, 512, 1024)
    assert out["fc7"]["kernel"].shape == (1, 1, 1024, 1024)
    # fc6 kernel value traceback: HWIO (ky,kx,i,o) <- torch fc6 row 4*o,
    # input channel i at spatial tap (3*ky, 3*kx) of the 7x7 grid.
    w6 = state["classifier.0.weight"].reshape(4096, 512, 7, 7)
    np.testing.assert_array_equal(
        out["fc6"]["kernel"][1, 2, 17, 5], w6[20, 17, 3, 6]
    )
    np.testing.assert_array_equal(out["fc6"]["bias"], state["classifier.0.bias"][::4])
    np.testing.assert_array_equal(
        out["fc7"]["kernel"][0, 0, 7, 3], state["classifier.3.weight"][12, 28]
    )
