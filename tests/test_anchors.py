"""Unit tests: prior-box generation (counts, ranges, level layout)."""

import numpy as np

from object_detector_tpu.anchors import priors
from object_detector_tpu.core.config import (
    retinanet_anchor_config,
    ssd300_anchor_config,
    ssd512_anchor_config,
)


def test_ssd300_anchor_count():
    cfg = ssd300_anchor_config()
    # Canonical SSD-300: 38²·4 + 19²·6 + 10²·6 + 5²·6 + 3²·4 + 1·4 = 8732.
    assert cfg.num_anchors == 8732
    anchors = priors.ssd_anchors(cfg, 300)
    assert anchors.shape == (8732, 4)


def test_ssd512_anchor_count():
    cfg = ssd512_anchor_config()
    # 64²·4+32²·6+16²·6+8²·6+4²·6+2²·4+1·4 = 24564.
    assert cfg.num_anchors == 24564
    anchors = priors.ssd_anchors(cfg, 512)
    assert anchors.shape == (24564, 4)


def test_anchor_centers_in_unit_square():
    cfg = ssd300_anchor_config()
    anchors = priors.ssd_anchors(cfg, 300)
    assert np.all(anchors[:, :2] > 0.0) and np.all(anchors[:, :2] < 1.0)
    assert np.all(anchors[:, 2:] > 0.0) and np.all(anchors[:, 2:] <= 1.0)


def test_level_slices_cover_all_anchors():
    cfg = ssd300_anchor_config()
    slices = priors.level_slices(cfg)
    assert slices[0][0] == 0
    assert slices[-1][1] == cfg.num_anchors
    for (s0, e0), (s1, _) in zip(slices, slices[1:]):
        assert e0 == s1


def test_first_level_anchor_geometry():
    cfg = ssd300_anchor_config()
    anchors = priors.ssd_anchors(cfg, 300)
    # First anchor: center of cell (0,0) on the 38-map, scale 30/300.
    np.testing.assert_allclose(anchors[0, :2], [0.5 / 38, 0.5 / 38], atol=1e-6)
    np.testing.assert_allclose(anchors[0, 2:], [0.1, 0.1], atol=1e-6)
    # Second anchor at the same location: sqrt(30*60)/300.
    s_prime = np.sqrt(30.0 * 60.0) / 300.0
    np.testing.assert_allclose(anchors[1, 2:], [s_prime, s_prime], atol=1e-6)


def test_retinanet_anchor_count():
    anchors = priors.retinanet_anchors(512)
    expect = sum((512 // s) ** 2 * 9 for s in (8, 16, 32, 64, 128))
    assert anchors.shape == (expect, 4)


def test_retinanet_config_feature_sizes():
    cfg = retinanet_anchor_config(512)
    assert cfg.feature_sizes == (64, 32, 16, 8, 4)
