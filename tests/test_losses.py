"""Unit tests: focal / smooth-L1 vs hand-computed scalars (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from object_detector_tpu.losses import detection as det_loss


def test_focal_loss_hand_computed():
    # Single anchor, 2 classes, target = class 1 (foreground id 1).
    logits = jnp.array([[[2.0, -1.0]]])
    targets = jnp.array([[1]], dtype=jnp.int32)
    got = float(det_loss.sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0)[0, 0])

    def focal_term(x, z, alpha, gamma):
        p = 1 / (1 + np.exp(-x))
        ce = np.maximum(x, 0) - x * z + np.log1p(np.exp(-abs(x)))
        p_t = p * z + (1 - p) * (1 - z)
        a_t = alpha * z + (1 - alpha) * (1 - z)
        return a_t * (1 - p_t) ** gamma * ce

    want = focal_term(2.0, 1.0, 0.25, 2.0) + focal_term(-1.0, 0.0, 0.25, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_gamma_zero_is_weighted_ce():
    logits = jnp.array([[[0.5, -0.3, 1.2]]])
    targets = jnp.array([[2]], dtype=jnp.int32)
    got = det_loss.sigmoid_focal_loss(logits, targets, alpha=0.5, gamma=0.0)
    onehot = np.array([0.0, 1.0, 0.0])
    x = np.array([0.5, -0.3, 1.2])
    ce = np.maximum(x, 0) - x * onehot + np.log1p(np.exp(-abs(x)))
    np.testing.assert_allclose(float(got[0, 0]), 0.5 * ce.sum(), rtol=1e-4)


def test_smooth_l1_regimes():
    pred = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    target = jnp.array([[0.5, -0.5, 2.0, -3.0]])
    got = float(det_loss.smooth_l1(pred, target, beta=1.0)[0])
    want = 0.5 * 0.25 + 0.5 * 0.25 + (2.0 - 0.5) + (3.0 - 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hard_negative_mining_keeps_3x_negatives():
    loss = jnp.array([[5.0, 4.0, 3.0, 2.0, 1.0, 0.5, 0.2, 0.1]])
    positive = jnp.array([[True, False, False, False, False, False, False, False]])
    valid = jnp.ones_like(positive)
    keep = det_loss.hard_negative_mine(loss, positive, valid, negatives_per_positive=3)
    got = np.asarray(keep[0])
    # 1 positive -> keep top-3 loss negatives: indices 1, 2, 3.
    np.testing.assert_array_equal(got, [True, True, True, True, False, False, False, False])


def test_detection_loss_normalizes_by_positives():
    B, A, C = 2, 16, 4
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(B, A, C)).astype(np.float32))
    boxes = jnp.asarray(rng.normal(size=(B, A, 4)).astype(np.float32))
    cls_t = np.zeros((B, A), np.int32)
    cls_t[0, :4] = 1
    cls_t[1, :2] = 2
    box_t = jnp.zeros((B, A, 4))
    total, metrics = det_loss.detection_loss(
        logits, boxes, jnp.asarray(cls_t), box_t
    )
    assert float(metrics["num_positives"]) == 6.0
    assert np.isfinite(float(total))


def test_ignored_anchors_do_not_contribute():
    B, A, C = 1, 8, 3
    logits = jnp.ones((B, A, C)) * 3.0
    boxes = jnp.zeros((B, A, 4))
    box_t = jnp.zeros((B, A, 4))
    cls_all_bg = jnp.zeros((B, A), jnp.int32)
    cls_half_ignored = cls_all_bg.at[0, :4].set(-1)
    l_bg, _ = det_loss.detection_loss(logits, boxes, cls_all_bg, box_t)
    l_ign, _ = det_loss.detection_loss(logits, boxes, cls_half_ignored, box_t)
    assert float(l_ign) < float(l_bg)
    np.testing.assert_allclose(float(l_ign), float(l_bg) / 2, rtol=1e-5)
