"""Unit tests: on-device augmentation invariants (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.core.config import AugmentConfig
from object_detector_tpu.ops import augment as aug


def _example(rng, size=64, m=5):
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    boxes = np.zeros((m, 4), np.float32)
    valid = np.zeros((m,), bool)
    boxes[0] = [0.2, 0.3, 0.6, 0.7]
    boxes[1] = [0.5, 0.5, 0.9, 0.8]
    valid[:2] = True
    labels = np.array([1, 2] + [0] * (m - 2), np.int32)
    return jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def test_augment_output_invariants(rng):
    img, boxes, labels, valid = _example(rng)
    cfg = AugmentConfig()
    for seed in range(8):
        ex = aug.augment_example(img, boxes, labels, valid, jax.random.key(seed), cfg, 64)
        assert ex.image.shape == (64, 64, 3)
        b = np.asarray(ex.boxes)
        v = np.asarray(ex.valid)
        assert np.all(b >= -1e-6) and np.all(b <= 1 + 1e-6), "boxes leave [0,1]"
        if v.any():
            assert np.all(b[v, 2] >= b[v, 0]) and np.all(b[v, 3] >= b[v, 1])
        # padding slots never become valid
        assert not v[2:].any()


def test_flip_twice_is_identity(rng):
    img, boxes, labels, valid = _example(rng)
    rect = jnp.array([0.0, 0.0, 1.0, 1.0])
    out1, b1, v1 = aug.apply_geometric(
        img.astype(jnp.float32) / 255.0, boxes, valid, rect, jnp.array(True), 64
    )
    out2, b2, v2 = aug.apply_geometric(out1, b1, v1, rect, jnp.array(True), 64)
    np.testing.assert_allclose(np.asarray(b2)[np.asarray(v2)], np.asarray(boxes)[np.asarray(valid)], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(img, np.float32)[...,:] / 255.0, atol=0.02
    )


def test_identity_rect_preserves_boxes(rng):
    img, boxes, labels, valid = _example(rng)
    rect = jnp.array([0.0, 0.0, 1.0, 1.0])
    _, b, v = aug.apply_geometric(
        img.astype(jnp.float32) / 255.0, boxes, valid, rect, jnp.array(False), 64
    )
    np.testing.assert_allclose(np.asarray(b)[:2], np.asarray(boxes)[:2], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(valid))


def test_crop_rect_shifts_boxes_correctly(rng):
    img, boxes, labels, valid = _example(rng)
    rect = jnp.array([0.2, 0.2, 0.7, 0.7])  # 0.5x0.5 crop
    _, b, v = aug.apply_geometric(
        img.astype(jnp.float32) / 255.0, boxes, valid, rect, jnp.array(False), 64
    )
    # box0 = [0.2,0.3,0.6,0.7] -> ((x-0.2)/0.5): [0, 0.2, 0.8, 1.0]
    np.testing.assert_allclose(np.asarray(b)[0], [0.0, 0.2, 0.8, 1.0], atol=1e-5)
    assert bool(v[0])


def test_photometric_stays_in_range(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    cfg = AugmentConfig()
    for seed in range(4):
        out = aug.photometric_jitter(img, jax.random.key(seed), cfg)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0


def test_augment_batch_jits(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8))
    boxes = jnp.tile(jnp.array([[[0.2, 0.2, 0.6, 0.6]]]), (4, 1, 1))
    labels = jnp.ones((4, 1), jnp.int32)
    valid = jnp.ones((4, 1), bool)
    cfg = AugmentConfig()
    fn = jax.jit(lambda i, b, l, v, k: aug.augment_batch(i, b, l, v, k, cfg, 64))
    ex = fn(imgs, boxes, labels, valid, jax.random.key(0))
    assert ex.image.shape == (4, 64, 64, 3)
    assert ex.boxes.shape == (4, 1, 4)


def test_expand_rect_shrinks_boxes(rng):
    img, boxes, labels, valid = _example(rng)
    rect = jnp.array([-0.5, -0.5, 1.5, 1.5])  # 2x zoom-out
    _, b, v = aug.apply_geometric(
        img.astype(jnp.float32) / 255.0, boxes, valid, rect, jnp.array(False), 64
    )
    # boxes shrink by 2 and shift by +0.25
    np.testing.assert_allclose(np.asarray(b)[0], np.asarray(boxes)[0] / 2 + 0.25, atol=1e-5)
    assert bool(v[0]) and bool(v[1])
