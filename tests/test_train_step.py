"""Integration: jitted train step on the tiny config + DP equivalence.

- overfit-one-batch: loss decreases over a few dozen steps (SURVEY.md §4)
- 8-device DP step == single-device step on the same global batch
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.data.pipeline import DecodedCache
from object_detector_tpu.data.synthetic import make_synthetic_dataset
from object_detector_tpu.parallel import mesh as mesh_lib
from object_detector_tpu.train.loop import init_model_state
from object_detector_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model, _ = init_model_state(cfg, jax.random.key(0))
    anchors = ssd_anchors(cfg.anchors, cfg.model.image_size)
    ds = make_synthetic_dataset(num_images=8, image_size=cfg.model.image_size)
    cache = DecodedCache(ds, cfg.model.image_size, cfg.data.max_boxes, num_workers=1)
    batch = {k: jnp.asarray(v) for k, v in cache.gather(np.arange(8)).items()}
    return cfg, model, anchors, batch


@pytest.mark.slow
def test_overfit_one_batch(setup):
    cfg, model, anchors, batch = setup
    # Fresh state per test: the step donates its input state buffers.
    _, state = init_model_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, model, anchors, mesh=None, augment=False)
    rng = jax.random.key(1)
    losses = []
    for _ in range(40):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_dp8_matches_single_device(setup):
    cfg, model, anchors, batch = setup
    # One init, two independent buffer copies (the step donates its input
    # state; a second init_model_state costs ~15 s of XLA:CPU compile).
    _, state_a = init_model_state(cfg, jax.random.key(0))
    state_b = jax.tree.map(jnp.array, state_a)
    rng = jax.random.key(2)

    single = make_train_step(cfg, model, anchors, mesh=None, augment=False)
    state_a, metrics_a = single(state_a, batch, rng)

    mesh = mesh_lib.make_mesh(8)
    sharded = make_train_step(cfg, model, anchors, mesh=mesh, augment=False)
    dev_batch = mesh_lib.shard_batch(mesh, batch)
    state_b, metrics_b = sharded(state_b, dev_batch, rng)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4
    )
    # Parameters must agree after the update (reduction-order tolerance).
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_augmented_step_runs(setup):
    cfg, model, anchors, batch = setup
    _, state = init_model_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, model, anchors, mesh=None, augment=True)
    state, metrics = step_fn(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
