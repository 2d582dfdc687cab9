"""Checkpoint/resume round trip (SURVEY.md §5)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.train.checkpoint import CheckpointManager
from object_detector_tpu.train.loop import init_model_state


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_test_config()
    _, state = init_model_state(cfg, jax.random.key(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    rng = jax.random.key(42)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, save_every=1)
    assert mgr.save(state, rng, data_step=123)
    mgr.wait()

    _, template = init_model_state(cfg, jax.random.key(1))  # different init
    restored = mgr.restore(template, jax.random.key(0))
    assert restored is not None
    r_state, r_rng, r_data_step = restored
    assert int(r_state.step) == 7
    assert r_data_step == 123
    np.testing.assert_array_equal(
        jax.random.key_data(r_rng), jax.random.key_data(rng)
    )
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(r_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_none_when_empty(tmp_path):
    cfg = tiny_test_config()
    _, state = init_model_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "empty"), keep=1, save_every=1)
    assert mgr.restore(state, jax.random.key(0)) is None
    mgr.close()


@pytest.mark.slow
def test_train_refuses_stale_checkpoint_dir_without_resume(tmp_path):
    """Training into a directory that already holds a checkpoint must fail
    loudly unless --resume: orbax silently refuses saves at steps <= the
    existing latest step, so the run would 'train' while the directory
    keeps serving the old (possibly different-model) checkpoint."""
    from object_detector_tpu.data.synthetic import make_synthetic_dataset
    from object_detector_tpu.train.loop import train

    cfg = tiny_test_config().override(
        {"train.num_steps": 1, "train.checkpoint_every": 1}
    )
    dataset = make_synthetic_dataset(num_images=8, image_size=64)
    ckpt = str(tmp_path / "ckpt")
    train(cfg, dataset, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="already has a checkpoint"):
        train(cfg, dataset, checkpoint_dir=ckpt)
    # resume=True continues instead (num_steps already reached -> no-op).
    train(cfg, dataset, checkpoint_dir=ckpt, resume=True)
