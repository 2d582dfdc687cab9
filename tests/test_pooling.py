"""Structured 2x2/s2 max-pool: forward parity vs reduce_window, and
gradient validity (window cotangent sum preserved; exact match on
unique-max windows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from object_detector_tpu.ops.pooling import max_pool_2x2


def _ref_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("tie_heavy", [False, True])
def test_forward_exact(tie_heavy):
    rng = np.random.default_rng(3 if tie_heavy else 4)
    x = rng.normal(size=(2, 8, 12, 5)).astype(np.float32)
    if tie_heavy:
        x = np.maximum(x, 0.0) * (rng.random(x.shape) > 0.5)
    x = jnp.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2(x)), np.asarray(_ref_pool(x))
    )


def test_grad_exact_on_unique_max():
    # Distinct values in every window -> subgradient is unique -> must
    # match the select_and_scatter reference exactly.
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.permutation(2 * 8 * 12 * 5).reshape(2, 8, 12, 5).astype(np.float32)
    )
    cot = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
    g_new = jax.grad(lambda v: jnp.sum(max_pool_2x2(v) * cot))(x)
    g_ref = jax.grad(lambda v: jnp.sum(_ref_pool(v) * cot))(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_grad_window_sum_preserved_on_ties():
    # ReLU-zero heavy input: ties resolve differently from
    # select_and_scatter (jnp.maximum splits 0.5/0.5), but each window
    # must still distribute exactly its cotangent.
    rng = np.random.default_rng(9)
    x = np.maximum(rng.normal(size=(2, 8, 12, 5)), 0.0) * (
        rng.random((2, 8, 12, 5)) > 0.6
    )
    x = jnp.asarray(x.astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
    g = np.asarray(jax.grad(lambda v: jnp.sum(max_pool_2x2(v) * cot))(x))
    win_sums = g.reshape(2, 4, 2, 6, 2, 5).sum(axis=(2, 4))
    np.testing.assert_allclose(win_sums, np.asarray(cot), rtol=1e-6, atol=1e-6)


def test_bf16_and_odd_shape_error():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)), dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2(x).astype(jnp.float32)),
        np.asarray(_ref_pool(x).astype(jnp.float32)),
    )
    with pytest.raises(ValueError):
        max_pool_2x2(jnp.zeros((1, 5, 4, 3)))


class TestFastgradPool:
    """max_pool_2x2_fastgrad: XLA forward + Pallas first-max backward.

    The gradient contract is BITWISE select_and_scatter (first window
    position in scan order takes the whole cotangent), so every test
    compares against jax.grad(nn.max_pool) with array_equal."""

    def _fg(self):
        from object_detector_tpu.ops.pooling import max_pool_2x2_fastgrad
        return max_pool_2x2_fastgrad

    def test_forward_bitwise(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(self._fg()(x)), np.asarray(_ref_pool(x))
        )

    @pytest.mark.parametrize("tie_heavy", [False, True])
    def test_grad_bitwise_vs_select_and_scatter(self, tie_heavy):
        rng = np.random.default_rng(13 if tie_heavy else 17)
        x = rng.normal(size=(2, 8, 12, 5)).astype(np.float32)
        if tie_heavy:
            x = np.maximum(x, 0.0) * (rng.random(x.shape) > 0.6)
        x = jnp.asarray(x)
        cot = jnp.asarray(rng.normal(size=(2, 4, 6, 5)).astype(np.float32))
        g_new = jax.grad(lambda v: jnp.sum(self._fg()(v) * cot))(x)
        g_ref = jax.grad(lambda v: jnp.sum(_ref_pool(v) * cot))(x)
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))

    def test_grad_bf16_bitwise(self):
        rng = np.random.default_rng(19)
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 3)), dtype=jnp.bfloat16)
        cot = jnp.asarray(rng.normal(size=(2, 3, 4, 3)).astype(np.float32))
        g_new = jax.grad(
            lambda v: jnp.sum(self._fg()(v).astype(jnp.float32) * cot))(x)
        g_ref = jax.grad(
            lambda v: jnp.sum(_ref_pool(v).astype(jnp.float32) * cot))(x)
        np.testing.assert_array_equal(
            np.asarray(g_new, dtype=np.float32),
            np.asarray(g_ref, dtype=np.float32),
        )

    def test_grid_blocking_odd_divisors(self):
        # H2=19 (prime, single block) and H2=15 (divisor-12 fallback path).
        for h in (38, 30):
            rng = np.random.default_rng(h)
            x = jnp.asarray(rng.normal(size=(1, h, 8, 4)).astype(np.float32))
            cot = jnp.asarray(
                rng.normal(size=(1, h // 2, 4, 4)).astype(np.float32))
            g_new = jax.grad(lambda v: jnp.sum(self._fg()(v) * cot))(x)
            g_ref = jax.grad(lambda v: jnp.sum(_ref_pool(v) * cot))(x)
            np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))

    def test_odd_shape_error(self):
        with pytest.raises(ValueError):
            self._fg()(jnp.zeros((1, 5, 4, 3)))
