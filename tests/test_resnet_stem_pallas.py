"""Bit-exact parity of the fused Pallas ResNet stem kernel
(kernels/resnet_stem_pallas.py) vs the engine's unfused
quantize -> ConvOp(7x7/s2/pad3) -> PoolOp(3,2,explicit_pad=1) chain.

Interpret mode on CPU (Mosaic semantics, no chip); the on-chip compiled
parity + timing A/B lives in benchmarks/resnet_stem_kernel_ab.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_tpu.kernels import resnet_stem_pallas as rsp
from object_detector_tpu.quant.engine import ConvOp, PoolOp, _conv, _pool


def _reference(images, w_q, w_scale, bias, in_scale, out_scale):
    """Engine-identical unfused math (run_int8's ConvOp+PoolOp branches)."""
    x = jnp.clip(jnp.round(images / in_scale), -127, 127).astype(jnp.int8)
    op = ConvOp("stem", kernel=7, stride=2, padding=3)
    acc = _conv(x, jnp.asarray(w_q), op, jnp.int32)
    y = acc.astype(jnp.float32) * (in_scale * jnp.asarray(w_scale)) + bias
    y = jnp.maximum(y, 0.0)
    q = jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    return _pool(q, PoolOp(3, 2, explicit_pad=1))


def _rand_case(rng, b, s):
    images = jnp.asarray(rng.normal(0, 1.2, (b, s, s, 3)).astype(np.float32))
    w_q = jnp.asarray(rng.integers(-127, 128, (7, 7, 3, 64), dtype=np.int64)
                      .astype(np.int8))
    w_scale = jnp.asarray(rng.uniform(0.005, 0.02, 64).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, 64).astype(np.float32))
    return images, w_q, w_scale, bias, 0.02, 0.07


@pytest.mark.parametrize("size", [32, 64])
def test_stem_kernel_matches_engine_chain(rng, size):
    images, w_q, w_scale, bias, s_in, s_out = _rand_case(rng, 2, size)
    ref = _reference(images, w_q, w_scale, bias, s_in, s_out)
    got = rsp.resnet_stem_int8(
        images, w_q, w_scale, bias, s_in, s_out, interpret=True
    )
    assert got.shape == ref.shape == (2, size // 4, size // 4, 64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stem_kernel_edge_values(rng):
    """Saturated inputs + extreme biases drive the clip/round boundaries
    and the x/y padding rows into play."""
    s = 32
    images = jnp.asarray(
        rng.choice([-2.6, -0.02, 0.0, 0.02, 2.6], (1, s, s, 3))
        .astype(np.float32)
    )
    w_q = jnp.asarray(
        rng.choice([-127, -1, 0, 1, 127], (7, 7, 3, 64)).astype(np.int8)
    )
    w_scale = jnp.full(64, 0.01, jnp.float32)
    bias = jnp.asarray(rng.normal(0, 3.0, 64).astype(np.float32))
    ref = _reference(images, w_q, w_scale, bias, 0.02, 0.05)
    got = rsp.resnet_stem_int8(
        images, w_q, w_scale, bias, 0.02, 0.05, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stage_and_pack_shapes():
    images = jnp.zeros((3, 64, 64, 3), jnp.float32)
    staged = rsp.stage_stem_input(images, 0.02)
    assert staged.shape == (3, 70 * 16, 16)
    a = rsp.pack_stem_weights(jnp.ones((7, 7, 3, 64), jnp.int8))
    assert a.shape == (3, 128, 128)
    # every real tap lands exactly once: 2 parities * 7*7*3 taps * 64 couts
    assert int(jnp.sum(a)) == 2 * 7 * 7 * 3 * 64
    # padded K columns (>= 112) are structurally zero
    assert int(jnp.sum(jnp.abs(a[:, :, 112:]))) == 0
