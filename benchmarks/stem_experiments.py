"""Experiments for the SSD-300 block-1 bottleneck (profile_int8: conv1_1
2.79 ms, conv1_2 1.70 ms, pool1 1.29 ms of a 20.6 ms program).

Variants measured on the real chip; each prints ms and implied img/s
contribution. Run: python benchmarks/stem_experiments.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed

B, S, C1 = 64, 300, 64


def main():
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.integers(-127, 127, (B, S, S, 3), dtype=np.int8))
    x64 = jnp.asarray(rng.integers(-127, 127, (B, S, S, C1), dtype=np.int8))
    w1 = jnp.asarray(rng.integers(-127, 127, (3, 3, 3, C1), dtype=np.int8))
    w1f = w1.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
    deq = jnp.asarray(rng.random(C1, dtype=np.float32) * 0.01)
    bias = jnp.asarray(rng.random(C1, dtype=np.float32))

    dn = jax.lax.conv_dimension_numbers(
        x3.shape, w1.shape, ("NHWC", "HWIO", "NHWC")
    )

    def requant(y):
        y = y * deq + bias
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)

    # --- conv1_1 variants -------------------------------------------------
    @jax.jit
    def conv11_s8(x):
        acc = jax.lax.conv_general_dilated(
            x, w1, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return requant(acc.astype(jnp.float32))

    @jax.jit
    def conv11_bf16(x):
        acc = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w1f, (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        return requant(acc)

    @jax.jit
    def conv11_im2col(x):
        # 9 shifted copies -> (B,S,S,27) patches, then a K=27 matmul.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, ky : ky + S, kx : kx + S, :]
            for ky in range(3)
            for kx in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B,S,S,27)
        acc = jax.lax.dot_general(
            patches, w1.reshape(27, C1),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return requant(acc.astype(jnp.float32))

    for name, fn in [
        ("conv1_1 s8 direct", conv11_s8),
        ("conv1_1 bf16", conv11_bf16),
        ("conv1_1 s8 im2col", conv11_im2col),
    ]:
        dt = timed(fn, x3, iters=30)
        print(f"{name:28s} {dt*1e3:7.3f} ms")

    # --- pool1 variants ---------------------------------------------------
    @jax.jit
    def pool_rw(x):
        return jax.lax.reduce_window(
            x, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    @jax.jit
    def pool_reshape(x):
        r = x.reshape(B, S // 2, 2, S // 2, 2, C1)
        return jnp.max(jnp.max(r, axis=4), axis=2)

    @jax.jit
    def pool_slice_rows(x):
        # rows via strided slice, cols via reshape
        a = jnp.maximum(x[:, 0::2], x[:, 1::2])  # (B,150,300,C)
        r = a.reshape(B, S // 2, S // 2, 2, C1)
        return jnp.max(r, axis=3)

    for name, fn in [
        ("pool1 reduce_window s8", pool_rw),
        ("pool1 reshape-max s8", pool_reshape),
        ("pool1 rowslice+reshape s8", pool_slice_rows),
    ]:
        dt = timed(fn, x64, iters=30)
        print(f"{name:28s} {dt*1e3:7.3f} ms")

    # --- fused conv1_2 + pool epilogue (f32 pool pre-requant) -------------
    w2 = jnp.asarray(rng.integers(-127, 127, (3, 3, C1, C1), dtype=np.int8))

    @jax.jit
    def conv12_then_pool(x):
        acc = jax.lax.conv_general_dilated(
            x, w2, (1, 1), "SAME", dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
            ), preferred_element_type=jnp.int32,
        )
        q = requant(acc.astype(jnp.float32))
        return pool_rw(q)

    dt = timed(conv12_then_pool, x64, iters=30)
    print(f"{'conv1_2+requant+pool s8':28s} {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
