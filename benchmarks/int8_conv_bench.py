"""Feasibility check for the int8 inference path: conv/matmul throughput
int8 vs bf16 on this chip (v5e doubles MXU rate for int8)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed


def main():
    rng = np.random.default_rng(0)

    # Matmul sanity: 8k^3.
    N = 8192
    a8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (N, N), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    mm_i8 = jax.jit(lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.int32))
    mm_bf = jax.jit(lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32))
    flops = 2 * N**3
    dt = timed(mm_bf, abf, bbf, iters=30)
    print(f"matmul bf16: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TOP/s")
    dt = timed(mm_i8, a8, b8, iters=30)
    print(f"matmul int8: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TOP/s")

    # Conv shaped like VGG conv2_2: (64,150,150,128) x (3,3,128,128).
    x8 = jnp.asarray(rng.integers(-127, 127, (64, 150, 150, 128), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 128, 128), dtype=np.int8))
    xbf = x8.astype(jnp.bfloat16)
    wbf = w8.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))

    conv_i8 = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
    )
    conv_bf = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    )
    cflops = 2 * 64 * 150 * 150 * 128 * 128 * 9
    dt = timed(conv_bf, xbf, wbf, iters=30)
    print(f"conv bf16:   {dt*1e3:7.3f} ms  {cflops/dt/1e12:6.1f} TOP/s")
    try:
        dt = timed(conv_i8, x8, w8, iters=30)
        print(f"conv int8:   {dt*1e3:7.3f} ms  {cflops/dt/1e12:6.1f} TOP/s")
    except Exception as e:
        print(f"conv int8 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # Fused int8 conv + dequant + relu + requant (the production block shape).
    scale = jnp.float32(0.02)

    @jax.jit
    def conv_i8_fused(x, w):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = jnp.maximum(acc.astype(jnp.float32) * scale, 0.0)
        return jnp.clip(jnp.round(y * 4.0), -127, 127).astype(jnp.int8)

    try:
        dt = timed(conv_i8_fused, x8, w8, iters=30)
        print(f"conv int8 + requant fused: {dt*1e3:7.3f} ms  {cflops/dt/1e12:6.1f} TOP/s")
    except Exception as e:
        print(f"conv int8 fused FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
