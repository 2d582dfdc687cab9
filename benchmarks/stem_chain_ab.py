"""A/B the stem-chain input seam: does conv1_1 emitting the kernel's
(H+2, Jp, B, 128) order directly ("HWNC") beat the NHWC-emit + transpose
the launcher does today?

The r3 profile showed a 0.45 ms `copy` feeding the Pallas stem kernel —
the transpose that SHOULD be a layout bitcast (the conv's {3,0,2,1}
output layout has exactly the kernel's physical order) but that XLA still
materializes. Emitting "HWNC" from conv_general_dilated removes the
transpose from the graph; the risk is the conv emitter picking a worse
variant (the original layout-matching work measured +2.7 ms when the
conv/kernel layouts disagreed).

Run: python benchmarks/stem_chain_ab.py   (real chip)
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
from object_detector_tpu.kernels import stem_pallas

B, S = 64, 300


def main():
    import time

    t0 = time.time()
    jnp.ones((8, 8)).sum().block_until_ready()
    print(f"tunnel up: {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-9, 10, (B, S, S, 3), dtype=np.int8))
    w1 = rng.integers(-9, 10, (3, 3, 3, 64)).astype(np.int8)
    w2 = rng.integers(-9, 10, (3, 3, 64, 64)).astype(np.int8)
    w1pp = jnp.asarray(stem_pallas.pack_conv11_pair(w1))
    w2pp = jnp.asarray(stem_pallas.pack_conv12_pair(w2))
    deq1 = jnp.asarray(np.tile((rng.random(64) + 0.5) * 1e-2, 2).astype(np.float32))
    b1 = jnp.asarray(np.tile(rng.normal(size=64) * 0.1, 2).astype(np.float32))
    deq2 = jnp.asarray(np.tile((rng.random(64) + 0.5) * 1e-2, 2).astype(np.float32))
    b2 = jnp.asarray(np.tile(rng.normal(size=64) * 0.1, 2).astype(np.float32))
    s1, s2 = 0.043, 0.021
    band = stem_pallas.stem_band_rows(S)

    def requant1(acc):
        y = jnp.maximum(acc.astype(jnp.float32) * deq1 + b1, 0.0)
        return jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)

    @jax.jit
    def chain_nhwc(xq):
        q = requant1(stem_pallas.conv11_pair_acc(xq, w1pp))
        return stem_pallas.conv12_pool_pair(
            q, w2pp, deq2, b2, jnp.float32(s2),
            out_width=S // 2, band_rows=band,
        )

    @jax.jit
    def chain_hwnc(xq):
        q = requant1(stem_pallas.conv11_pair_acc(xq, w1pp, out_order="HWNC"))
        return stem_pallas.conv12_pool_pair(
            q, w2pp, deq2, b2, jnp.float32(s2),
            out_width=S // 2, band_rows=band, input_transposed=True,
        )

    # Tiny-first probe (new conv emit variant; see axon-tunnel fragility).
    # B=8, not smaller: the engine routes b%8!=0 to the unfused fallback,
    # and the kernel's nb=1 emit reshape does not lower in Mosaic.
    xt = x[:8]
    at = jax.device_get(chain_nhwc(xt))
    print(f"tiny nhwc ok {at.shape} {time.time()-t0:.1f}s", flush=True)
    bt = jax.device_get(chain_hwnc(xt))
    print(f"tiny hwnc ok {bt.shape} {time.time()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(at, bt)

    a = jax.device_get(chain_nhwc(x))
    print(f"full nhwc ok {time.time()-t0:.1f}s", flush=True)
    b = jax.device_get(chain_hwnc(x))
    print(f"full hwnc ok {time.time()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(a, b)
    print("parity: HWNC == NHWC ok", a.shape, flush=True)

    for name, fn in (("nhwc+transpose", chain_nhwc), ("hwnc direct", chain_hwnc)):
        dt = timed(fn, x, iters=30)
        print(f"stem chain {name:15s}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
