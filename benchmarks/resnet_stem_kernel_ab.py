"""A/B: fused Pallas ResNet stem kernel (StemPoolPallasOp) vs the plain
engine chain — isolated stage AND end-to-end SSD-512 / RetinaNet headline.

The r5 Mosaic-level lever (TPU_WORK_QUEUE.md): every XLA formulation of
the 7x7/s2 stem measured a loss (chip_logs/stem_packed_ab.log), the chain
costs ~4.6 ms at bs=64 (conv 2.2 + pool 1.0 + input-quantize 1.4) vs a
~0.5 ms MXU roofline. The kernel (kernels/resnet_stem_pallas.py,
parity-split-lane formulation) fuses quantize+conv+BN+relu+requant+pool.

Arms (interleaved ABAB x rounds, one process, compiled-parity asserted
on-device before timing):
  isolated : stage+kernel+NHWC-transpose vs quantize+conv+requant+pool
  e2e      : headline._bench_int8 with ODT_STEM_KERNEL=0 then =1

Usage:  timeout 1500 python benchmarks/resnet_stem_kernel_ab.py [--e2e]
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

B = 64


def isolated(size: int) -> None:
    from object_detector_tpu.kernels import resnet_stem_pallas as rsp
    from object_detector_tpu.quant.engine import ConvOp, PoolOp, _conv, _pool

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1.2, (B, size, size, 3)).astype(np.float32)
    )
    w_q = jnp.asarray(
        rng.integers(-127, 128, (7, 7, 3, 64), dtype=np.int64).astype(np.int8)
    )
    w_scale = jnp.asarray(rng.uniform(0.005, 0.02, 64).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, 64).astype(np.float32))
    s_in, s_out = 0.02, 0.07

    @jax.jit
    def plain(imgs):
        x = jnp.clip(jnp.round(imgs / s_in), -127, 127).astype(jnp.int8)
        op = ConvOp("stem", kernel=7, stride=2, padding=3)
        acc = _conv(x, w_q, op, jnp.int32)
        y = acc.astype(jnp.float32) * (s_in * w_scale) + bias
        y = jnp.maximum(y, 0.0)
        q = jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)
        return _pool(q, PoolOp(3, 2, explicit_pad=1))

    chunk = int(os.environ.get("ODT_STEM_CHUNK", "16"))

    @jax.jit
    def fused(imgs):
        return rsp.resnet_stem_int8(imgs, w_q, w_scale, bias, s_in, s_out,
                                    chunk=chunk)

    a = jax.device_get(plain(images))
    b = jax.device_get(fused(images))
    exact = bool((a == b).all())
    print(f"[isolated {size}px] on-device parity exact={exact}", flush=True)
    if not exact:
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        print(f"  MISMATCH: max|diff|={diff.max()} at {diff.sum()} cells")
        return
    for rnd in range(3):
        dt_a = timed(plain, images, iters=30)
        dt_b = timed(fused, images, iters=30)
        print(
            f"[isolated {size}px r{rnd}] plain {dt_a*1e3:7.3f} ms | "
            f"kernel {dt_b*1e3:7.3f} ms | speedup {dt_a/dt_b:.3f}x",
            flush=True,
        )


def e2e() -> None:
    import benchmarks.headline as h

    for rnd in range(2):
        for env, label in (("0", "plain "), ("1", "kernel")):
            os.environ["ODT_STEM_KERNEL"] = env
            r1 = h._bench_int8("ssd512_resnet50_coco", 64)
            print(f"[e2e ssd512 r{rnd}] {label} {r1:8.1f} img/s", flush=True)
    for rnd in range(2):
        for env, label in (("0", "plain "), ("1", "kernel")):
            os.environ["ODT_STEM_KERNEL"] = env
            r2 = h._bench_int8("retinanet_fpn_coco", 64)
            print(f"[e2e retina r{rnd}] {label} {r2:8.1f} img/s", flush=True)


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        e2e()
    else:
        isolated(512)
        if "--retina-size" in sys.argv:
            isolated(640)
