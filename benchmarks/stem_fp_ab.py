"""Same-session A/B: two-stage fused stem (XLA producer conv -> Pallas
conv1_2+pool) vs the FULLY-fused stem (conv1_1 inside the kernel over the
tap-stacked 36-lane input, ODT_STEM_FP). Full SSD-300 int8 headline
pipeline at bs=64, interleaved ABAB so tunnel drift cancels; bit-exact
parity asserted on-chip first.

Priced lever (r3 HLO profile): producer chain = copy.41 0.45 ms + producer
conv 0.88 ms, and the kernel reads the 376 MB odd-pair intermediate from
HBM. The fused form replaces all of that with a 106 MB tap-stack read and
one K=36 in-kernel dot (~0.3 ms of MXU work).

SAFETY: probe the new kernel tiny-first (axon wedge hazard — see
TPU_WORK_QUEUE.md): this script runs a (8, 20, 20, 3) compiled probe
before building the full graph.
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
from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import get_config
from object_detector_tpu.kernels import stem_pallas
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine


def tiny_probe() -> None:
    """Compiled == interpret on a tiny shape BEFORE the big graph."""
    rng = np.random.default_rng(7)
    B, H, W = 8, 20, 20
    x_q = rng.integers(-9, 10, (B, H, W, 3)).astype(np.int8)
    w1 = rng.integers(-9, 10, (3, 3, 3, 64)).astype(np.int8)
    w2 = rng.integers(-9, 10, (3, 3, 64, 64)).astype(np.int8)
    deq1 = np.tile((rng.random(64).astype(np.float32) + 0.5) * 1e-2, 2)
    b1 = np.tile(rng.normal(size=64).astype(np.float32) * 0.1, 2)
    deq2 = np.tile((rng.random(64).astype(np.float32) + 0.5) * 1e-2, 2)
    b2 = np.tile(rng.normal(size=64).astype(np.float32) * 0.1, 2)
    codes = jnp.asarray(x_q.reshape(B, H, W // 2, 6))
    args = (
        codes,
        jnp.asarray(stem_pallas.pack_conv11_flat(
            stem_pallas.pack_conv11_pair(w1))),
        jnp.asarray(deq1), jnp.asarray(b1), jnp.float32(0.043),
        jnp.asarray(stem_pallas.pack_conv12_pair(w2)),
        jnp.asarray(deq2), jnp.asarray(b2), jnp.float32(0.021),
    )
    want = stem_pallas.stem_fused_producer(
        *args, out_width=W // 2, band_rows=10, interpret=True
    )
    got = stem_pallas.stem_fused_producer(
        *args, out_width=W // 2, band_rows=10, interpret=False
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("tiny probe: compiled == interpret (bit-exact)", flush=True)


def main() -> None:
    tiny_probe()

    cfg = get_config("ssd300_infer_bs64")
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)),
                           train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_ssd(cfg, variables["params"], [calib])
    qp = jax.device_put(qp)

    def build(fp: bool):
        os.environ["ODT_STEM_FP"] = "1" if fp else "0"

        @jax.jit
        def infer(q, x):
            img = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
            cls, box = qengine.int8_forward(q, spec, cfg, img)
            det = postprocess(cls, box, anchors, cfg, use_pallas=True)
            return det.boxes, det.scores, det.classes, det.valid

        # Trace NOW while the env var is set (trace-time knob).
        infer_c = infer.lower(qp, images).compile()
        return infer_c

    infer_a = build(False)
    infer_b = build(True)
    for f in (infer_a, infer_b):
        jax.block_until_ready(f(qp, images))
        np.asarray(jax.device_get(f(qp, images)[0][:1]))

    a = jax.device_get(infer_a(qp, images))
    b = jax.device_get(infer_b(qp, images))
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    print("parity: two-stage == fully-fused (bit-exact, on-chip)", flush=True)

    rounds = []
    for r in range(4):
        t_a = timed(infer_a, qp, images, iters=30)
        t_b = timed(infer_b, qp, images, iters=30)
        rounds.append((t_a, t_b))
        print(f"round {r}: two-stage={bs/t_a:8.1f} img/s   "
              f"fused-producer={bs/t_b:8.1f} img/s", flush=True)
    med_a = float(np.median([x for x, _ in rounds]))
    med_b = float(np.median([y for _, y in rounds]))
    print(f"median: two-stage={bs/med_a:.1f} fused-producer={bs/med_b:.1f} "
          f"img/s (speedup = {med_a/med_b:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
