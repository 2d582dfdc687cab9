"""A/B the pair-packed conv1_1 PRODUCER variants feeding the fused stem
kernel (the kernel itself wins; the producer is what loses — see
kernels/stem_pallas.py STATUS).

Variants: kw=2 (minimal window), kw=3 (square window + zero plane — may
select a different XLA emitter with requant-epilogue fusion).

Run: python -u benchmarks/stem_producer_bench.py
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
from object_detector_tpu.core.config import get_config
from object_detector_tpu.kernels import stem_pallas
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.quant import engine


def main():
    cfg = get_config("ssd300_infer_bs64")
    bs, s = 64, 300
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    params = variables["params"]
    rng = np.random.default_rng(0)
    img = aug_ops.normalize(
        jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)).astype(
            jnp.float32
        )
        / 255.0
    )
    spec = engine.build_ssd_spec(cfg, fused_stem=True)

    stem_op = next(op for op in spec if isinstance(op, engine.FusedStemOp))
    for square in (False, True):
        qp = engine.quantize_ssd(cfg, params, [img[:8]], spec=spec)[0]
        if square:
            # Repack conv1_1 with the square (kw=3) window; conv11_pair_acc
            # infers the pad from the packed-weight shape.
            qp.w_int8[stem_op.path1] = stem_pallas.pack_conv11_pair(
                np.asarray(qp.w_int8[stem_op.path1 + "#plain"]), square=True
            )
        qp = jax.device_put(qp)
        fn = jax.jit(
            lambda q, im: [
                t[0] for t in engine.run_int8(q, spec, im, dequantize_taps=False)
            ]
        )
        dt = timed(fn, qp, img, iters=20)
        print(
            f"fused trunk, conv1_1pp kw={'3(square)' if square else '2'}: "
            f"{dt*1e3:7.3f} ms  {bs/dt:7.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
