"""A/B full-trunk timing of spec variants (in-context, reliable — unlike
isolated op timing, which is dominated by jit-boundary int8 relayouts).

Run: python benchmarks/trunk_variants_bench.py
"""

import dataclasses
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
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.quant import engine


def main():
    cfg = get_config("ssd300_infer_bs64")
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    params = variables["params"]
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    img = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
    calib = img[:8]
    base_spec = engine.build_spec(cfg)
    qp, _ = engine.quantize_ssd(
        cfg, params, [calib], batch_stats=variables.get("batch_stats")
    )
    qp = jax.device_put(qp)

    def variant(name, mutate, quant_spec=False):
        spec = mutate(list(base_spec))
        q = requant(spec) if quant_spec else qp
        fn = jax.jit(
            lambda q, im: [
                t[0] for t in engine.run_int8(q, spec, im, dequantize_taps=False)
            ]
        )
        dt = timed(fn, q, img, iters=30)
        print(f"{name:44s} {dt*1e3:7.3f} ms  {bs/dt:7.1f} img/s(trunk)")
        return dt

    def set_algo(spec, path, algo):
        return [
            dataclasses.replace(op, algo=algo)
            if isinstance(op, engine.ConvOp) and op.path == path
            else op
            for op in spec
        ]

    def fuse_pool(spec, path):
        out = []
        skip_next_pool = False
        for op in spec:
            if isinstance(op, engine.ConvOp) and op.path == path:
                out.append(engine.PackedConvPoolOp(path))
                skip_next_pool = True
            elif skip_next_pool and isinstance(op, engine.PoolOp):
                skip_next_pool = False
            else:
                out.append(op)
        return out

    def requant(spec):
        qp2, _ = engine.quantize_ssd(
            cfg, params, [calib], batch_stats=variables.get("batch_stats"),
            spec=spec,
        )
        return jax.device_put(qp2)

    variant("baseline", lambda sp: sp)
    variant(
        "fused stem (odd-pair conv1_1 + pallas conv1_2+pool)",
        lambda sp: engine.build_ssd_spec(cfg, fused_stem=True),
        quant_spec=True,
    )
    if "--packed" in sys.argv:
        variant(
            "conv1_2+pool1 packed",
            lambda sp: fuse_pool(sp, "backbone/conv1_2"),
            quant_spec=True,
        )


if __name__ == "__main__":
    main()
