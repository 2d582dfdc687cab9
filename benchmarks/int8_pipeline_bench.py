"""Full int8 SSD-300 inference pipeline bench at bs=64 (v5e-1)."""

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
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd300_infer_bs64"
    cfg = get_config(preset)
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else cfg.eval.batch_size
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    params = variables["params"]
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images_u8[:8].astype(jnp.float32) / 255.0)
    qp, spec = engine.quantize_ssd(
        cfg, params, [calib], batch_stats=variables.get("batch_stats")
    )

    qp_dev = jax.device_put(qp)  # dataclass of dicts -> device arrays

    @jax.jit
    def infer_int8(q, x_u8):
        images = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        cls, box = engine.int8_forward(q, spec, cfg, images)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def trunk_int8(q, x_u8):
        images = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        return engine.run_int8(q, spec, images)

    dt = timed(trunk_int8, qp_dev, images_u8, iters=30)
    print(f"int8 trunk only:   {dt*1e3:7.2f} ms  {bs/dt:8.1f} img/s")
    dt = timed(infer_int8, qp_dev, images_u8, iters=30)
    print(f"int8 full pipeline:{dt*1e3:7.2f} ms  {bs/dt:8.1f} img/s")


if __name__ == "__main__":
    main()
