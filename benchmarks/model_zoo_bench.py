"""Throughput for every model family (BASELINE configs #2, #3, #5 shapes):
SSD-300/VGG16, SSD-512/ResNet-50, RetinaNet/FPN — bf16 full pipeline."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed
from object_detector_tpu.anchors.priors import anchors_for_model
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.retinanet import build_model
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess


def bench_preset(name: str, batch_size: int):
    cfg = get_config(name)
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    )

    @jax.jit
    def infer(v, images_u8):
        images = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
        cls, box = model.apply(v, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch_size, s, s, 3), dtype=np.uint8))
    dt = timed(infer, variables, images, iters=20)
    print(f"{name:24s} bs={batch_size:3d}: {dt*1e3:7.2f} ms  {batch_size/dt:8.1f} img/s")


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    plan = [
        ("ssd300_infer_bs64", 64),
        ("ssd512_resnet50_coco", 32),
        ("retinanet_fpn_coco", 32),
    ]
    for name, bs in plan:
        if only and only != name:
            continue
        bench_preset(name, bs)
