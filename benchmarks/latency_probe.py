"""Step probe for the bs=1 bf16 serving-path hang (r5 diagnosis).

The latency stage blocked >19 min at "bf16 compile+measure" with ~0% local
CPU in two sessions today (and the r4 driver session shows the same
signature), while r4's cold verify ran the identical stage in 234 s. This
separates the suspects with timestamped marks:

  1. .lower()           — local tracing/StableHLO (no service, no chip)
  2. .compile()         — remote compile service (PALLAS_AXON_REMOTE_COMPILE)
  3. first execution + fence — on-device run through the tunnel
  4. same program WITHOUT the Pallas NMS (XLA-only) — isolates Mosaic

Usage: timeout 1500 python benchmarks/latency_probe.py [--no-nms-first]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache(scoped_vmem_kib=None)
import jax.numpy as jnp
import numpy as np

T0 = time.monotonic()


def mark(what):
    print(f"[probe +{time.monotonic() - T0:.0f}s] {what}", flush=True)


def main():
    mark(f"backend={jax.default_backend()}")
    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_vgg16_voc")
    s = cfg.model.image_size
    model = SSDModel(cfg)
    mark("init start")
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False
    )
    jax.block_until_ready(jax.tree.leaves(variables)[0])
    mark("init done")
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    params = variables["params"]
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (1, s, s, 3), dtype=np.uint8))

    @jax.jit
    def fwd_only(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        return cls, box

    @jax.jit
    def infer_f(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=True)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def infer_nonms(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=False)
        return det.boxes, det.scores, det.classes, det.valid

    steps = [
        ("fwd_only (no postprocess)", fwd_only),
        ("infer_xla_nms (no Pallas)", infer_nonms),
        ("infer_pallas", infer_f),
    ]
    for name, fn in steps:
        mark(f"{name}: lower start")
        low = fn.lower(params, image)
        mark(f"{name}: lower done, compile start")
        comp = low.compile()
        mark(f"{name}: compile done, exec start")
        out = comp(params, image)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf[tuple(slice(0, 1) for _ in range(leaf.ndim))]))
        mark(f"{name}: exec+fence done")


if __name__ == "__main__":
    main()
