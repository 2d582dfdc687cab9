"""p50 single-image latency (BASELINE metric #3): uint8 image -> detections,
bs=1, full on-chip pipeline."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache(scoped_vmem_kib=None)  # latency path: default VMEM
import jax.numpy as jnp
import numpy as np


def main():
    if "--json" in sys.argv and jax.default_backend() != "tpu":
        # bench.py probes latency unconditionally (before it knows its own
        # backend); don't burn minutes on a CPU forward loop.
        import json

        print(json.dumps({
            "p50_latency_ms_bs1": None,
            "latency_skipped": f"backend={jax.default_backend()}",
        }))
        return

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_vgg16_voc")
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))

    @jax.jit
    def infer(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (1, s, s, 3), dtype=np.uint8))
    params = variables["params"]

    from benchmarks.timing import fetch_overhead, timed

    # On-device compute latency (tunnel-corrected, steady state).
    dt = timed(infer, params, image, iters=100)
    print(f"bs=1 on-device latency (p50 proxy, steady state): {dt*1e3:.2f} ms")

    # End-to-end including the tunnel round-trip (what a remote client sees).
    out = infer(params, image)
    rt = fetch_overhead(out)
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        o = infer(params, image)
        _ = jax.device_get(jax.tree.leaves(o)[0][:1])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    print(
        f"end-to-end (incl. ~{rt*1e3:.0f}ms tunnel RT): "
        f"p50={np.percentile(lat, 50):.2f}ms p90={np.percentile(lat, 90):.2f}ms"
    )
    if "--json" in sys.argv:
        import json

        print(json.dumps({
            "p50_latency_ms_bs1": round(dt * 1e3, 3),
            "e2e_p50_ms_incl_tunnel": round(float(np.percentile(lat, 50)), 2),
        }))


if __name__ == "__main__":
    main()
