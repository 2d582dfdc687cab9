"""Headline benchmark: SSD-300 batched inference images/sec/chip.

Runs the full on-chip inference program (uint8 batch -> normalize -> int8
VGG16 SSD trunk -> bf16 heads -> decode -> Pallas per-class NMS) at bs=64
on one chip — BASELINE.json config #2 / the ≥5000 img/s/chip north star.
The int8 trunk is the production serving path (v5e doubles MXU rate for
int8; PTQ parity is tested in tests/test_quant.py); on non-TPU backends
the bench falls back to the float path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (the BASELINE.json target; the reference repo
publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax

    from object_detector_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_infer_bs64")
    batch_size = cfg.eval.batch_size
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"

    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch_size, s, s, 3), dtype=np.uint8))
    float_params = variables["params"]

    if on_tpu:
        # Production path: int8 PTQ trunk + int8 heads (quant/engine.py).
        from object_detector_tpu.quant import engine as qengine

        spec = qengine.build_ssd_spec(cfg)
        # Calibration scales are deterministic for this seeded model; use
        # the committed fixture to skip compiling the calibration program
        # (keeps bench wall-clock bounded for the driver).
        scales_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "bench_act_scales.json",
        )
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                scales = {k: float(v) for k, v in json.load(f).items()}
        else:
            calib = aug_ops.normalize(images[:16].astype(jnp.float32) / 255.0)
            scales = qengine.calibrate_scales(float_params, spec, [calib])
            with open(scales_path, "w") as f:
                json.dump(scales, f, indent=1)
        qp = qengine.quantize_params(float_params, spec, scales)
        params = jax.device_put(qp)

        @jax.jit
        def infer(p, images_u8):
            imgs = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
            cls_logits, box_offsets = qengine.int8_forward(p, spec, cfg, imgs)
            det = postprocess(cls_logits, box_offsets, anchors, cfg, use_pallas=True)
            return det.boxes, det.scores, det.classes, det.valid

    else:
        params = float_params

        @jax.jit
        def infer(p, images_u8):
            imgs = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
            cls_logits, box_offsets = model.apply({"params": p}, imgs, train=False)
            det = postprocess(cls_logits, box_offsets, anchors, cfg, use_pallas=False)
            return det.boxes, det.scores, det.classes, det.valid

    # Tunnel-correct timing (device_get fence; block_until_ready is a no-op
    # under axon — see benchmarks/timing.py).
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.timing import timed

    n_iters = 50 if on_tpu else 3
    dt = timed(infer, params, images, iters=n_iters)
    imgs_per_sec = batch_size / dt

    result = {
        "metric": "ssd300_inference_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 4),
    }

    if on_tpu:
        # Data-dependent-cost sensitivity (VERDICT r1 weak #4): the XLA
        # graph is shape-static, but the Pallas NMS early-exit depends on
        # the score distribution. The headline uses the seeded init (class
        # prior bias -4.6 -> ~1% of anchors above threshold — the
        # conservative, candidate-heavy case). Re-measure the SAME compiled
        # graph with head biases pushed to a trained-model-like sparse
        # profile to bracket the range.
        import jax.tree_util as jtu

        def sparsify(path, leaf):
            keys = [getattr(p, "key", "") for p in path]
            if "cls" in keys and keys[-1] == "bias":
                return leaf - 4.0  # sigmoid ~2e-4: sparse trained profile
            return leaf

        sparse_float = jtu.tree_map_with_path(sparsify, float_params)
        sparse_params = jax.device_put(
            qengine.quantize_params(sparse_float, spec, scales)
        )
        dt_sparse = timed(infer, sparse_params, images, iters=n_iters)
        result["imgs_per_sec_sparse_scores"] = round(batch_size / dt_sparse, 1)

        # p50 bs=1 latency (BASELINE metric #3) measured in a SUBPROCESS:
        # the 64 MiB scoped-VMEM throughput flag is process-wide and
        # latency-hostile, so the latency path must boot its own process
        # with the default VMEM config (guarded by tests/test_vmem_guard).
        import subprocess

        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "latency_bench.py"),
                 "--json"],
                capture_output=True, text=True, timeout=480,
                env={k: v for k, v in os.environ.items()
                     if k != "LIBTPU_INIT_ARGS"},
            )
            last = out.stdout.strip().splitlines()[-1]
            result.update(json.loads(last))
        except Exception:
            result["p50_latency_ms_bs1"] = None

    print(json.dumps(result))


if __name__ == "__main__":
    main()
