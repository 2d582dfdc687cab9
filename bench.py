"""Headline benchmark: SSD-300 batched inference images/sec/chip.

Runs the full on-chip inference program (uint8 batch -> normalize -> int8
VGG16 SSD trunk with the fused Pallas block-1 stem -> int8 heads -> decode
-> Pallas per-class NMS) at bs=64 on one chip — BASELINE.json config #2 /
the ≥5000 img/s/chip north star. The spec comes from
`quant.engine.build_spec` — the SAME resolution the production serving path
(quantize_ssd/evaluator/CLI) uses, so the published number measures the
shipped default (VERDICT r2 weak #1). On non-TPU backends the bench falls
back to the float path.

Ordering matters: the p50 bs=1 latency metric (BASELINE metric #3) is
measured FIRST, in a clean subprocess, before this process initializes its
TPU client — the 64 MiB scoped-VMEM throughput flag is process-wide and
latency-hostile, and two live clients contending for the single tunneled
chip was the silent failure mode that nulled the metric in r2
(VERDICT r2 weak #2). Failures are printed to stderr, never swallowed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
vs_baseline is value / 5000 (the BASELINE.json target; the reference repo
publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))


def _measure_latency(timeout_s: int = 540) -> dict:
    """p50 bs=1 latency in a fresh subprocess with the default VMEM config.

    MUST run before the parent touches jax/TPU: the subprocess needs sole
    ownership of the chip and a LIBTPU_INIT_ARGS-free environment.
    """
    env = {k: v for k, v in os.environ.items() if k != "LIBTPU_INIT_ARGS"}
    script = os.path.join(_HERE, "benchmarks", "latency_bench.py")
    try:
        out = subprocess.run(
            [sys.executable, script, "--json"],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired as e:
        err = (e.stderr or b"")
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        print(
            f"[bench] latency subprocess TIMED OUT after {timeout_s}s; "
            f"stderr tail:\n{err[-2000:]}",
            file=sys.stderr,
        )
        return {"p50_latency_ms_bs1": None}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "p50_latency_ms_bs1" in d:
            return d
    print(
        f"[bench] latency subprocess produced no JSON (rc={out.returncode}); "
        f"stdout tail:\n{out.stdout[-1000:]}\nstderr tail:\n{out.stderr[-2000:]}",
        file=sys.stderr,
    )
    return {"p50_latency_ms_bs1": None}


def _probe_backend(timeout_s: int = 120) -> str:
    """Bounded backend probe in a clean subprocess. Returns "tpu"/"cpu"/
    ... or "hang" if client init never answers (e.g. the axon tunnel is
    wedged by a previously killed client — in that state ANY jax import
    in this process would block forever, so the caller must bail out
    instead of binding the TPU)."""
    env = {k: v for k, v in os.environ.items() if k != "LIBTPU_INIT_ARGS"}
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return "hang"
    lines = probe.stdout.strip().splitlines()
    return lines[-1] if lines else f"error rc={probe.returncode}"


def _measure_train(timeout_s: int = 540) -> dict:
    """Train-step throughput (BASELINE config #4 unit: bs=32 per-chip) in a
    clean subprocess, before the parent binds the TPU — same isolation
    rationale as `_measure_latency` (the scoped-VMEM throughput flag is
    inference-tuned, and two live clients on the single tunneled chip
    deadlock)."""
    env = {k: v for k, v in os.environ.items() if k != "LIBTPU_INIT_ARGS"}
    if _probe_backend() != "tpu":
        # bs=32 at 300px is minutes/step on CPU — only measure on TPU.
        print("[bench] backend is not a healthy tpu; skipping train bench",
              file=sys.stderr)
        return {"train_images_per_sec_chip": None}
    script = os.path.join(_HERE, "benchmarks", "train_bench.py")
    try:
        out = subprocess.run(
            [sys.executable, script, "32", "--iters", "12", "--json"],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired as e:
        err = e.stderr or b""
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        print(
            f"[bench] train subprocess TIMED OUT after {timeout_s}s; "
            f"stderr tail:\n{err[-2000:]}",
            file=sys.stderr,
        )
        return {"train_images_per_sec_chip": None}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "train_images_per_sec_chip" in d:
            return d
    print(
        f"[bench] train subprocess produced no JSON (rc={out.returncode}); "
        f"stdout tail:\n{out.stdout[-1000:]}\nstderr tail:\n{out.stderr[-2000:]}",
        file=sys.stderr,
    )
    return {"train_images_per_sec_chip": None}


def main() -> None:
    # Wedged-tunnel guard FIRST: if a previously killed client left the
    # axon pool holding a stale claim, every jax client init on this host
    # hangs forever. A hung parent here means the driver records NOTHING —
    # emit an honest null record instead.
    backend = _probe_backend()
    if backend == "hang":
        print(
            "[bench] TPU client init HANGS (wedged axon tunnel); "
            "emitting null record",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "ssd300_inference_images_per_sec_per_chip",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "tpu client init hang (wedged tunnel)",
            "p50_latency_ms_bs1": None,
            "train_images_per_sec_chip": None,
        }))
        return

    # Latency first — see module docstring. No jax import may precede this.
    latency = _measure_latency()
    # Train-step throughput second, still before this process binds the TPU.
    train = _measure_train()

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
        # Production path: int8 PTQ trunk + int8 heads, spec resolved the
        # same way quantize_ssd resolves it (fused Pallas stem on TPU).
        from object_detector_tpu.quant import engine as qengine

        spec = qengine.build_spec(cfg)
        # Calibration scales are deterministic for this seeded model; use
        # the committed fixture to skip compiling the calibration program
        # (keeps bench wall-clock bounded for the driver). The fixture is
        # validated against the spec's required key set and regenerated on
        # any mismatch (fused/unfused specs share keys by construction,
        # but never trust that silently).
        required = qengine.required_scale_keys(spec, use_l2norm=True)
        scales_path = os.path.join(_HERE, "benchmarks", "bench_act_scales.json")
        scales = None
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                scales = {k: float(v) for k, v in json.load(f).items()}
            missing = required - set(scales)
            if missing:
                print(
                    f"[bench] act-scales fixture missing keys {sorted(missing)};"
                    " recalibrating", file=sys.stderr,
                )
                scales = None
        if scales is None:
            calib = aug_ops.normalize(images[:16].astype(jnp.float32) / 255.0)
            scales = qengine.calibrate_scales(float_params, spec, [calib])
            with open(scales_path, "w") as f:
                json.dump(scales, f, indent=1)
        qp = qengine.quantize_params(float_params, spec, scales)
        params = jax.device_put(qp)

        if cfg.eval.per_level_heads:
            # Honor the config's postprocess path so a default flip
            # reaches the driver's number (r2 verdict bench-drift lesson).
            from object_detector_tpu.ops.postprocess import postprocess_levels

            @jax.jit
            def infer(p, images_u8):
                imgs = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
                lvl_cls, lvl_box = qengine.int8_forward(
                    p, spec, cfg, imgs, concat_heads=False
                )
                det = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
                return det.boxes, det.scores, det.classes, det.valid

        else:
            @jax.jit
            def infer(p, images_u8):
                imgs = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
                cls_logits, box_offsets = qengine.int8_forward(p, spec, cfg, imgs)
                det = postprocess(
                    cls_logits, box_offsets, anchors, cfg, use_pallas=True
                )
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
    sys.path.insert(0, _HERE)
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

    result.update(latency)
    result.update(train)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
