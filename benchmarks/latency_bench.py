"""p50 single-image latency (BASELINE metric #3): uint8 image -> detections,
bs=1, full on-chip pipeline.

Measures BOTH serving paths — bf16 float (the production bs=1 path:
measured 1.09 ms bf16 vs 1.57 ms int8 on v5e-1, the per-conv requant
overhead is not amortized at bs=1) and int8 (quantize_ssd ->
int8_forward -> Pallas NMS, the throughput default) — and reports the
faster one as the primary p50. Calibration uses a synthetic batch (scale
choice shifts quantization rounding, not timing).

Stage architecture (r5, after the four-round p50-null postmortem):

1. AOT FAST PATH first: the bf16 program is a committed `jax.export`
   artifact (benchmarks/aot/latency_bf16.jaxexp) deserialized and run
   directly — NO big trace under the axon platform. Measured r5
   (latency_probe.py): tracing the first big program under axon blocks
   ~611 s on per-op tunnel round-trips (0% local CPU) while the same
   lower takes 0.4 s on the CPU platform; that chatter, not compile, is
   what blew this stage's 600 s cap in the r4/r5 driver sessions. Param
   values come from a CPU-subprocess init (aot_params.py, threefry is
   platform-deterministic -> bit-identical to the on-device init), and
   the compile hits the committed benchmarks/xla_cache. The p50 JSON
   line is emitted the moment the bf16 number exists.
2. The int8 path then refines in the same process via the legacy traced
   route (it pays the one-time chatter stall AFTER the metric is safe;
   a deadline kill beyond this point costs only the refinement).
3. Any AOT failure (missing artifact, env drift) falls back to the
   legacy full path — same numbers, old timing risk.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache(scoped_vmem_kib=None)  # latency path: default VMEM
import jax.numpy as jnp
import numpy as np

_JSON = "--json" in sys.argv
_REC: dict = {}
_T0 = time.monotonic()
_HERE = os.path.dirname(os.path.abspath(__file__))


def emit(d: dict) -> None:
    """Merge + print the cumulative record immediately (bench.py streams)."""
    if _JSON:
        import json

        _REC.update(d)
        print(json.dumps(_REC), flush=True)


def mark(what: str) -> None:
    """Timestamped stderr progress marker (diagnoses slow-stage sessions)."""
    print(f"[latency +{time.monotonic() - _T0:.0f}s] {what}",
          file=sys.stderr, flush=True)


def _aot_bf16():
    """AOT fast path. Returns (dt_seconds, call_fn, params) or None."""
    from benchmarks import aot

    if not aot.have("latency_bf16"):
        mark("aot: no artifact")
        return None
    npz = "/tmp/odt_lat_params.npz"
    helper = None
    if not os.path.exists(npz):
        # CPU-subprocess init runs concurrently with our own setup.
        helper = subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "aot_params.py"),
             "latency", npz],
            stdout=subprocess.DEVNULL,
        )
        mark("aot: params helper spawned")
    exported = aot.load("latency_bf16")
    call = jax.jit(exported.call)
    if helper is not None:
        rc = helper.wait(timeout=420)
        if rc != 0:
            mark(f"aot: params helper rc={rc}")
            return None
    params = jax.device_put(aot.nested_from_npz(npz))
    mark("aot: params on device")
    rng = np.random.default_rng(0)
    s = 300
    image = jnp.asarray(rng.integers(0, 255, (1, s, s, 3), dtype=np.uint8))
    from benchmarks.timing import timed

    dt = timed(call, params, image, iters=100)
    mark("aot: bf16 measured")
    return dt, call, params


def main():
    # Liveness marker (see bench.py): client is up, not wedged.
    emit({"latency_stage_backend": jax.default_backend()})
    if _JSON and jax.default_backend() != "tpu":
        # bench.py probes latency unconditionally (before it knows its own
        # backend); don't burn minutes on a CPU forward loop.
        emit({
            "p50_latency_ms_bs1": None,
            "latency_skipped": f"backend={jax.default_backend()}",
        })
        return

    from benchmarks.timing import fetch_overhead, timed

    rng = np.random.default_rng(0)
    s = 300
    image = jnp.asarray(rng.integers(0, 255, (1, s, s, 3), dtype=np.uint8))

    dt_f = None
    fast_fn = fast_p = None
    try:
        res = _aot_bf16()
    except Exception as e:  # env drift etc. — fall back to legacy
        mark(f"aot: failed ({type(e).__name__}: {e}); legacy path")
        res = None
    if res is not None:
        dt_f, fast_fn, fast_p = res
        print(f"bs=1 on-device latency bf16: {dt_f*1e3:.2f} ms (aot)")
        emit({
            "p50_latency_ms_bs1": round(dt_f * 1e3, 3),
            "p50_latency_path": "bf16",
            "p50_latency_ms_bs1_bf16": round(dt_f * 1e3, 3),
        })

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_vgg16_voc")
    assert cfg.model.image_size == s
    on_tpu = jax.default_backend() == "tpu"
    model = SSDModel(cfg)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))

    if res is not None:
        params = fast_p  # same seeded values (threefry is platform-det.)
    else:
        mark("init start")
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False
        )
        jax.block_until_ready(jax.tree.leaves(variables)[0])
        mark("init done")
        params = variables["params"]

    @jax.jit
    def infer_f(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    if res is None:
        # Legacy bf16 path (pays the axon first-trace stall).
        mark("bf16 compile+measure start")
        dt_f = timed(infer_f, params, image, iters=100)
        mark("bf16 measured")
        fast_fn, fast_p = infer_f, params
        print(f"bs=1 on-device latency bf16: {dt_f*1e3:.2f} ms")
        emit({
            "p50_latency_ms_bs1": round(dt_f * 1e3, 3),
            "p50_latency_path": "bf16",
            "p50_latency_ms_bs1_bf16": round(dt_f * 1e3, 3),
        })

    # 2) int8 path second; primary only updates if it wins. This traces
    #    big programs (one-time axon chatter stall) — strictly AFTER the
    #    primary p50 is in the record.
    from object_detector_tpu.quant import engine as qengine

    calib = aug_ops.normalize(
        jnp.asarray(rng.integers(0, 255, (8, s, s, 3), dtype=np.uint8))
        .astype(jnp.float32) / 255.0
    )
    mark("int8 quantize start")
    qp, spec = qengine.quantize_ssd(cfg, params, [calib])
    qp = jax.device_put(qp)
    mark("int8 quantized")

    @jax.jit
    def infer(q, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = qengine.int8_forward(q, spec, cfg, images)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    dt_i8 = timed(infer, qp, image, iters=100)
    mark("int8 measured")
    print(f"bs=1 on-device latency int8: {dt_i8*1e3:.2f} ms")
    if dt_f <= dt_i8:
        dt, path = dt_f, "bf16"
    else:
        dt, path, fast_fn, fast_p = dt_i8, "int8", infer, qp
    print(f"bs=1 p50 (primary, {path} path): {dt*1e3:.2f} ms")
    emit({
        "p50_latency_ms_bs1": round(dt * 1e3, 3),
        "p50_latency_path": path,
        "p50_latency_ms_bs1_int8": round(dt_i8 * 1e3, 3),
    })

    # 3) End-to-end including the tunnel round-trip (what a remote client
    #    sees) — a refinement, never load-bearing for the driver metric.
    out = fast_fn(fast_p, image)
    rt = fetch_overhead(out)
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        o = fast_fn(fast_p, image)
        _ = jax.device_get(jax.tree.leaves(o)[0][:1])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    print(
        f"end-to-end (incl. ~{rt*1e3:.0f}ms tunnel RT): "
        f"p50={np.percentile(lat, 50):.2f}ms p90={np.percentile(lat, 90):.2f}ms"
    )
    emit({"e2e_p50_ms_incl_tunnel": round(float(np.percentile(lat, 50)), 2)})


if __name__ == "__main__":
    main()
