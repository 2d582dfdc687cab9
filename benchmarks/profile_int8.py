"""XLA-level op cost map of the int8 SSD serving pipeline (the bench.py
graph): capture a jax.profiler trace on the real chip and rank HLO ops
by device self-time. Ground truth for MXU-utilization work — per-op
isolated timing is unreliable under the axon tunnel (jit-boundary
relayouts + dispatch noise), this profiles the actual fused program.

Usage: python benchmarks/profile_int8.py [preset] [top_n]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def build_pipeline(preset: str):
    from object_detector_tpu.anchors.priors import anchors_for_model
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.retinanet import build_model
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess
    from object_detector_tpu.quant import engine as qengine

    cfg = get_config(preset)
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    if cfg.model.family == "retinanet":
        bs = 32
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        qp, spec = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    @jax.jit
    def infer(q, x):
        img = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = forward(q, spec, cfg, img)
        return postprocess(cls, box, anchors, cfg, use_pallas=True)

    return infer, qp, images


def capture(trace_dir: str, preset: str):
    infer, qp, images = build_pipeline(preset)
    jax.block_until_ready(infer(qp, images))
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            out = infer(qp, images)
        jax.block_until_ready(out)
        # tunnel fence: block_until_ready doesn't fence on axon
        np.asarray(jax.device_get(jax.tree.leaves(out)[0][:1]))


def report(trace_dir: str, top: int = 40):
    try:  # xprof is the maintained successor of tensorboard_plugin_profile
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    xspaces = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xspaces:
        print("no xplane captured")
        return
    # Only the newest capture session — the dir accumulates one subdir per
    # run and mixing sessions breaks the converter.
    xspaces = [max(xspaces, key=os.path.getmtime)]
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xspaces, "framework_op_stats", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    blob = json.loads(data)
    # gviz table format: first element has cols/rows
    table = blob[0] if isinstance(blob, list) else blob
    cols = [c.get("label", c.get("id", "")) for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in str(c).lower():
                return i
        return None

    i_name, i_self = col("operation"), col("total self")
    if i_self is None:
        i_self = col("self")
    i_occ = col("occurrence")
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f"{'op':64s} {'self us':>10s} {'%':>6s} {'n':>5s}")
    for r in rows[:top]:
        pct = 100 * (r[i_self] or 0) / max(total, 1e-9)
        print(
            f"{str(r[i_name])[:64]:64s} {r[i_self] or 0:10.0f} {pct:5.1f}% "
            f"{r[i_occ] if i_occ is not None else '':>5}"
        )
    print(f"total device self time: {total:.0f} us over 10 iters")


if __name__ == "__main__":
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd300_infer_bs64"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trace_dir = f"/tmp/odt_int8_trace_{preset}"
    capture(trace_dir, preset)
    report(trace_dir, top)
