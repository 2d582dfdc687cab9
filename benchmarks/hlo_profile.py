"""Per-HLO-instruction cost map of the int8 serving pipeline.

profile_int8.py aggregates by framework op (all convs collapse into one
"conv_general_dilated" row); this report ranks individual HLO
instructions with their shapes via the xprof "hlo_stats" tool, so the
in-program cost of each conv/fusion is visible (the isolated per-conv
bench inflates small ops by dispatch overhead and misses XLA fusion).

Usage: python benchmarks/hlo_profile.py [preset] [top_n]
       python benchmarks/hlo_profile.py --train [bs] [top_n]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.profile_int8 import build_pipeline, capture


def report_hlo(trace_dir: str, top: int = 60):
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    xspaces = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xspaces:
        print("no xplane captured")
        return
    xspaces = [max(xspaces, key=os.path.getmtime)]
    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    blob = json.loads(data)
    table = blob[0] if isinstance(blob, list) else blob
    cols = [c.get("label", c.get("id", "")) for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]

    def col(*names):
        for name in names:
            for i, c in enumerate(cols):
                if name.lower() in str(c).lower():
                    return i
        return None

    i_name = col("hlo op name", "hlo name", "hlo op")
    i_expr = col("hlo op expression", "expression", "long name")
    i_self = col("total self time (us)", "self time", "self")
    i_occ = col("#occurrences", "occurrence")
    i_cat = col("hlo category", "category")
    if i_self is None or i_name is None:
        print("cols:", cols)
        return
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f"{'self us':>9s} {'%':>6s} {'n':>4s}  instruction")
    for r in rows[:top]:
        self_us = r[i_self] or 0
        pct = 100 * self_us / max(total, 1e-9)
        name = str(r[i_name])
        cat = str(r[i_cat]) if i_cat is not None else ""
        expr = str(r[i_expr])[:140] if i_expr is not None else ""
        n = r[i_occ] if i_occ is not None else ""
        print(f"{self_us:9.0f} {pct:5.1f}% {n:>4}  [{cat}] {name}")
        if expr:
            print(f"{'':22s}{expr}")
    print(f"total device self time: {total:.0f} us")


def capture_train(trace_dir: str, bs: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.train.loop import init_model_state
    from object_detector_tpu.train.step import make_train_step

    cfg = get_config("ssd300_vgg16_voc").override({"train.batch_size": bs})
    s, m = cfg.model.image_size, cfg.data.max_boxes
    model, state = init_model_state(cfg, jax.random.key(0))
    anchors = ssd_anchors(cfg.anchors, s)
    step_fn = make_train_step(cfg, model, anchors, mesh=None, augment=True)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)),
        "boxes": jnp.asarray(
            np.tile(np.array([[0.2, 0.2, 0.6, 0.6], [0.5, 0.1, 0.9, 0.4]],
                             np.float32)[None], (bs, m // 2, 1))[:, :m]
        ),
        "labels": jnp.ones((bs, m), jnp.int32),
        "valid": jnp.asarray(np.tile(np.arange(m) < 4, (bs, 1))),
    }
    key = jax.random.key(1)
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            state, metrics = step_fn(state, batch, key)
        jax.block_until_ready(metrics["loss"])
        np.asarray(jax.device_get(metrics["loss"]))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--train":
        bs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        top = int(sys.argv[3]) if len(sys.argv) > 3 else 60
        trace_dir = f"/tmp/odt_hlo_trace_train{bs}"
        capture_train(trace_dir, bs)
        report_hlo(trace_dir, top)
    else:
        preset = sys.argv[1] if len(sys.argv) > 1 else "ssd512_resnet50_coco"
        top = int(sys.argv[2]) if len(sys.argv) > 2 else 60
        trace_dir = f"/tmp/odt_hlo_trace_{preset}"
        capture(trace_dir, preset)
        report_hlo(trace_dir, top)
