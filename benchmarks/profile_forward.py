"""Capture a jax.profiler trace of the SSD-300 forward and print the
top self-time ops (parsed from the xplane proto via the tensorboard
profile plugin)."""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def capture(trace_dir: str):
    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_infer_bs64")
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def full(p, x):
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        return postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    params = variables["params"]
    jax.block_until_ready(full(params, images))

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = full(params, images)
        jax.block_until_ready(out)


def report(trace_dir: str, top: int = 30):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xspaces = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not xspaces:
        print("no xplane captured")
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    print(data[:4000])


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/odt_trace"
    capture(trace_dir)
    report(trace_dir)
