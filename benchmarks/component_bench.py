"""Component-level timing: forward / decode / NMS split (perf triage)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops import boxes as box_ops
from object_detector_tpu.ops.postprocess import postprocess
from benchmarks.timing import timed


def main():
    cfg = get_config("ssd300_infer_bs64")
    bs = cfg.eval.batch_size
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    params = variables["params"]
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))

    fwd = jax.jit(
        lambda p, x: model.apply(
            {"params": p}, aug_ops.normalize(x.astype(jnp.float32) / 255.0), train=False
        )
    )
    dt = timed(fwd, params, images)
    print(f"forward only:            {dt*1e3:8.2f} ms  {bs/dt:8.1f} img/s")

    cls_logits, box_offsets = fwd(params, images)

    dec = jax.jit(lambda o: box_ops.decode(o, anchors))
    dt = timed(dec, box_offsets)
    print(f"decode only:             {dt*1e3:8.2f} ms  {bs/dt:8.1f} img/s")

    pp_pallas = jax.jit(
        lambda c, b: postprocess(c, b, anchors, cfg, use_pallas=True)
    )
    if on_tpu:
        dt = timed(pp_pallas, cls_logits, box_offsets)
        print(f"decode+NMS (pallas):     {dt*1e3:8.2f} ms  {bs/dt:8.1f} img/s")
    if "--jnp-nms" in sys.argv:
        pp_jnp = jax.jit(
            lambda c, b: postprocess(c, b, anchors, cfg, use_pallas=False)
        )
        dt = timed(pp_jnp, cls_logits, box_offsets, iters=3)
        print(f"decode+NMS (jnp):        {dt*1e3:8.2f} ms  {bs/dt:8.1f} img/s")

    full = jax.jit(
        lambda p, x: postprocess(
            *model.apply(
                {"params": p}, aug_ops.normalize(x.astype(jnp.float32) / 255.0),
                train=False,
            ),
            anchors, cfg, use_pallas=on_tpu,
        )
    )
    dt = timed(full, params, images)
    print(f"full pipeline:           {dt*1e3:8.2f} ms  {bs/dt:8.1f} img/s")


if __name__ == "__main__":
    main()
