"""Tiny-first TPU probe for the zero-padded-width carry-through.

Runs the fused-stem int8 trunk (full_width carry, junk-column re-zeroing)
at bs=8/300px on the real chip and asserts bit-exact parity with the
unfused spec, then prints both wall times. Small shapes first — the axon
tunnel wedges for hours if a client with queued device work dies.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.quant import engine as qengine


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = get_config("ssd300_infer_bs64")
    s = cfg.model.image_size
    bs = 8
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)),
                           train=False)
    params = variables["params"]
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)
    imgs = aug_ops.normalize(jnp.asarray(u8).astype(jnp.float32) / 255.0)

    spec_on = qengine.build_ssd_spec(cfg, fused_stem=True)
    spec_off = qengine.build_ssd_spec(cfg, fused_stem=False)
    calib = [imgs]
    qp_on, _ = qengine.quantize_ssd(cfg, params, calib, spec=spec_on)
    qp_off, _ = qengine.quantize_ssd(cfg, params, calib, spec=spec_off)

    f_on = jax.jit(
        lambda p, im: qengine.int8_forward(p, spec_on, cfg, im))
    f_off = jax.jit(
        lambda p, im: qengine.int8_forward(p, spec_off, cfg, im))
    cls_on, box_on = jax.device_get(f_on(qp_on, imgs))
    cls_off, box_off = jax.device_get(f_off(qp_off, imgs))
    np.testing.assert_array_equal(cls_on, cls_off)
    np.testing.assert_array_equal(box_on, box_off)
    print("parity: bit-exact (bs=8, 300px, on-chip)", flush=True)

    t_on = timed(f_on, qp_on, imgs, iters=20)
    t_off = timed(f_off, qp_off, imgs, iters=20)
    print(f"bs=8 trunk+heads ms: fused-carry={t_on*1e3:.3f} "
          f"unfused={t_off*1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
