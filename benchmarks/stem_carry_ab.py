"""Same-session A/B: zero-padded-width carry-through vs launcher slice.

Both variants of the full bs=64 int8 serving program (fused Pallas stem
either returns the full Jp-wide tensor and block 2/3 carry the junk
columns, or slices to the true width right after the kernel) are traced
in ONE process and timed interleaved (ABAB) so tunnel/clock drift
cancels. ODT_STEM_CARRY is read at trace time in quant.engine.run_int8.
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
from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine


def main() -> None:
    cfg = get_config("ssd300_infer_bs64")
    bs, s = cfg.eval.batch_size, cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)),
                           train=False)
    params = variables["params"]
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_ssd(cfg, params, [calib])
    qp = jax.device_put(qp)

    def make(carry: bool):
        os.environ["ODT_STEM_CARRY"] = "1" if carry else "0"

        @jax.jit
        def infer(q, x):
            img = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
            cls, box = qengine.int8_forward(q, spec, cfg, img)
            det = postprocess(cls, box, anchors, cfg, use_pallas=True)
            return det.boxes, det.scores, det.classes, det.valid

        # Trace + compile now, while the env var is set.
        jax.block_until_ready(infer(qp, images))
        np.asarray(jax.device_get(infer(qp, images)[0][:1]))
        return infer

    f_carry = make(True)
    f_slice = make(False)

    # Parity of the two compiled programs on-chip.
    a = jax.device_get(f_carry(qp, images))
    b = jax.device_get(f_slice(qp, images))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("parity: carry == slice (bit-exact, on-chip)", flush=True)

    rounds = []
    for r in range(4):
        t_a = timed(f_carry, qp, images, iters=30)
        t_b = timed(f_slice, qp, images, iters=30)
        rounds.append((t_a, t_b))
        print(f"round {r}: carry={bs/t_a:8.1f} img/s   "
              f"slice={bs/t_b:8.1f} img/s", flush=True)
    med_a = float(np.median([a_ for a_, _ in rounds]))
    med_b = float(np.median([b_ for _, b_ in rounds]))
    print(f"median: carry={bs/med_a:.1f} slice={bs/med_b:.1f} img/s "
          f"(carry/slice = {med_b/med_a:.4f}x)", flush=True)


if __name__ == "__main__":
    main()
