"""Consolidated r5 pricing session (one process — the axon per-op trace
chatter is a once-per-process cost, so every A/B after the first program
traces in seconds; see benchmarks/aot.py).

1. remat_block1 ON/OFF at bs=32 and bs=64 (VERDICT r4 #5: the knob
   landed in r4 with a parity test but no chip price).
2. RetinaNet int8 bs=32 vs bs=64 interleaved ABAB (ADVICE r4 #3: the r4
   flip compared across sessions).

    timeout 3000 python benchmarks/r5_pricing_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed


def train_arm(bs: int, remat: bool):
    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.train.loop import init_model_state
    from object_detector_tpu.train.step import make_train_step

    cfg = get_config("ssd300_vgg16_voc").override({
        "train.batch_size": bs, "model.remat_block1": remat,
    })
    s, m = cfg.model.image_size, cfg.data.max_boxes
    model, state = init_model_state(cfg, jax.random.key(0))
    step_fn = make_train_step(
        cfg, model, ssd_anchors(cfg.anchors, s), mesh=None, augment=True
    )
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

    class Stepper:
        def __init__(self, st):
            self.state = st

        def __call__(self, b, k):
            self.state, metrics = step_fn(self.state, b, k)
            return metrics["loss"]

    st = Stepper(state)
    return lambda: bs / timed(st, batch, key, iters=10)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    # --- 1. remat_block1 pricing (ABAB x2 per batch size) ---
    for bs in (32, 64):
        arms = {}
        for name, remat in (("off", False), ("on", True)):
            arms[name] = train_arm(bs, remat)
        for rnd in range(2):
            off = arms["off"]()
            on = arms["on"]()
            print(f"[remat bs={bs} r{rnd}] off {off:7.1f} img/s | "
                  f"on {on:7.1f} img/s | ratio {on/off:.4f}", flush=True)

    # --- 2. RetinaNet int8 bs=32 vs bs=64 interleaved ---
    import benchmarks.headline as h

    f32 = lambda: h._bench_int8("retinanet_fpn_coco", 32, iters=20)
    f64 = lambda: h._bench_int8("retinanet_fpn_coco", 64, iters=20)
    for rnd in range(2):
        a = f32()
        b = f64()
        print(f"[retina r{rnd}] bs32 {a:7.1f} img/s | bs64 {b:7.1f} img/s | "
              f"ratio {b/a:.4f}", flush=True)


if __name__ == "__main__":
    main()
