"""A/B: VGG 2x2 max-pool backward — XLA select_and_scatter vs the Pallas
first-max kernel (ModelConfig.pool_grad_kernel), on the full SSD-300
bs=32 train step AND isolated per-pool signatures.

Gradient parity is BITWISE (test-pinned on CPU interpret; re-asserted
here on the real chip before timing). Interleaved ABAB so tunnel drift
cancels.

Usage: python benchmarks/pool_bwd_ab.py [bs] [rounds]
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
from object_detector_tpu.train.loop import init_model_state
from object_detector_tpu.train.step import make_train_step


def isolated(bs: int) -> None:
    """Per-pool-signature backward cost: select_and_scatter vs kernel."""
    from flax import linen as nn

    from object_detector_tpu.ops.pooling import max_pool_2x2_fastgrad

    sigs = [(300, 64), (150, 128), (76, 256), (38, 512)]
    rng = np.random.default_rng(0)
    for h, c in sigs:
        x = jnp.asarray(
            rng.normal(size=(bs, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        cot = jnp.asarray(
            rng.normal(size=(bs, h // 2, h // 2, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def loss_ref(v):
            return jnp.sum(
                nn.max_pool(v, (2, 2), strides=(2, 2)).astype(jnp.float32)
                * cot.astype(jnp.float32)
            )

        def loss_new(v):
            return jnp.sum(
                max_pool_2x2_fastgrad(v).astype(jnp.float32)
                * cot.astype(jnp.float32)
            )

        g_ref = jax.jit(jax.grad(loss_ref))
        g_new = jax.jit(jax.grad(loss_new))
        a = np.asarray(g_ref(x).astype(jnp.float32))
        b = np.asarray(g_new(x).astype(jnp.float32))
        np.testing.assert_array_equal(a, b)
        dt_ref = timed(g_ref, x, iters=20)
        dt_new = timed(g_new, x, iters=20)
        print(
            f"  pool {h}x{h}x{c}: s&s={dt_ref*1e3:7.3f} ms  "
            f"kernel={dt_new*1e3:7.3f} ms  ({dt_ref/dt_new:.2f}x)",
            flush=True,
        )


def full_step(bs: int, rounds: int) -> None:
    med = {}
    steps = {}
    for arm, flag in (("s&s", False), ("kernel", True)):
        cfg = get_config("ssd300_vgg16_voc").override(
            {"train.batch_size": bs, "model.pool_grad_kernel": flag}
        )
        s = cfg.model.image_size
        m = cfg.data.max_boxes
        anchors = jnp.asarray(ssd_anchors(cfg.anchors, s))
        model, state = init_model_state(cfg, jax.random.key(0))
        step = make_train_step(cfg, model, anchors, mesh=None, augment=True)
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)
            ),
            "boxes": jnp.asarray(
                np.tile([[0.2, 0.2, 0.7, 0.7]], (bs, m, 1)).astype(np.float32)
            ),
            "labels": jnp.asarray(np.ones((bs, m), np.int32)),
            "valid": jnp.asarray(np.tile(np.arange(m) < 3, (bs, 1))),
        }
        steps[arm] = (step, state, batch)

    # The step donates its input state — re-feed the returned state each
    # iteration (steady-state training behavior, same as train_bench.py).
    class Stepper:
        def __init__(self, step, st):
            self.step, self.state = step, st

        def __call__(self, b, k):
            self.state, metrics = self.step(self.state, b, k)
            return metrics["loss"]

    steppers = {
        arm: (Stepper(step, state), batch)
        for arm, (step, state, batch) in steps.items()
    }
    for r in range(rounds):
        line = f"  round {r}:"
        for arm in ("s&s", "kernel"):
            stepper, batch = steppers[arm]
            dt = timed(stepper, batch, jax.random.key(1), iters=12)
            med.setdefault(arm, []).append(bs / dt)
            line += f"  {arm}={bs/dt:7.1f} img/s"
        print(line, flush=True)
    ma = float(np.median(med["s&s"]))
    mb = float(np.median(med["kernel"]))
    print(
        f"  median: s&s={ma:.1f} kernel={mb:.1f} img/s "
        f"(kernel speedup = {mb/ma:.4f}x)"
    )


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"isolated pool backward (bs={bs}):", flush=True)
    isolated(bs)
    print(f"full train step (bs={bs}):", flush=True)
    full_step(bs, rounds)


if __name__ == "__main__":
    main()
