"""Probe: VGG block-1 is HBM-bound at ~310 GB/s in the train step
(chip_logs/train_profile.log: conv1_2 fwd 3.4 + bwd 7.5 + conv1_1
2.4 ms) because C=64 bf16 half-fills the 128-lane tiles.

Candidate: pack IMAGE PAIRS into channels — x (B,H,W,3) becomes
(B/2,H,W,6), block-1 weights become block-diagonal (every tensor C=128,
full lanes; 2x MACs for conv1_2 but block-1 is bandwidth-bound, and a
first probe showed blockdiag bwd beating plain bwd even so; grouped
conv (feature_group_count=2) lowered WORSE than plain and is dropped).

This times the full block-1 subgraph fwd + grad-wrt-weights (what
training runs: dgrad stops at conv1_2's input, wgrad for both convs),
pool included, pair-unpack relayout after pool included on the packed
side. Decision: integrate as a train-path option and full-step A/B if
packed wins >15% of block time.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from benchmarks.timing import timed

B, H, W = 32, 300, 300


def conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn
    )


def block_plain(ws, x):
    y = nn.relu(conv(x, ws["w1"]))
    y = nn.relu(conv(y, ws["w2"]))
    return nn.max_pool(y, (2, 2), strides=(2, 2))


def block_packed(ws, xp):
    y = nn.relu(conv(xp, ws["w1"]))
    y = nn.relu(conv(y, ws["w2"]))
    y = nn.max_pool(y, (2, 2), strides=(2, 2))
    # unpack pairs: (B/2, h, w, 128) -> (B, h, w, 64), counted in the cost
    return jnp.concatenate([y[..., :64], y[..., 64:]], axis=0)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
    xp = jnp.concatenate([x[0::2], x[1::2]], axis=-1)  # (B/2,H,W,6)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    w1p = jnp.zeros((3, 3, 6, 128), jnp.bfloat16)
    w1p = w1p.at[:, :, :3, :64].set(w1).at[:, :, 3:, 64:].set(w1)
    w2p = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    w2p = w2p.at[:, :, :64, :64].set(w2).at[:, :, 64:, 64:].set(w2)

    def fb(block):
        def run(ws, xx, cot):
            def loss(ws):
                return jnp.sum(block(ws, xx).astype(jnp.float32) * cot)

            return jax.value_and_grad(loss)(ws)

        return jax.jit(run)

    cot = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 64)), jnp.float32)
    cases = {
        "plain": (fb(block_plain), {"w1": w1, "w2": w2}, x),
        "packed": (fb(block_packed), {"w1": w1p, "w2": w2p}, xp),
    }
    for name, (f, ws, xx) in cases.items():
        dt = timed(f, ws, xx, cot, iters=20)
        print(f"{name:10s} {dt*1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
