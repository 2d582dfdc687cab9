"""Structured 2x2/stride-2 max pooling — MEASURED DEAD END on v5e, kept
as the documented negative result (not used by the models).

Motivation: XLA differentiates `reduce_window_max` via
`select_and_scatter` (3.6 ms per SSD-300 bs=32 train step, the largest
non-conv backward op — chip_logs/train_profile.log). Two structured
replacements were built and benched same-session on the real chip:

1. custom-VJP first-max mask over a (B, H/2, 2, W/2, 2, C) view: the
   size-2 minor-adjacent dims tile-pad ~4-8x on TPU, so the
   "elementwise" backward materialized at a fraction of HBM bandwidth —
   9.1 ms (select_n 4.5 + eq 2.6 + broadcast 1.2 + slice 0.8,
   chip_logs/train_profile3.log). Step: 60.1 -> 62.8 ms.
2. this file's pairwise-max expression (W-pairs via a (B, H, W/2, 2C)
   lane-half view, H-pairs via major-axis stride), autodiff backward:
   the W-pair reshape refactors the (sublane, lane) tiling, so XLA
   inserts full relayouts in BOTH directions. Step: 88.9 ms
   (chip_logs/train_after_fixes.log history).

Lesson recorded for future kernels: row-major-contiguous reshapes are
NOT free on TPU when they change the last-two-dim factorization, and
any view that leaves a size-2 dim adjacent to the minor dims tile-pads
4-8x. select_and_scatter at ~414 GB/s is the bar to beat; beating it
needs a Pallas kernel that emits the interleaved rows directly, not an
XLA-level rewrite.

Forward remains bit-identical to `nn.max_pool((2,2), strides=(2,2))`;
gradient ties follow `jnp.maximum` (0.5/0.5 split; per-window cotangent
sum preserved — tests/test_pooling.py pins both properties).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def max_pool_2x2(x: Array) -> Array:
    """2x2/s2 VALID max pool, NHWC, H and W even (pad upstream for
    ceil-mode). Exact forward; autodiff-friendly backward."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"max_pool_2x2 needs even H, W; got {(h, w)}")
    t = x.reshape(b, h, w // 2, 2 * c)  # free view: W-pairs on lanes
    t = jnp.maximum(t[..., :c], t[..., c:])
    return jnp.maximum(t[:, ::2], t[:, 1::2])  # H-pairs: major-axis stride
