"""Packed single-key top-k for the NMS candidate/merge sorts.

The r3 SSD-300 profile prices the postprocess sorts at ~0.9 ms of the
~19.5 ms program: the candidate prefilter (`lax.top_k` over (B, A) max
logits, 0.39 ms) and the cross-class merge (`lax.top_k` over (B, C*100)
survivor scores, 0.53 ms). Both lower on TPU to a full VARIADIC sort of
(values, iota) — two arrays moved and compared through every sorting
network stage.

This module packs the candidate index into the low bits of a single
sortable-int score key, so each becomes ONE int32 single-operand sort:

    key = (sortable_int(score) & ~idx_mask) | (n-1 - index)

`sortable_int` is the IEEE trick (flip all bits of negatives, keep
positives) — a monotone bijection f32 -> i32, so integer order == float
order, including negative logits. Clearing the low `idx_bits` bits is a
monotone (floor) quantization; the inverted index in those bits makes
ties break toward the LOWER index, matching `lax.top_k`.

Approximation contract: scores whose sortable-int keys differ only in the
low `idx_bits` bits (relative spacing under ~2**(idx_bits-23)) collapse
into one tie bucket, so selection among near-equal scores can differ from
exact `top_k`. For NMS candidate selection (threshold 0.01, survivors
re-scored exactly by gathering through the returned indices) this is far
inside the noise; the exact path remains the default
(`EvalConfig.nms_packed_sort=False`) until the on-chip A/B
(benchmarks/packsort_ab.py) justifies flipping it.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

_INT_MIN = jnp.int32(-(2**31))


def sortable_int(x: Array) -> Array:
    """Monotone f32 -> i32 bijection: i32 order == f32 total order
    (negatives inverted bitwise, positives offset past them)."""
    b = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(b < 0, jnp.invert(b) ^ _INT_MIN, b)


def top_k_packed_idx(x: Array, k: int, idx_bits: int | None = None) -> Array:
    """Indices of the top-k entries of `x` along the last axis, descending,
    via one int32 single-key sort. Ties (within the idx_bits quantization)
    break toward the lower index, like `lax.top_k`. Returns (..., k) i32.

    Callers gather exact values through the indices — the packed key's
    quantized score is never surfaced.
    """
    n = x.shape[-1]
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    if idx_bits is None:
        idx_bits = max(1, (n - 1).bit_length())
    if n > (1 << idx_bits):
        raise ValueError(f"idx_bits={idx_bits} cannot address n={n}")
    mask = jnp.int32((1 << idx_bits) - 1)
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    key = (sortable_int(x) & ~mask) | (jnp.int32(n - 1) - iota)
    # Descending sort == ascending sort of the bitwise complement.
    top = jnp.invert(jnp.sort(jnp.invert(key), axis=-1)[..., :k])
    return jnp.int32(n - 1) - (top & mask)
