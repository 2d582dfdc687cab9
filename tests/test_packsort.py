"""ops/packsort.py: single-key packed top-k vs lax.top_k oracles, and the
packed NMS sort path end-to-end (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.kernels.nms_pallas import pallas_per_class_nms
from object_detector_tpu.ops.packsort import sortable_int, top_k_packed_idx


def test_sortable_int_is_monotone(rng):
    x = np.concatenate(
        [
            rng.normal(0, 10, 500).astype(np.float32),
            np.float32([0.0, -0.0, 1e-38, -1e-38, 3.4e38, -3.4e38]),
        ]
    )
    keys = np.asarray(sortable_int(jnp.asarray(x)))
    order_f = np.argsort(x, kind="stable")
    order_i = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(x[order_f], x[order_i])


def test_top_k_packed_exact_on_separated_values(rng):
    # Values spaced >= 1 at magnitude <= 512: with idx_bits=9 the cleared
    # low bits are worth at most 512 * 2**-14 << 1, so no two values share
    # a tie bucket and selection must match lax.top_k exactly.
    n, k = 512, 37
    vals = rng.permutation(n).astype(np.float32) - 200.0  # mixed sign
    x = jnp.asarray(np.stack([vals, vals[::-1].copy()]))
    idx = top_k_packed_idx(x, k)
    _, ref_idx = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_top_k_packed_tie_break_matches_top_k():
    # Exact duplicates: lax.top_k prefers the lower index; so must the
    # packed key (inverted index in the low bits).
    x = jnp.asarray([[1.0, 5.0, 5.0, 5.0, 0.5, 5.0]])
    idx = top_k_packed_idx(x, 4)
    _, ref_idx = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_top_k_packed_recall_on_random_uniform(rng):
    # Uniform [0,1) scores DO collide in tie buckets; selection may swap
    # near-equal entries but the selected mass must match top-k's to the
    # quantization tolerance.
    n, k = 8732, 512
    x = jnp.asarray(rng.uniform(0, 1, (4, n)).astype(np.float32))
    idx = np.asarray(top_k_packed_idx(x, k))
    ref_v, _ = jax.lax.top_k(x, k)
    got_v = np.take_along_axis(np.asarray(x), idx, axis=1)
    # Descending up to tie-bucket swaps; sorted values near-identical.
    np.testing.assert_allclose(
        np.sort(got_v, axis=1), np.sort(np.asarray(ref_v), axis=1), rtol=2**-9
    )
    np.testing.assert_allclose(got_v[:, 0], np.asarray(ref_v)[:, 0], rtol=2**-9)


def test_pallas_nms_packed_sort_matches_default(rng):
    # Scores drawn on a coarse grid -> no tie-bucket ambiguity: the packed
    # path must produce the identical detection set.
    A, C = 256, 4
    boxes = rng.uniform(0, 0.9, (A, 4)).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, :2] + rng.uniform(0.05, 0.3, (A, 2)), 0, 1)
    scores = (
        rng.integers(0, 1000, (A, C)).astype(np.float32) / 1000.0
        * (rng.uniform(0, 1, (A, C)) > 0.6)
    ).astype(np.float32)
    kw = dict(
        score_threshold=0.05, iou_threshold=0.5, pre_nms_top_k=64,
        max_detections=64, interpret=True,
    )
    ref = pallas_per_class_nms(jnp.asarray(boxes), jnp.asarray(scores), **kw)
    got = pallas_per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), packed_sort=True, **kw
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
