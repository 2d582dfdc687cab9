"""Micro-bench the NMS stages: top-k pre-filter / pallas kernel / merge."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.kernels import nms_pallas as K
from benchmarks.timing import timed as _timed


def timed(fn, *args, iters=50):
    return _timed(fn, *args, iters=iters) * 1e3


def main():
    B, A, C = 64, 8732, 20
    k_eff = 400
    k = K._round_up(k_eff, K._LANE)
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 1, (B, A, 4)).astype(np.float32)
    boxes[..., 2:] = np.clip(boxes[..., :2] + 0.1, 0, 1)
    scores = (rng.uniform(0, 1, (B, A, C)) ** 8).astype(np.float32)
    boxes, scores = jnp.asarray(boxes), jnp.asarray(scores)

    @jax.jit
    def prefilter(b, s):
        st = jnp.transpose(s, (0, 2, 1))
        ts, ti = jax.lax.approx_max_k(st, k_eff, recall_target=0.95)
        cb = jnp.take_along_axis(b[:, None, :, :], ti[..., None], axis=2)
        return ts, cb

    dt = timed(prefilter, boxes, scores)
    print(f"prefilter (approx_max_k + gather): {dt:7.2f} ms")

    @jax.jit
    def exact_prefilter(b, s):
        st = jnp.transpose(s, (0, 2, 1))
        ts, ti = jax.lax.top_k(st, k_eff)
        cb = jnp.take_along_axis(b[:, None, :, :], ti[..., None], axis=2)
        return ts, cb

    dt = timed(exact_prefilter, boxes, scores)
    print(f"prefilter (exact top_k + gather):  {dt:7.2f} ms")

    ts, cb = prefilter(boxes, scores)
    pad = k - k_eff
    ts_p = jnp.pad(ts, ((0, 0), (0, 0), (0, pad)))
    cb_p = jnp.pad(cb, ((0, 0), (0, 0), (0, pad), (0, 0)))
    rows = B * C
    coords = jnp.transpose(cb_p.reshape(rows, k, 4), (2, 0, 1))
    flat_scores = ts_p.reshape(rows, k)

    @jax.jit
    def kernel_only(c, s):
        return K._nms_rows(
            c, s, max_out=100, iou_threshold=0.45, score_threshold=0.01,
            interpret=False,
        )

    dt = timed(kernel_only, coords, flat_scores)
    print(f"pallas suppression kernel:         {dt:7.2f} ms")

    kept_s, _ = kernel_only(coords, flat_scores)
    n_out = kept_s.shape[1]

    @jax.jit
    def merge(ks, cbp):
        fs = ks.reshape(B, C * n_out)
        ms, mi = jax.lax.top_k(fs, 200)
        ob = jnp.take_along_axis(
            cbp.reshape(B, C * k, 4), (mi % k)[..., None], axis=1
        )
        return ms, ob

    dt = timed(merge, kept_s, cb_p)
    print(f"cross-class merge top_k:           {dt:7.2f} ms")


if __name__ == "__main__":
    main()
