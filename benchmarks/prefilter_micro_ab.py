"""Isolate the class-agnostic prefilter top-M on RetinaNet/COCO shapes.

r3 HLO profile (chip_logs/hlo_retinanet.log): the approx_max_k
PartialReduce custom-call costs 2.95 ms at (32, 49104) f32, k=512 —
pathological for a 6.3 MB operand (sub-0.1 ms of HBM traffic). This
harness times prefilter formulations in isolation to find the floor:

  exact        lax.top_k(scores, 512)
  approx       lax.approx_max_k(scores, 512, recall_target=0.95)  [current]
  approx_rt85  recall_target=0.85
  approx_pad   same but n padded 49104 -> 49152 (384*128 lane-aligned)
  two_stage    approx_max_k to 4*M with low recall, exact top_k of that
  blockmax     reshape (B, A) -> (B, M, A//M), max+argmax per block
               (selection semantics differ: one winner per contiguous
                block — included to price the floor, not as a drop-in)

Each arm returns indices; a tiny gather fences the result. Run on-chip:
    timeout 900 python benchmarks/prefilter_micro_ab.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed

B, A, M = 32, 49104, 512
A_PAD = 49152


def main() -> None:
    rng = np.random.default_rng(0)
    # Realistic magnitude profile: sigmoid-prior-biased logits.
    scores = jnp.asarray(
        rng.normal(-4.6, 1.0, (B, A)).astype(np.float32)
    )

    @jax.jit
    def exact(s):
        _, idx = jax.lax.top_k(s, M)
        return idx

    @functools.partial(jax.jit, static_argnames=("rt",))
    def approx(s, rt=0.95):
        _, idx = jax.lax.approx_max_k(s, M, recall_target=rt)
        return idx

    @jax.jit
    def approx_pad(s):
        sp = jnp.pad(s, ((0, 0), (0, A_PAD - A)),
                     constant_values=-jnp.inf)
        _, idx = jax.lax.approx_max_k(sp, M, recall_target=0.95)
        return idx

    @jax.jit
    def two_stage(s):
        v, idx = jax.lax.approx_max_k(s, 4 * M, recall_target=0.8)
        _, sub = jax.lax.top_k(v, M)
        return jnp.take_along_axis(idx, sub, axis=1)

    @jax.jit
    def approx_bf16(s):
        _, idx = jax.lax.approx_max_k(
            s.astype(jnp.bfloat16), M, recall_target=0.95
        )
        return idx

    @jax.jit
    def approx_bf16_to_f32(s):
        # The production graph's shape: bf16 class-max, f32 selection.
        _, idx = jax.lax.approx_max_k(
            s.astype(jnp.bfloat16).astype(jnp.float32), M,
            recall_target=0.95,
        )
        return idx

    # The production composition: class-max reduce over bf16 (B, A, C)
    # logits fused with the selection — isolates whether the 2.95 ms
    # custom-call in hlo_retinanet.log is the PartialReduce itself or
    # the fused reduce feeding it.
    C = 80
    logits = jnp.asarray(
        np.random.default_rng(1).normal(-4.6, 1.0, (B, A, C))
        .astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def fused_max_approx(lg):
        agnostic = jnp.max(lg, axis=-1)
        _, idx = jax.lax.approx_max_k(agnostic, M, recall_target=0.95)
        return idx

    @jax.jit
    def fused_max_f32_approx(lg):
        agnostic = jnp.max(lg, axis=-1).astype(jnp.float32)
        _, idx = jax.lax.approx_max_k(agnostic, M, recall_target=0.95)
        return idx

    arms = {
        "exact_top_k": lambda s: exact(s),
        "approx_rt95": lambda s: approx(s, rt=0.95),
        "approx_rt85": lambda s: approx(s, rt=0.85),
        "approx_pad49152": lambda s: approx_pad(s),
        "two_stage_4M": lambda s: two_stage(s),
        "approx_bf16": lambda s: approx_bf16(s),
        "approx_bf16_to_f32": lambda s: approx_bf16_to_f32(s),
    }
    ref = np.asarray(jax.device_get(exact(scores)))
    ref_sets = [set(r.tolist()) for r in ref]
    for name, fn in arms.items():
        dt = timed(fn, scores, iters=100)
        got = np.asarray(jax.device_get(fn(scores)))
        recall = float(np.mean([
            len(set(g.tolist()) & rs) / M for g, rs in zip(got, ref_sets)
        ]))
        print(f"{name:18s} {dt*1e3:7.3f} ms   recall@{M}={recall:.4f}",
              flush=True)
    for name, fn in (("fused_max_approx", fused_max_approx),
                     ("fused_max_f32_approx", fused_max_f32_approx)):
        dt = timed(fn, logits, iters=100)
        print(f"{name:18s} {dt*1e3:7.3f} ms   (incl. class-max over "
              f"(32,49104,80) bf16)", flush=True)


if __name__ == "__main__":
    main()
