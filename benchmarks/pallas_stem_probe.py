"""Mosaic primitive probes for the fused-stem kernel design.

Answers, ON THE REAL CHIP, the questions the conv1_2+pool kernel design
hinges on:
  P1  dense VMEM copy bandwidth (baseline)
  P2  stride-2 sublane slice + max (the pool/row-pair gather pattern)
  P3  int8 MXU dot rate at (M,128)@(128,128)->s32 (the packed formulation)
  P4  same dot but lhs is a stride-2 sublane slice of a 2x buffer
  P5  int8 dot at (M,64)@(64,64) (the naive per-tap formulation)

Each probe runs as one pallas_call with a grid of independent programs so
kernel time dominates dispatch. Prints ms per invocation + derived rates.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import timed

GRID = 64
M = 4832  # rows per program (one SSD-300 band: 16 x 302)
REP = 8  # inner repeats per program


def run(name, kernel, in_shapes, out_shape, flops=0, bytes_moved=0):
    rng = np.random.default_rng(0)
    args = [
        jnp.asarray(rng.integers(-100, 100, (GRID,) + s, dtype=np.int8))
        for s in in_shapes
    ]
    fn = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1,) + s, lambda g: (g,) + (0,) * len(s),
                             memory_space=pltpu.VMEM)
                for s in in_shapes
            ],
            out_specs=pl.BlockSpec((1,) + out_shape,
                                   lambda g: (g,) + (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID,) + out_shape, jnp.int8
                                           if len(out_shape) < 3 else jnp.int8),
            interpret=jax.default_backend() != "tpu",
        )(*a)
    )
    dt = timed(fn, *args, iters=20)
    extra = ""
    if flops:
        extra += f"  {flops*GRID*REP/dt/1e12:7.1f} TOP/s"
    if bytes_moved:
        extra += f"  {bytes_moved*GRID*REP/dt/1e9:7.1f} GB/s"
    print(f"{name:44s} {dt*1e3:8.3f} ms{extra}")


def main():
    # P1: dense copy
    def p1(x_ref, o_ref):
        for _ in range(REP):
            o_ref[0] = x_ref[0]

    run("P1 dense copy (M,128)", p1, [(M, 128)], (M, 128),
        bytes_moved=M * 128 * 2)

    # P2: stride-2 sublane max (pool row-pair pattern)
    def p2(x_ref, o_ref):
        for _ in range(REP):
            o_ref[0] = jnp.maximum(x_ref[0, 0::2], x_ref[0, 1::2])

    run("P2 stride-2 sublane max (2M->M, 128)", p2, [(2 * M, 128)], (M, 128),
        bytes_moved=M * 128 * 3)

    # P3: int8 dot (M,128)@(128,128)
    def p3(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, 128), jnp.int32)
        for _ in range(REP):
            acc += jax.lax.dot_general(
                x_ref[0], w_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[0] = (acc & 127).astype(jnp.int8)

    run("P3 int8 dot (M,128)@(128,128)", p3, [(M, 128), (128, 128)],
        (M, 128), flops=2 * M * 128 * 128)

    # P4: same dot, lhs = stride-2 sublane slice of a 2x buffer
    def p4(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, 128), jnp.int32)
        for _ in range(REP):
            acc += jax.lax.dot_general(
                x_ref[0, 0::2], w_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[0] = (acc & 127).astype(jnp.int8)

    run("P4 int8 dot strided-lhs (M,128)@(128,128)", p4,
        [(2 * M, 128), (128, 128)], (M, 128), flops=2 * M * 128 * 128)

    # P5: int8 dot (M,64)@(64,64) — naive per-tap shape
    def p5(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, 64), jnp.int32)
        for _ in range(REP):
            acc += jax.lax.dot_general(
                x_ref[0], w_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[0] = (acc & 127).astype(jnp.int8)

    run("P5 int8 dot (M,64)@(64,64)", p5, [(M, 64), (64, 64)], (M, 64),
        flops=2 * M * 64 * 64)

    # P6: sublane-offset slice dot — (M,64) slice at odd offset of a
    # bigger buffer (the per-tap shift pattern), K=64 N=64
    def p6(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, 64), jnp.int32)
        for r in range(REP):
            off = (r % 3) * 302 + (r % 2)
            acc += jax.lax.dot_general(
                x_ref[0, off : off + M], w_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[0] = (acc & 127).astype(jnp.int8)

    run("P6 int8 dot shifted-lhs (M,64)@(64,64)", p6,
        [(M + 1024, 64), (64, 64)], (M, 64), flops=2 * M * 64 * 64)


if __name__ == "__main__":
    main()
