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


# ---------------------------------------------------------------------------
# Pallas first-max pool backward (r3): the XLA-level rewrites above lost to
# select_and_scatter's relayout-free streaming; the bar named in the STATUS
# note is a kernel that handles the 2x2 interleave in VMEM registers. This
# is that kernel: forward stays XLA reduce_window (already fast); only the
# VJP is custom. Tie semantics match select_and_scatter exactly
# (first window position in (0,0),(0,1),(1,0),(1,1) scan order wins), so
# gradients are bitwise-identical to jax.grad(nn.max_pool) everywhere.
#
# STATUS (r3, v5e-1, chip_logs/pool_bwd_ab.log): MEASURED LOSS isolated —
# 0.44x at 300x300x64, 0.27x at 150x150x128, 0.12-0.13x at the deeper
# pools. The kernel re-reads x AND y AND g (2.25x the stream of
# select_and_scatter's fused fwd-replay) and spends VPU cycles on four
# equality planes + first-match exclusion + where/concat rebuild, while
# XLA's select_and_scatter is already a single fused streaming pass at
# these shapes. Line closed at the kernel level too: the 3.6 ms/step
# select_and_scatter backward stands as the measured best. Kept
# off-default (ModelConfig.pool_grad_kernel) with bitwise-parity tests.
# ---------------------------------------------------------------------------

import functools as _functools

import jax as _jax
from jax import lax as _lax


def _pool_bwd_kernel(x_ref, y_ref, g_ref, dx_ref):
    """One (2*HB, W2, 2C) x-block -> dx; y/g blocks are (HB, W2, C).

    The launcher pre-reshapes x to (B, H, W/2, 2C) — a free HBM bitcast —
    so each 2C lane register holds [even-col chans | odd-col chans] and
    the kernel never lane-widens (Mosaic rejects 64->128 lane reshapes;
    lane-half slices and lane concats compile at every VGG signature —
    probed on v5e, /tmp/pool_probe3). The H de-interleave is a sublane
    fold; all compares upcast to f32 (no bf16 vector cmp on v5e)."""
    xb = x_ref[0]  # (2HB, W2, 2C)
    yb = y_ref[0].astype(jnp.float32)  # (HB, W2, C)
    gb = g_ref[0]  # (HB, W2, C)
    hb2, w2, c2 = xb.shape
    hb, c = hb2 // 2, c2 // 2
    xr = xb.reshape(hb, 2 * w2, c2)  # rows (2i, 2i+1) -> sublane halves
    tp = xr[:, :w2, :]  # window row 0, cols paired on lanes
    bp = xr[:, w2:, :]  # window row 1
    t0 = tp[..., :c].astype(jnp.float32)
    t1 = tp[..., c:].astype(jnp.float32)
    b0 = bp[..., :c].astype(jnp.float32)
    b1 = bp[..., c:].astype(jnp.float32)
    e0 = t0 == yb
    e1 = (t1 == yb) & ~e0
    e01 = e0 | e1
    e2 = (b0 == yb) & ~e01
    e3 = (b1 == yb) & ~(e01 | e2)
    zero = jnp.zeros_like(gb)
    d0 = jnp.where(e0, gb, zero)
    d1 = jnp.where(e1, gb, zero)
    d2 = jnp.where(e2, gb, zero)
    d3 = jnp.where(e3, gb, zero)
    trow = jnp.concatenate([d0, d1], axis=-1)  # (HB, W2, 2C)
    brow = jnp.concatenate([d2, d3], axis=-1)
    dx_ref[0] = jnp.concatenate([trow, brow], axis=1).reshape(hb2, w2, c2)


def _h_block(h2: int) -> int:
    """Rows-of-output per grid step: whole extent when small, else the
    largest divisor <= 12 (blocks stay well under 2 MB for every VGG pool
    signature; H2 in {150, 75, 38, 19} at input 300)."""
    if h2 <= 20:
        return h2
    for d in range(12, 0, -1):
        if h2 % d == 0:
            return d
    return 1


def _max_pool_bwd_pallas(x: Array, y: Array, g: Array,
                         interpret: bool) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    hb = _h_block(h2)
    grid = (b, h2 // hb)
    vm = pltpu.VMEM
    xp = x.reshape(b, h, w2, 2 * c)  # free bitcast: W-pairs onto lanes
    dxp = pl.pallas_call(
        _pool_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * hb, w2, 2 * c), lambda i, j: (i, j, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, hb, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, hb, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, 2 * hb, w2, 2 * c),
                               lambda i, j: (i, j, 0, 0), memory_space=vm),
        out_shape=_jax.ShapeDtypeStruct((b, h, w2, 2 * c), x.dtype),
        interpret=interpret,
    )(xp, y, g)
    return dxp.reshape(b, h, w, c)


def _pool_fwd(x: Array) -> Array:
    return _lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        _lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


@_jax.custom_vjp
def max_pool_2x2_fastgrad(x: Array) -> Array:
    """2x2/s2 VALID max pool, NHWC, even H and W. Forward: XLA
    reduce_window (bit-identical to nn.max_pool). Backward: Pallas
    first-max scatter — measured vs select_and_scatter on v5e-1 in
    benchmarks/pool_bwd_ab.py. Gradient is bitwise select_and_scatter's
    (first max in window scan order takes the whole cotangent)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"max_pool_2x2_fastgrad needs even H, W; got {(h, w)}")
    return _pool_fwd(x)


def _fastgrad_fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _fastgrad_bwd(res, g):
    x, y = res
    interpret = _jax.default_backend() != "tpu"
    return (_max_pool_bwd_pallas(x, y, g.astype(x.dtype), interpret),)


max_pool_2x2_fastgrad.defvjp(_fastgrad_fwd, _fastgrad_bwd)
