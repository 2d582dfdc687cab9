"""Pallas fused L2Norm + requant for the int8 SSD head path.

The VGG tap-0 L2Norm (x / ||x||_2 * gamma, ParseNet-style — SURVEY §2
component #9) sits between the int8 trunk and the int8 heads. XLA's
lowering of the jnp formulation costs ~1.2 ms at SSD-300 bs=64 (a
standalone sum-of-squares fusion over the 92 MB tap plus a separate
normalize+requant pass — benchmarks/profile_int8.py); the fused kernel
does one read + one write (~190 MB of HBM traffic, near the bandwidth
bound).

Exact math note: L2Norm is scale-invariant in its input, so it consumes
the raw int8 codes directly (the tap's activation scale cancels), and the
output requant scale is folded into gamma — identical arithmetic to
quant/engine.apply_heads_int8's jnp path up to float associativity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_ROW_CHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _l2norm_kernel(x_ref, g_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # (rows, W, C) int8 codes
    ssum = jnp.sum(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(ssum + 1e-12) * g_ref[:]
    out_ref[0] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def l2norm_requant(
    x_q: Array,  # (B, H, W, C) int8 tap codes
    gamma: Array,  # (C,) float learned scale
    out_scale: Array,  # calibrated "__l2norm__" activation scale (scalar)
    interpret: bool | None = None,
) -> Array:
    """int8 codes -> L2-normalized, gamma-scaled, requantized int8 codes.

    Blocks keep the native (B, H-tile, W, C) shape — no flatten: reshaping
    (B,38,38,512) to rows would retile sublanes across image boundaries
    (38 % 8 != 0), costing a full relayout copy of the 92 MB tap.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x_q.shape
    h_tile = min(8, h)
    # Requant scale folded into gamma: y = x * rsqrt(sum x^2) * (g / s).
    g_row = (
        gamma.astype(jnp.float32) / jnp.asarray(out_scale, jnp.float32)
    ).reshape(1, c)
    return pl.pallas_call(
        _l2norm_kernel,
        grid=(b, pl.cdiv(h, h_tile)),
        in_specs=[
            pl.BlockSpec(
                (1, h_tile, w, c), lambda i, r: (i, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda i, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h_tile, w, c), lambda i, r: (i, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x_q.shape, jnp.int8),
        interpret=interpret,
    )(x_q, g_row)
