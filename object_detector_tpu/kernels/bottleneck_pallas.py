"""Fused int8 ResNet bottleneck block as one Pallas kernel.

Why (r3 SSD-512 profile, benchmarks/chip_logs/profile_ssd512.log): the
ResNet-50 trunk runs at 188 TOP/s aggregate against a 325 TOP/s measured
conv roofline, and the laggards are the stage-1/2 bottleneck 1x1 convs —
tiny-FLOP, huge-byte ops (the stage-1 working tensors are 268 MB at
bs=64) that XLA executes as separate HBM round trips: conv1 write+read,
conv2 write+read, conv3 write, plus the residual re-read. This kernel
computes the whole stride-1 bottleneck

    out = requant(relu(conv3(mid2) * deq3 + b3 + resid * resid_scale))
    mid2 = requant(relu(conv2(mid1) * deq2 + b2))        # 3x3, SAME
    mid1 = requant(relu(conv1(x)    * deq1 + b1))        # 1x1

with both 64/128-channel intermediates VMEM-resident: HBM traffic drops
from ~4 tensor round trips + residual to exactly one read + one write
(+ a 2-row halo re-read per band).

Layout: x is NHWC int8. Grid = (batch, row-bands); each program owns a
(band_rows, W, C) slab plus 1-row top/bottom halos fetched as separate
1-row blocks (SAME padding at image edges is masked in-kernel). The 1x1
convs are MXU int8 matmuls over flattened pixels; the 3x3 is nine
shift-dots over a zero-side-padded VMEM scratch, accumulated in int32.

Exactness: same int8 MACs accumulated in int32 and the SAME f32 epilogue
op sequence as the unfused engine path (acc*deq + bias [+ resid*scale],
relu, y / out_scale, round, clip) — bit-exact by construction; enforced
by tests/test_quant.py::test_fused_bottleneck_matches_unfused.

Reference capability: ResNet-50 backbone per SURVEY.md §2 #8 (reference
unreadable — BASELINE.json is the contract); this kernel changes how,
not what.

STATUS — measured DEAD END on v5e-1, kept selectable and off by default.
Same-session interleaved A/B (benchmarks/bottleneck_ab.py ->
chip_logs/bottleneck_ab.log, parity bit-exact): SSD-512 int8 end-to-end
unfused=1675.8 vs fused=1230.0 img/s (0.734x). The HBM the kernel saves
is real, but XLA's unfused path overlaps those round trips with the MXU
work of neighbouring ops, while this kernel serializes nine shift-dots
per band behind the band DMA — losing more MXU occupancy than the
bandwidth win buys at these shapes. Enable via ODT_FUSED_BOTTLENECK=1
or build_resnet_trunk_spec(fused_bottleneck=True) for future hardware
with a worse bytes/FLOP ratio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _requant(acc_i32, deq, bias, out_scale, extra=None):
    """EXACT engine epilogue: acc*deq + bias [+ extra], relu, /scale,
    round, clip -> int8. Op-for-op identical to quant/engine.py run_int8
    so the fused block is bit-exact vs the unfused chain."""
    y = acc_i32.astype(jnp.float32) * deq + bias
    if extra is not None:
        y = y + extra
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)


def _dot_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _bottleneck_kernel(
    x_ref,  # (1, Hb, W, C) int8 band
    xp_ref,  # (1, 1, W, C) int8 row above the band (clamped at top)
    xn_ref,  # (1, 1, W, C) int8 row below the band (clamped at bottom)
    w1_ref,  # (C, Cm) int8
    d1_ref,  # (1, Cm) f32 dequant multipliers (in_scale * w_scale)
    b1_ref,  # (1, Cm) f32 bias
    w2_ref,  # (9, Cm, Cm) int8 (ky*3+kx)
    d2_ref, b2_ref,  # (1, Cm) f32
    w3_ref,  # (Cm, C) int8
    d3_ref, b3_ref,  # (1, C) f32
    scales_ref,  # SMEM (1, 4) f32: s1, s2, s3, resid_scale (traced-safe)
    out_ref,  # (1, Hb, W, C) int8
    mid_ref,  # scratch (Hb+2, W+2, Cm) int8, zero side columns
    *,
    hb: int,
    w: int,
    c: int,
    cm: int,
):
    r = pl.program_id(1)
    nbands = pl.num_programs(1)
    s1 = scales_ref[0, 0]
    s2 = scales_ref[0, 1]
    s3 = scales_ref[0, 2]
    resid_scale = scales_ref[0, 3]
    d1 = d1_ref[:]
    b1 = b1_ref[:]

    xb = x_ref[0]  # (Hb, W, C)
    # conv1 (1x1) over the band + halo rows; halo rows come from 1-row
    # blocks whose index maps clamp at the image edge — mask them to the
    # SAME-pad zero there.
    q_band = _requant(_dot_i8(xb.reshape(hb * w, c), w1_ref[:]), d1, b1, s1)
    q_prev = _requant(_dot_i8(xp_ref[0, 0], w1_ref[:]), d1, b1, s1)
    q_next = _requant(_dot_i8(xn_ref[0, 0], w1_ref[:]), d1, b1, s1)
    zero_row = jnp.zeros_like(q_prev)
    q_prev = jnp.where(r == 0, zero_row, q_prev)
    q_next = jnp.where(r == nbands - 1, zero_row, q_next)

    # Zero-side-padded mid1 for the 3x3's SAME horizontal padding.
    mid_ref[:, 0, :] = jnp.zeros((hb + 2, cm), jnp.int8)
    mid_ref[:, w + 1, :] = jnp.zeros((hb + 2, cm), jnp.int8)
    mid_ref[0, 1 : w + 1, :] = q_prev
    mid_ref[1 : hb + 1, 1 : w + 1, :] = q_band.reshape(hb, w, cm)
    mid_ref[hb + 1, 1 : w + 1, :] = q_next

    # conv2: nine shift-dots over the padded scratch, int32 accumulate.
    acc2 = jnp.zeros((hb * w, cm), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            tap = mid_ref[ky : ky + hb, kx : kx + w, :].reshape(hb * w, cm)
            acc2 += _dot_i8(tap, w2_ref[ky * 3 + kx])
    q2 = _requant(acc2, d2_ref[:], b2_ref[:], s2)

    # conv3 (1x1) + residual + relu + requant.
    acc3 = _dot_i8(q2, w3_ref[:])
    resid = xb.reshape(hb * w, c).astype(jnp.float32) * resid_scale
    out = _requant(acc3, d3_ref[:], b3_ref[:], s3, extra=resid)
    out_ref[0] = out.reshape(hb, w, c)


def _pick_band_rows(h: int) -> int:
    for hb in (16, 8, 4, 2, 1):
        if h % hb == 0:
            return min(hb, h)
    return 1


@functools.partial(
    jax.jit, static_argnames=("band_rows", "interpret")
)
def fused_bottleneck(
    x: Array,  # (B, H, W, C) int8
    w1: Array,  # (C, Cm) int8
    deq1: Array, bias1: Array,  # (Cm,) f32
    w2: Array,  # (3, 3, Cm, Cm) int8 HWIO
    deq2: Array, bias2: Array,  # (Cm,) f32
    w3: Array,  # (Cm, C) int8
    deq3: Array, bias3: Array,  # (C,) f32
    *,
    s1: Array,  # scalar f32 activation scales (traced-safe)
    s2: Array,
    s3: Array,
    resid_scale: Array,
    band_rows: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Stride-1, non-projection int8 bottleneck: returns (B, H, W, C)
    int8 codes at activation scale s3. Residual is x itself (codes at
    resid_scale), exactly the engine's SaveOp("sc") semantics."""
    b, h, w, c = x.shape
    cm = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = band_rows or _pick_band_rows(h)
    nbands = h // hb
    w2r = w2.reshape(9, cm, cm)
    row2 = lambda v: v.reshape(1, -1)  # noqa: E731

    grid = (b, nbands)
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda bi, r: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    scales = jnp.stack(
        [
            jnp.asarray(s1, jnp.float32),
            jnp.asarray(s2, jnp.float32),
            jnp.asarray(s3, jnp.float32),
            jnp.asarray(resid_scale, jnp.float32),
        ]
    ).reshape(1, 4)
    kernel = functools.partial(_bottleneck_kernel, hb=hb, w=w, c=c, cm=cm)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            # 1-row halos in ROW units (block dim 1): clamped at edges,
            # masked in-kernel.
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bi, r: (bi, jnp.maximum(r * hb - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bi, r: (bi, jnp.minimum(r * hb + hb, h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(w1),
            full(row2(deq1)), full(row2(bias1)),
            full(w2r),
            full(row2(deq2)), full(row2(bias2)),
            full(w3),
            full(row2(deq3)), full(row2(bias3)),
            pl.BlockSpec((1, 4), lambda bi, r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, w, c), lambda bi, r: (bi, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        scratch_shapes=[pltpu.VMEM((hb + 2, w + 2, cm), jnp.int8)],
        interpret=interpret,
    )(
        x, x, x,
        w1, row2(deq1), row2(bias1),
        w2r, row2(deq2), row2(bias2),
        w3, row2(deq3), row2(bias3),
        scales,
    )
    return out
