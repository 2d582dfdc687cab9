"""Fused VGG block-1 stem: conv1_2 + ReLU + requant + 2x2/s2 max-pool as
one Pallas kernel over a pixel-pair-packed conv1_1 output.

Why (r2 profile, benchmarks/profile_int8.py): block-1 is 5.8 ms of the
20.3 ms SSD-300 int8 program — conv1_2 sits AT the 50%-MXU-lane ceiling
(64 output channels), conv1_1 underfills K (Cin=3), and pool1 pays a full
369 MB round-trip. The fix is a layout change plus a kernel:

1.  conv1_1 runs as an XLA conv with kernel (3,4), stride (1,2), and
    DOUBLED output channels ("odd-pair packing"): output position
    (R, J, n*64+o) holds conv1_1 at pixel row R-1, column 2J-1+n —
    adjacent odd/even columns land in channel groups. Full 128 output
    lanes (vs 64), kernel picked so the emitted tensor already carries
    the +-1 row/column halo conv1_2 needs (no pad pass).
2.  This kernel computes conv1_2 on that layout as SIX zero-copy
    "flat-shift" dots per band — (M,128)@(128,128) at 75% effective MXU
    utilization (the odd-pair alignment makes each output pair's 4-pixel
    window exactly 2 input pairs; 25% structural zeros) — then fuses
    dequant + bias + ReLU + requant and the 2x2/s2 max pool in VMEM.
    The 369 MB conv1_2 activation never touches HBM.

Exactness: same int8 MACs in int32, same f32 epilogue as the unfused
engine path; pool commutes with the (monotone) requant. Parity test:
tests/test_quant.py::test_fused_stem_matches_unfused.

STATUS (r3, v5e-1, bs=64): ON by default for TPU (engine.build_spec
auto); headline A/B stem ON 3283 vs OFF 3157 img/s/chip
(benchmarks/headline_results.json). r3 chain breakdown (HLO profile):
input relayout copy.41 0.45 + producer conv 0.88 + kernel 2.13
(double-buffered DMA) + output unpack 0.85 ms. The decisive r2 fix was
operand-layout matching: pallas defaults to row-major operand layouts
while XLA's conv emitters produce {3,0,2,1}, which both blocked the
conv's requant-epilogue fusion and forced a 1.5 GB s32 relayout; the
logically-transposed (row, pair, batch, channel) interface makes the
transposes bitcasts. Batch is tiled in sublanes, so each program
handles 8 images and all tap offsets are 8-aligned.

r3 A/B'd variants: pair-packed emit + in-kernel halo masking (the r2
~0.57 ms output slice seam — WON, default), cross-program DMA double
buffering (WON, default), HWNC producer direct-emit (wash, off),
zero-pad width carry-through (1.3% slower, off, ODT_STEM_CARRY),
HWCN input staging (measured wash on v5e-1: 1.0016x median over 4
rounds, benchmarks/chip_logs/input_layout_ab.log — the copy.41 relayout
is apparently latency-hidden; off), fully-fused producer
`stem_fused_producer` (conv1_1 in-kernel over the lane-padded tap stack
— MEASURED DEAD END on v5e-1: 1939 vs 3393 img/s, 0.57x, bit-exact
compiled (benchmarks/chip_logs + stem_fp_ab.py). Mosaic rejects any
slice of a 36-lane tiled memref, so the tap stack must be lane-padded
to 128; XLA then materializes the 377 MB pad+concat+transpose chain as
multiple full passes, which costs far more than the producer conv +
relayout it removes. Kept off-default behind ODT_STEM_FP as the
negative-result record).

Weight packing helpers live here so the quant engine and tests share one
source of truth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_conv11_pair(w1: np.ndarray, square: bool = False) -> np.ndarray:
    """(3,3,Cin,C) conv1_1 kernel -> (3,2,2*Cin,2C) odd-pair kernel over
    the pair-column input reshape.

    The input image is viewed as (B,H,W/2,2*Cin) — adjacent column pairs
    merged into channels (a pure reshape) — so the pair-packed conv1_1 is
    a NORMAL stride-1 conv (XLA fuses the requant epilogue into it; the
    stride-2 formulation materialized a 1.5 GB s32 accumulator to HBM).
    Output channel n*C+o is conv1_1 channel o at column 2J-1+n of pair J:
    W1r[ky, kxp, m*Cin+i, n*C+o] = W1[ky, 2*kxp+m-n, i, o]
    (zero outside 0 <= kx <= 2).
    """
    kh, kw, cin, cout = w1.shape
    assert (kh, kw) == (3, 3)
    # square=True appends an all-zero kx-plane: same math, 1.5x the MACs,
    # but a square window can select a different (fusing) XLA emitter —
    # A/B knob for the producer-fusion problem (measured no better on
    # v5e; benchmarks/stem_producer_bench.py).
    kw_packed = 3 if square else 2
    out = np.zeros((3, kw_packed, 2 * cin, 2 * cout), w1.dtype)
    for kxp in range(2):
        for m in range(2):
            for n in range(2):
                kx = 2 * kxp + m - n
                if 0 <= kx <= 2:
                    out[:, kxp, m * cin : (m + 1) * cin,
                        n * cout : (n + 1) * cout] = w1[:, kx]
    return out


def pack_conv12_pair(w2: np.ndarray) -> np.ndarray:
    """(3,3,64,64) conv1_2 kernel -> (6, 128, 128) shift-dot weights.

    Dot t = 2*ky + kJ contracts input pair J=u+kJ (channel n*64+o =
    x1 column 2(u+kJ)-1+n) against output pair u (channel m*64+p =
    y2 column 2u+m): W2pp[t, n*64+o, m*64+p] = W2[ky, 2kJ+n-m, o, p]
    (zero outside 0<=kx<=2 — exactly 25% structural zeros).
    """
    kh, kw, cin, cout = w2.shape
    assert (kh, kw) == (3, 3) and cin == cout
    out = np.zeros((6, 2 * cin, 2 * cout), w2.dtype)
    for ky in range(3):
        for kj in range(2):
            t = 2 * ky + kj
            for n in range(2):
                for m in range(2):
                    kx = 2 * kj + n - m
                    if 0 <= kx <= 2:
                        out[t, n * cin : (n + 1) * cin,
                            m * cout : (m + 1) * cout] = w2[ky, kx]
    return out


def stem_band_rows(h: int) -> int:
    """Band size (conv1_2 rows per grid step) dividing the image height:
    300 -> 6, 512 -> 8. Sized for the 8-batch-per-program kernel's VMEM
    budget (int32 accumulator = rows * jp * 8 * 512 B)."""
    for band in (8, 6, 4, 2):
        if h % band == 0:
            return band
    raise ValueError(f"stem kernel needs an even image height, got {h}")


def stem_halo_mask(h: int, w: int) -> np.ndarray:
    """(1, H+2, W//2+2, 128) bool: True where the odd-pair tensor holds a
    REAL conv1_1 output. Halo rows/columns must be zero CODES (conv1_2's
    zero padding), but the strided conv computes partial sums + bias
    there — the requant epilogue multiplies by this mask."""
    jp = w // 2 + 2
    rows_ok = np.zeros((h + 2, 1, 1), bool)
    rows_ok[1 : h + 1] = True
    col = 2 * np.arange(jp)[:, None] + (np.arange(128)[None, :] >= 64) - 1
    cols_ok = (col >= 0) & (col < w)
    return (rows_ok & cols_ok[None])[None]


def conv11_pair_acc(
    x: Array,
    w1r: Array,
    out_order: str = "NHWC",
    pre_paired: bool = False,
    in_order: str = "NHWC",
) -> Array:
    """Input (B,H,W,Cin) -> odd-pair conv1_1 accumulator
    (B, H+2, W//2+2, 128) in int32 (or f32 for float x), WITH the row and
    pair-column halo conv1_2 needs. Implemented as a stride-1 conv over
    the pair-column reshape so XLA's good emitter (with epilogue fusion)
    handles it.

    pre_paired=True: x is already (B, H, W//2, 2*Cin). Reshaping BEFORE
    the producer's elementwise quantize (instead of here) lets XLA emit
    the quantize output directly in the conv's operand layout — the
    post-quantize reshape cost a 0.45 ms relayout copy at bs=64 (r3
    profile, copy.41 at 71 GiB/s).

    out_order="HWNC" emits (H+2, W//2+2, B, 128) directly — the exact
    logical order `conv12_pool_pair(..., input_transposed=True)` consumes,
    removing the transpose from the XLA graph entirely (A/B vs. relying on
    XLA to bitcast the {3,0,2,1}-layout transpose;
    benchmarks/stem_experiments.py).

    in_order="HWCN": x is (H, W//2, 2*Cin, B) pre-paired codes (the
    serving batch staged channels-then-batch-minor on the host). XLA's
    producer-conv emitter wants its input batch-minor ({0,3,2,1} on the
    NHWC form — memory order (row, pair, ch, batch)); feeding NHWC cost
    a 0.45 ms / 71 GiB/s relayout (r3 profile, copy.41). HWCN input IS
    that memory order row-major, so the operand becomes a bitcast.
    Implies pre_paired."""
    if in_order == "HWCN":
        assert pre_paired, "HWCN input must be pre-paired (H, W//2, 2C, B)"
        xr = x
        lhs_spec = "HWCN"
    else:
        if pre_paired:
            xr = x
        else:
            b, h, w, cin = x.shape
            xr = x.reshape(b, h, w // 2, 2 * cin)
        lhs_spec = "NHWC"
    dn = jax.lax.conv_dimension_numbers(
        xr.shape, w1r.shape, (lhs_spec, "HWIO", out_order)
    )
    acc_t = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    pad_w = (1, 2) if w1r.shape[1] == 2 else (1, 3)
    return jax.lax.conv_general_dilated(
        xr, w1r, (1, 1), [(2, 2), pad_w],
        dimension_numbers=dn, preferred_element_type=acc_t,
    )


# ---------------------------------------------------------------------------
# Pallas conv1_2 + pool kernel
# ---------------------------------------------------------------------------

def _stem_kernel(
    x_hbm,  # ANY (H+2, Jp, B, 128) s8 odd-pair conv1_1 codes (halo'd)
    w_ref,  # VMEM (6, 128, 128) s8 packed conv1_2
    mask_ref,  # VMEM (1, Jp, 1, 128) s8 column-halo mask (1=real, 0=halo)
    deq_ref,  # VMEM (1, 128) f32 per-channel dequant (x scale included)
    bias_ref,  # VMEM (1, 128) f32
    scale_ref,  # SMEM (1, 1) f32 requant (output activation) scale
    out_hbm,  # ANY (H/2, Jp//2, B, 128) s8 pair-packed pooled output
    x_vmem,  # scratch (2, rows+3, Jp, nb, 128) s8 double-buffered
    out_vmem,  # scratch (2, rows//2, Jp//2, nb, 128) s8 double-buffered
    in_sems,  # DMA semaphores (2,)
    out_sems,  # DMA semaphores (2,)
    *,
    rows: int,  # conv1_2 output rows per band (= 2 * pool rows)
    jp: int,  # padded pair count (x1pp width)
    nb: int,  # batch elements per program (8 = one sublane tile)
    out_width: int,  # true pooled width; pooled cols beyond it emit 0
):
    # NOTE on shapes: the tensors are LOGICALLY transposed to
    # (row, pair, batch, channel) so that the default pallas operand
    # layout coincides with the physical layout XLA's conv emitter picks
    # ({3,0,2,1} on the NHWC form) — otherwise XLA inserts a full s32
    # relayout copy between the conv and this kernel and cannot fuse the
    # requant epilogue into the conv (measured: +2.7 ms at bs=64). The
    # physical tiling places BATCH in sublanes, so each program handles
    # nb=8 batch elements (tile-aligned slices; every tap offset becomes
    # a multiple of 8 — no misaligned operand slices at all).
    #
    # DMA pipelining: the sequential grid double-buffers ACROSS programs —
    # program n waits on the band its predecessor prefetched, immediately
    # prefetches program n+1's band into the other slot, computes, and
    # drains its output copy asynchronously (program n+2 reclaims the
    # slot). The r2 kernel's start();wait() serialization put the full
    # 376 MB band traffic on the critical path.
    g = pl.program_id(0)
    band = pl.program_id(1)
    n_bands = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_bands
    n = g * n_bands + band
    slot = jax.lax.rem(n, 2)

    # The x scratch has one extra (garbage) row per slot: the ky=2,kj=1
    # tap's flat slice reaches one row past the halo for wrap-junk output
    # columns (sliced off later), and the slice itself must stay in
    # bounds.
    def in_copy(g_, band_, slot_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band_ * rows, rows + 2), :, pl.ds(g_ * nb, nb)],
            x_vmem.at[slot_, pl.ds(0, rows + 2)],
            in_sems.at[slot_],
        )

    def out_copy(g_, band_, slot_):
        return pltpu.make_async_copy(
            out_vmem.at[slot_],
            out_hbm.at[
                pl.ds(band_ * (rows // 2), rows // 2), :, pl.ds(g_ * nb, nb)
            ],
            out_sems.at[slot_],
        )

    @pl.when(n == 0)
    def _():
        in_copy(g, band, slot).start()

    in_copy(g, band, slot).wait()

    # Prefetch the successor program's band (wrapping to the next batch
    # group) while this program computes.
    wrap = band + 1 == n_bands
    band_nxt = jnp.where(wrap, 0, band + 1)
    g_nxt = g + wrap.astype(jnp.int32)

    @pl.when(n + 1 < n_total)
    def _():
        in_copy(g_nxt, band_nxt, 1 - slot).start()

    # Zero halo positions as VALUE selects (no scratch stores): ALL column
    # halos (full pair jp-1 plus the two half-channel groups: pair 0 group
    # n=0 = column -1, pair jp-2 group n=1 = column w) via the broadcast
    # mask — sub-128-lane stores on a single pair don't lower in Mosaic,
    # but a full-band VPU select is cheap and keeps the halo zeroing out
    # of the XLA graph (it used to be two dynamic-update-slice HBM passes
    # on the 376 MB conv1_1 buffer, ~0.2 ms at bs=64). Row halos (image
    # row -1 on the first band, row H on the last) fold into the same
    # select via a row iota.
    xv = x_vmem[slot]  # (rows+3, jp, nb, 128)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows + 3, 1, 1, 1), 0)
    row_halo = ((band == 0) & (row_ids == 0)) | (
        (band == n_bands - 1) & (row_ids == rows + 1)
    )
    keep = (mask_ref[:] != 0) & jnp.logical_not(row_halo)
    xv = jnp.where(keep, xv, jnp.zeros_like(xv))

    flat = xv.reshape((rows + 3) * jp * nb, 128)
    m = rows * jp * nb
    acc = jnp.zeros((m, 128), jnp.int32)
    for ky in range(3):
        for kj in range(2):
            t = 2 * ky + kj
            off = (ky * jp + kj) * nb
            acc += jax.lax.dot_general(
                flat[off : off + m],
                w_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    y = acc.astype(jnp.float32) * deq_ref[:] + bias_ref[:]
    y = jnp.maximum(y, 0.0)
    # Pool BEFORE requant, in f32 (Mosaic has no int8 max ops; requant is
    # monotone so the order is exact): column pairs are the two
    # 64-channel groups; row pairs are adjacent M rows (regrouped via a
    # metadata-only reshape).
    y = jnp.maximum(y[:, :64], y[:, 64:])  # (rows*jp*nb, 64)
    y = y.reshape(rows // 2, 2, jp * nb, 64)
    y = jnp.maximum(y[:, 0], y[:, 1])  # (rows//2, jp*nb, 64)
    q = jnp.clip(jnp.round(y / scale_ref[0, 0]), -127, 127).astype(jnp.int8)
    # Zero the junk pooled columns (wrap garbage beyond the true pooled
    # width) IN the emit: downstream can then consume the full Jp-wide
    # tensor as if it were zero-padded — the launcher's slice to out_width
    # cost a 0.57 ms materializing relayout at bs=64 (r3 profile,
    # reshape.4); a zero-code column is exact conv padding for block 2.
    q3 = q.reshape(rows // 2, jp, nb, 64)
    pool_col = jax.lax.broadcasted_iota(jnp.int32, (1, jp, 1, 1), 1)
    q3 = jnp.where(pool_col < out_width, q3, jnp.zeros_like(q3))
    # Pair-packed emit: lane = (pool-column parity m) * 64 + channel, so
    # the output uses all 128 lanes with NO duplicated half (the r2 kernel
    # duplicated the 64 channels to make the HBM DMA full-lane, doubling
    # the write traffic and the downstream unpack read). The launcher's
    # reshape (Jp//2, 128) -> (Jp, 64) is metadata-free.
    q = q3.reshape(rows // 2, jp // 2, 2, nb, 64)
    # Reclaim this slot's output buffer (program n-2's copy) before
    # overwriting it; the copy itself drains asynchronously under the
    # successor programs' compute.
    @pl.when(n >= 2)
    def _():
        out_copy(g, band, slot).wait()

    out_vmem[slot, :, :, :, 0:64] = q[:, :, 0]
    out_vmem[slot, :, :, :, 64:128] = q[:, :, 1]
    out_copy(g, band, slot).start()

    @pl.when(n == n_total - 1)
    def _():
        if n_total > 1:
            out_copy(g, band, 1 - slot).wait()
        out_copy(g, band, slot).wait()


@functools.partial(
    jax.jit,
    static_argnames=("out_width", "interpret", "band_rows",
                     "input_transposed", "full_width"),
)
def conv12_pool_pair(
    x1pp: Array,  # (B, H+2, Jp, 128) s8 odd-pair conv1_1 codes
    w2pp: Array,  # (6, 128, 128) s8
    deq: Array,  # (128,) f32 — cur_scale * w_scale (tiled x2)
    bias: Array,  # (128,) f32 (tiled x2)
    out_scale: Array,  # scalar f32 requant scale (traced-safe)
    out_width: int,  # true pooled width (pairs beyond it are halo junk)
    interpret: bool | None = None,
    band_rows: int = 20,
    input_transposed: bool = False,  # x1pp already (H+2, Jp, B, 128)
    full_width: bool = False,  # return all Jp cols (junk cols emit 0)
) -> Array:
    """Fused conv1_2+relu+requant+pool over the odd-pair layout.

    Returns (B, H//2, out_width, 64) int8 codes. Internally operates on
    the (row, pair, batch, channel) logical transpose of both input and
    output so the pallas operand layouts match XLA's conv layouts on both
    sides (free bitcast-transposes; see _stem_kernel NOTE).

    full_width=True skips the final slice and returns (B, H//2, Jp, 64)
    with columns >= out_width exactly ZERO (the kernel masks them in the
    emit). The slice to out_width materialized a relayout copy (0.57 ms
    at bs=64, r3 profile reshape.4); callers can instead carry the
    zero-padded width through block 2/3 — a zero int8 code column is
    bit-exact SAME conv padding — and let the floor pools reconverge the
    shape (see quant.engine.run_int8 junk-column tracking).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if input_transposed:
        hp2, jp, b, c2 = x1pp.shape
    else:
        b, hp2, jp, c2 = x1pp.shape
    h = hp2 - 2
    assert h % band_rows == 0, (h, band_rows)
    assert jp % 2 == 0, jp
    n_bands = h // band_rows
    nb = 8 if b % 8 == 0 else 1  # batch sublane tile (TPU needs 8)

    # Column-halo mask (see _stem_kernel): all halo zeroing happens in the
    # kernel via one VPU multiply — no dynamic-update-slice HBM passes on
    # the 376 MB conv1_1 buffer.
    w_true = 2 * (jp - 2)
    col = 2 * np.arange(jp)[:, None] + (np.arange(128)[None, :] >= 64) - 1
    mask = ((col >= 0) & (col < w_true)).astype(np.int8)  # (Jp, 128)
    if input_transposed:
        x_t = x1pp  # producer already emitted (H+2, Jp, B, 128)
    else:
        x_t = jnp.transpose(x1pp, (1, 2, 0, 3))  # (H+2, Jp, B, 128)
    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, rows=band_rows, jp=jp, nb=nb, out_width=out_width
        ),
        grid=(b // nb, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 128, 128), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jp, 1, 128), lambda i, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h // 2, jp // 2, b, 128), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, band_rows + 3, jp, nb, 128), jnp.int8),
            pltpu.VMEM((2, band_rows // 2, jp // 2, nb, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        x_t,
        w2pp,
        jnp.asarray(mask).reshape(1, jp, 1, 128),
        deq.reshape(1, 128),
        bias.reshape(1, 128),
        jnp.asarray(out_scale, jnp.float32).reshape(1, 1),
    )
    # Unpack: (H/2, Jp/2, B, 128) -> (B, H/2, Jp/2, 128) transpose (the
    # only remaining data copy — half the size of the r2 duplicated-half
    # seam) -> metadata reshape splitting lanes (pair, channel) back into
    # (column, channel) -> drop halo columns. Output pair u holds pooled
    # columns (2u, 2u+1); columns >= out_width are halo/wrap junk.
    out = jnp.transpose(out, (2, 0, 1, 3))  # (B, H/2, Jp/2, 128)
    out = out.reshape(b, h // 2, jp, 64)
    if full_width:
        return out
    return out[:, :, :out_width, :]


# ---------------------------------------------------------------------------
# Fully-fused stem: conv1_1 INSIDE the kernel (r3 producer-fusion lever)
# ---------------------------------------------------------------------------
#
# The r3 HLO profile prices the producer chain feeding conv12_pool_pair at
# copy.41 0.45 ms (input relayout) + producer conv 0.88 ms, and the kernel
# itself reads the 376 MB odd-pair int8 intermediate back from HBM. Fusing
# conv1_1 into the kernel removes that chain: the host stacks the six
# (ky, kj) input taps channel-wise, lane-padded to 128 (Mosaic cannot
# slice a 36-lane tiled memref; the padded stack is 377 MB at SSD-300
# bs=64 — the same bytes as the conv1_1 codes it replaces, while the
# producer's write + the relayout's read/write of those bytes disappear)
# and the kernel computes the odd-pair conv1_1 as ONE K=128 int8 dot per
# band, applies the conv1_1 epilogue + halo masking in VMEM, and feeds the
# existing conv1_2 flat-shift pipeline. Same MACs, same f32 epilogue order
# -> bit-exact vs the two-stage path (test-enforced).


def pack_conv11_flat(w1r: np.ndarray) -> np.ndarray:
    """(3, 2, 2*Cin, 2C) odd-pair conv1_1 kernel -> (128, 2C) flat weights
    for the in-kernel tap-stacked dot: row (2*ky+kj)*2Cin + c contracts x6
    lane group t=(2*ky+kj), channel c; rows 6*2Cin..127 are zero. The K
    dim is padded to a full 128-lane tile because Mosaic cannot slice a
    36-lane tiled memref (DMA lane slices must be 128-aligned) — and the
    MXU contracts K=128 per pass regardless, so the zeros are free."""
    kh, kw, c2in, c2out = w1r.shape
    assert (kh, kw) == (3, 2)
    flat = np.asarray(w1r).reshape(kh * kw * c2in, c2out)
    out = np.zeros((128, c2out), w1r.dtype)
    out[: flat.shape[0]] = flat
    return out


def build_stem_x6(codes_pp: Array) -> Array:
    """(B, H, W//2, 2*Cin) pre-paired quantized input codes -> the
    tap-stacked conv1_1 operand (B, H+2, Jp, 128) with Jp = W//2 + 2:
    x6[b, R, J, t*2Cin + c] = codes_pp[b, R+ky-2, J+kj-1, c] for
    t = 2*ky + kj (zero outside the image — conv1_1's own zero padding,
    so the kernel's dot needs no pad handling at all); lanes 36..127 are
    zero. The lane pad to 128 is a Mosaic constraint (tiled memrefs
    cannot be sliced at 36 lanes); HBM-wise the padded stack is the same
    size as the conv1_1 codes it replaces, and it removes the producer
    conv plus the (H,Jp,B,128) relayout copy from the chain."""
    b, h, wh, c2 = codes_pp.shape
    jp = wh + 2
    pad = jnp.pad(codes_pp, ((0, 0), (2, 2), (1, 2), (0, 0)))
    taps = [
        pad[:, ky : ky + h + 2, kj : kj + jp, :]
        for ky in range(3)
        for kj in range(2)
    ]
    x6 = jnp.concatenate(taps, axis=-1)
    return jnp.pad(x6, ((0, 0), (0, 0), (0, 0), (0, 128 - 6 * c2)))


def _stem_fp_kernel(
    x_hbm,  # ANY (H+2, Jp, B, 128) s8 tap-stacked input codes (36 used)
    w1_ref,  # VMEM (128, 128) s8 flat odd-pair conv1_1 (36 rows used)
    w2_ref,  # VMEM (6, 128, 128) s8 packed conv1_2
    mask_ref,  # VMEM (1, Jp, 1, 128) s8 column-halo mask (1=real, 0=halo)
    deq1_ref,  # VMEM (1, 128) f32 conv1_1 dequant (input scale included)
    bias1_ref,  # VMEM (1, 128) f32
    deq2_ref,  # VMEM (1, 128) f32 conv1_2 dequant (s1 included)
    bias2_ref,  # VMEM (1, 128) f32
    scales_ref,  # SMEM (1, 2) f32 requant scales (s1, s2)
    out_hbm,  # ANY (H/2, Jp//2, B, 128) s8 pair-packed pooled output
    x_vmem,  # scratch (2, rows+3, Jp, nb, 128) s8 double-buffered
    out_vmem,  # scratch (2, rows//2, Jp//2, nb, 128) s8 double-buffered
    in_sems,
    out_sems,
    *,
    rows: int,
    jp: int,
    nb: int,
    out_width: int,
):
    # Same DMA skeleton as _stem_kernel (double-buffered across programs),
    # but the HBM operand is the 128-lane tap stack instead of the
    # conv1_1 codes — same bytes, no producer conv, no relayout copy.
    g = pl.program_id(0)
    band = pl.program_id(1)
    n_bands = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_bands
    n = g * n_bands + band
    slot = jax.lax.rem(n, 2)

    def in_copy(g_, band_, slot_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band_ * rows, rows + 2), :, pl.ds(g_ * nb, nb)],
            x_vmem.at[slot_, pl.ds(0, rows + 2)],
            in_sems.at[slot_],
        )

    def out_copy(g_, band_, slot_):
        return pltpu.make_async_copy(
            out_vmem.at[slot_],
            out_hbm.at[
                pl.ds(band_ * (rows // 2), rows // 2), :, pl.ds(g_ * nb, nb)
            ],
            out_sems.at[slot_],
        )

    @pl.when(n == 0)
    def _():
        in_copy(g, band, slot).start()

    in_copy(g, band, slot).wait()

    wrap = band + 1 == n_bands
    band_nxt = jnp.where(wrap, 0, band + 1)
    g_nxt = g + wrap.astype(jnp.int32)

    @pl.when(n + 1 < n_total)
    def _():
        in_copy(g_nxt, band_nxt, 1 - slot).start()

    # conv1_1: one K=128 int8 dot over the whole band (structural zeros of
    # the odd-pair packing + the 92 lane-pad rows included in w1 — the MXU
    # contracts full 128-lane tiles regardless, so the pad is free). Row
    # rows+2 of the scratch is stale garbage, exactly like _stem_kernel:
    # it only ever reaches wrap-junk output columns, which the emit zeroes.
    xv6 = x_vmem[slot]  # (rows+3, jp, nb, 128)
    m3 = (rows + 3) * jp * nb
    acc1 = jax.lax.dot_general(
        xv6.reshape(m3, 128),
        w1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y1 = acc1.astype(jnp.float32) * deq1_ref[:] + bias1_ref[:]
    y1 = jnp.maximum(y1, 0.0)
    q1 = jnp.clip(
        jnp.round(y1 / scales_ref[0, 0]), -127, 127
    ).astype(jnp.int8)
    codes1 = q1.reshape(rows + 3, jp, nb, 128)

    # Halo zeroing (value select, same contract as _stem_kernel): padded
    # taps make the halo a partial sum + bias + relu + requant, which must
    # read as ZERO codes (conv1_2's zero padding).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows + 3, 1, 1, 1), 0)
    row_halo = ((band == 0) & (row_ids == 0)) | (
        (band == n_bands - 1) & (row_ids == rows + 1)
    )
    keep = (mask_ref[:] != 0) & jnp.logical_not(row_halo)
    codes1 = jnp.where(keep, codes1, jnp.zeros_like(codes1))

    flat = codes1.reshape(m3, 128)
    m = rows * jp * nb
    acc = jnp.zeros((m, 128), jnp.int32)
    for ky in range(3):
        for kj in range(2):
            t = 2 * ky + kj
            off = (ky * jp + kj) * nb
            acc += jax.lax.dot_general(
                flat[off : off + m],
                w2_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    y = acc.astype(jnp.float32) * deq2_ref[:] + bias2_ref[:]
    y = jnp.maximum(y, 0.0)
    y = jnp.maximum(y[:, :64], y[:, 64:])
    y = y.reshape(rows // 2, 2, jp * nb, 64)
    y = jnp.maximum(y[:, 0], y[:, 1])
    q = jnp.clip(
        jnp.round(y / scales_ref[0, 1]), -127, 127
    ).astype(jnp.int8)
    q3 = q.reshape(rows // 2, jp, nb, 64)
    pool_col = jax.lax.broadcasted_iota(jnp.int32, (1, jp, 1, 1), 1)
    q3 = jnp.where(pool_col < out_width, q3, jnp.zeros_like(q3))
    q = q3.reshape(rows // 2, jp // 2, 2, nb, 64)

    @pl.when(n >= 2)
    def _():
        out_copy(g, band, slot).wait()

    out_vmem[slot, :, :, :, 0:64] = q[:, :, 0]
    out_vmem[slot, :, :, :, 64:128] = q[:, :, 1]
    out_copy(g, band, slot).start()

    @pl.when(n == n_total - 1)
    def _():
        if n_total > 1:
            out_copy(g, band, 1 - slot).wait()
        out_copy(g, band, slot).wait()


@functools.partial(
    jax.jit,
    static_argnames=("out_width", "interpret", "band_rows", "full_width"),
)
def stem_fused_producer(
    codes_pp: Array,  # (B, H, W//2, 2*Cin) s8 pre-paired input codes
    w1flat: Array,  # (128, 128) s8 (rows 36.. zero — see pack_conv11_flat)
    deq1: Array,  # (128,) f32 — in_scale * w1_scale
    bias1: Array,  # (128,) f32
    s1: Array,  # scalar f32 conv1_1 activation scale
    w2pp: Array,  # (6, 128, 128) s8
    deq2: Array,  # (128,) f32 — s1 * w2_scale
    bias2: Array,  # (128,) f32
    s2: Array,  # scalar f32 conv1_2 activation scale
    out_width: int,
    interpret: bool | None = None,
    band_rows: int = 20,
    full_width: bool = False,
) -> Array:
    """Whole VGG block 1 (conv1_1 + conv1_2 + relu + requant + pool) as one
    Pallas kernel over the tap-stacked input. Bit-exact vs the two-stage
    conv11_pair_acc -> conv12_pool_pair path (same int MACs, same f32
    epilogue order); returns (B, H//2, out_width, 64) int8 codes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wh, _ = codes_pp.shape
    jp = wh + 2
    assert h % band_rows == 0, (h, band_rows)
    n_bands = h // band_rows
    nb = 8 if b % 8 == 0 else 1

    x6 = build_stem_x6(codes_pp)  # (B, H+2, Jp, 128)
    x_t = jnp.transpose(x6, (1, 2, 0, 3))  # (H+2, Jp, B, 128)

    w_true = 2 * (jp - 2)
    col = 2 * np.arange(jp)[:, None] + (np.arange(128)[None, :] >= 64) - 1
    mask = ((col >= 0) & (col < w_true)).astype(np.int8)
    scales = jnp.stack(
        [jnp.asarray(s1, jnp.float32), jnp.asarray(s2, jnp.float32)]
    ).reshape(1, 2)

    out = pl.pallas_call(
        functools.partial(
            _stem_fp_kernel, rows=band_rows, jp=jp, nb=nb, out_width=out_width
        ),
        grid=(b // nb, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((128, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128, 128), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jp, 1, 128), lambda i, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h // 2, jp // 2, b, 128), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, band_rows + 3, jp, nb, 128), jnp.int8),
            pltpu.VMEM((2, band_rows // 2, jp // 2, nb, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        x_t,
        w1flat,
        w2pp,
        jnp.asarray(mask).reshape(1, jp, 1, 128),
        deq1.reshape(1, 128),
        bias1.reshape(1, 128),
        deq2.reshape(1, 128),
        bias2.reshape(1, 128),
        scales,
    )
    out = jnp.transpose(out, (2, 0, 1, 3))  # (B, H/2, Jp/2, 128)
    out = out.reshape(b, h // 2, jp, 64)
    if full_width:
        return out
    return out[:, :, :out_width, :]
