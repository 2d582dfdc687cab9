"""Fused ResNet stem: 7x7/s2 int8 conv + BN(pre-folded) + ReLU + requant +
3x3/s2 max-pool as ONE Pallas kernel.

Why (TPU_WORK_QUEUE r5 lever #1): the SSD-512/RetinaNet stem chain costs
~4.6 ms at bs=64 (direct conv ~2.2 + pool ~1.0 + quantize convert ~1.4 —
chip_logs/ssd512_conv_map.log) against a ~0.5 ms MXU roofline, and every
XLA-level reformulation measured a loss (chip_logs/stem_packed_ab.log:
img-pair 4.86 / s2d-colpack 7.97 / quadcol 7.89 / paircol 6.71 vs direct
4.34 ms). This kernel is the Mosaic-level attack.

Formulation ("parity-split lanes", avoids BOTH known Mosaic hazards —
sub-128-lane tiles and negative roll shifts):

* The padded input row (W pixels x 3 ch = 3W values) is staged as
  (U=16, L=W/4): lane c'' holds flat values [12c'', 12c''+12) (4 pixels),
  sublane u < 12 indexes within (u>=12 zero pad for 32-sublane
  alignment). Output x = 2c''+p (p = parity).
* For output pixel (y, 2c''+p), tap (dy,dx,cin) reads flat index
  12(c''+d) + u with t = 6p+3dx+cin-9, d = t//12 in {-1,0,1}, u = t%12.
  So THREE lane-rolled copies R_d (positive pltpu.roll + iota edge mask;
  session-5 probes: negative shifts rejected, positive compile) make
  every conv row ONE K-contraction over contiguous sublanes:
      acc = sum_d A_d (128,128) @ R_d[32y : 32y+128] (128,L)
  A row m = 64p + cout packs BOTH parities -> M=128, full MXU rows.
  K = 7 rows x 16 sublanes = 112, zero-padded to 128 full lanes (the
  extra 16 columns multiply input row 2y+7 against zero weights; the
  staged height works out so the padded slice always fits); slice starts
  32y are 32-aligned (int8 native tile), so no relayout copies per dot.
* Because even/odd x live on separate SUBLANE halves of the (128, L)
  conv row, the 3x3/s2 pool needs NO stride-2 lane select (the hazard
  that killed the VGG tap-stack kernel): pool col c = max(E[c], O[c],
  O[c-1]) — one positive roll + mask — and pool rows are a clamped
  3-row max over the x-pooled scratch.

Exactness: same int32 MACs as the engine's direct conv (int32 accumulation
is order-independent), identical f32 epilogue op sequence
(acc*deq + bias -> relu -> round(y/out_scale) -> clip -> int8), and the
pool runs on int8 codes exactly like the engine's PoolOp (max commutes
with the monotone requant). Parity test:
tests/test_resnet_stem_pallas.py (interpret CPU + on-chip A/B harness
benchmarks/resnet_stem_kernel_ab.py).

The kernel also swallows the input-quantize pass: staging fuses
quantize + y-pad + (U,L) relayout into one XLA elementwise+transpose,
so the engine's separate `clip(round(images/in_scale))` over 64 MB
never materializes for this path.

STATUS (r5, v5e-1, bs=64 — chip_logs/stem_kernel_ab_v1.log,
stem_kernel_ab_v2_sweep.log, stem_kernel_ab_final.log): OFF by default.
v1 (768 small dots/img) 0.70x; v2 chunked im2col + quantize-first
staging: ISOLATED 1.31-1.41x vs the plain chain, bit-exact on-chip — but
END-TO-END a wash-to-slight-loss (SSD-512 0.977x, RetinaNet 0.995x,
ABAB x2): the in-program profile (10-iter device trace) charges the
stem pallas_call ~5.9 ms vs 1.58 ms isolated plus ~3 ms of staging
reshape/slice/convert that fuse away in isolation — the pallas_call
boundary breaks XLA's fusion of the staging chain and the producer
overlap the plain conv enjoys. The Mosaic-level line is now MEASURED:
the kernel beats XLA's direct conv on raw op cost but loses the
integration. Revisit only with a formulation that consumes the raw
uint8/f32 image directly (staging inside the kernel via DMA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_U = 16       # sublanes per input row (12 used + 4 zero pad, 32y alignment)
_KH = 7       # stem kernel height
# Contraction length per d-arm: 7 rows x 16 sublanes = 112, padded to 128
# full lanes (the extra 16 columns are zero weights multiplying input row
# 2y+7 — staged height (h+6)*16 == 32*(out_h-1)+128 exactly, so the padded
# slice always fits). Full 128-lane tiles sidestep the Mosaic sub-128-lane
# slice hazard that killed the VGG tap-stack kernel.
_K = 128
_PAD = 3      # conv padding (7x7/s2 pad 3)


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def _slot_map() -> list:
    """Static (p, dx, cin) -> (d_idx, u) mapping (see module docstring)."""
    slots = []
    for p in (0, 1):
        for dx in range(7):
            for cin in range(3):
                t = 6 * p + 3 * dx + cin - 9
                d = t // 12  # floor division: -1, 0, or 1
                u = t - 12 * d
                slots.append((p, dx, cin, d + 1, u))
    return slots


def pack_stem_weights(w_q: Array) -> Array:
    """(7,7,3,64) int8 stem kernel -> (3, 128, 128) packed A_d matrices.

    A[d_idx, 64*p + cout, 16*dy + u] = w_q[dy, dx, cin, cout] per the slot
    map; all other entries 0 (structural zeros; the three arms share one
    M=128 accumulator so the MXU sees full rows).

    jnp ops on a (7,7,3,64) tensor — negligible at trace/run time, and
    works on traced QuantParams leaves.
    """
    w_q = jnp.asarray(w_q)
    cout = w_q.shape[-1]
    assert w_q.shape == (7, 7, 3, cout) and cout == 64, w_q.shape
    p_l, dx_l, cin_l, d_l, u_l = (np.array(v) for v in zip(*_slot_map()))
    dy = np.arange(7)
    # Gather (42 slots, 7 dy, 64 cout) then scatter into A.
    vals = w_q[dy[None, :], dx_l[:, None], cin_l[:, None], :]  # (42,7,64)
    a = jnp.zeros((3, 128, _K), dtype=w_q.dtype)  # cols >= 112 stay zero
    rows = (64 * p_l[:, None, None] +
            np.broadcast_to(np.arange(64), (42, 7, 64)))
    cols = np.broadcast_to(
        (_U * dy[None, :, None] + u_l[:, None, None]), (42, 7, 64)
    )
    ds = np.broadcast_to(d_l[:, None, None], (42, 7, 64))
    return a.at[ds, rows, cols].set(vals)


# ---------------------------------------------------------------------------
# Input staging
# ---------------------------------------------------------------------------

def stage_stem_input(images: Array, in_scale: float) -> Array:
    """Normalized float images (B, H, W, 3) -> staged int8 (B, (H+6)*16, W/4).

    One fused XLA pass: quantize (exactly the engine's
    clip(round(x/in_scale))) + y-pad 3 (f32 zeros quantize to int8 0 ==
    symmetric-quant conv padding) + the (U, L) relayout. W must be a
    multiple of 4.
    """
    b, h, w, c = images.shape
    assert c == 3 and w % 4 == 0, images.shape
    # Quantize FIRST so the relayout transpose moves int8, not f32: the
    # f32-ordered version measured 2.43 ms at bs=64 (the 268 MB transpose
    # was the whole staging cost and erased the kernel's win).
    x = jnp.clip(jnp.round(images / in_scale), -127, 127).astype(jnp.int8)
    x = jnp.pad(x, ((0, 0), (_PAD, _PAD), (0, 0), (0, 0)))
    # (B, H+6, W, 3) -> flat rows (B, H+6, 3W) -> (B, H+6, L, 12)
    x = x.reshape(b, h + 2 * _PAD, w // 4, 12)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _U - 12)))
    x = jnp.transpose(x, (0, 1, 3, 2))  # (B, H+6, 16, L)
    return x.reshape(b, (h + 2 * _PAD) * _U, w // 4)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _stem_kernel(x_ref, a_ref, deq_ref, bias_ref, scale_ref, out_ref,
                 r_m1, r_p1, s_buf, b_buf, *, out_h: int, lanes: int,
                 chunk: int):
    """One image: staged input -> pooled int8 (out_h/2 * 64, lanes).

    x_ref   (1, (2*out_h+6)*16, lanes) int8 — staged rows
    a_ref   (128, 384) int8 — packed weights, K blocks d = (-1, 0, +1)
    deq_ref (128, 1) f32 — in_scale * w_scale[cout], parity-tiled
    bias_ref(128, 1) f32 — folded-BN bias, parity-tiled
    scale_ref (1, 1) f32 in SMEM — 1/out_scale as f32 (XLA strength-
              reduces divide-by-constant to multiply-by-reciprocal — HLO
              shows multiply at op_name=".../div" — so the kernel must
              multiply by the same f32 reciprocal for bit-parity; a true
              divide flips ~1e-6 of codes at rounding boundaries,
              measured 71/67M on-chip r5)
    out_ref (1, (out_h//2)*64, lanes) int8 — (pool_row, cout) x lanes
    r_m1/r_p1 scratch: lane-rolled input copies (d = -1 / +1)
    s_buf scratch (out_h*64, lanes) int8 — x-pooled conv rows
    b_buf scratch (384, chunk*lanes) int8 — im2col chunk staging

    v2 (r5): the v1 row-loop issued 768 tiny (128,128,128) dots per image
    and measured 0.70x vs plain XLA (chip_logs/stem_kernel_ab_v1.log —
    MXU issue overhead dominated). v2 stages `chunk` output rows into one
    im2col buffer (sliding-window slice copies are VPU moves) and issues
    ONE (128,384)@(384,chunk*lanes) dot per chunk — out_h/chunk dots per
    image total.
    """
    li = jax.lax.broadcasted_iota(jnp.int32, (1, chunk * lanes), 1) % lanes
    # Mosaic only implements lane rotates on 32-bit data ("Rotate with
    # non-32-bit data" — measured r5); roll an int32 widening and narrow
    # back (two VPU convert passes over ~1 MB, negligible).
    li1 = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    x32 = x_ref[0].astype(jnp.int32)
    # d=-1: lane l sources l-1 (positive roll by 1), lane 0 is x<0 pad.
    r_m1[:] = jnp.where(li1 == 0, 0, pltpu.roll(x32, 1, axis=1)).astype(jnp.int8)
    # d=+1: lane l sources l+1 (positive roll by lanes-1), last lane pad.
    r_p1[:] = jnp.where(
        li1 == lanes - 1, 0, pltpu.roll(x32, lanes - 1, axis=1)
    ).astype(jnp.int8)

    inv_s = scale_ref[0, 0]
    a_cat = a_ref[:]

    def conv_chunk(ci, _):
        y0 = ci * chunk
        # im2col: B[128*di + k, lanes*j + c] = R_d[32*(y0+j) + k, c]
        for j in range(chunk):
            row = pl.multiple_of(32 * (y0 + j), 32)
            col = j * lanes
            b_buf[0:128, pl.ds(col, lanes)] = r_m1[pl.ds(row, 128), :]
            b_buf[128:256, pl.ds(col, lanes)] = x_ref[0, pl.ds(row, 128), :]
            b_buf[256:384, pl.ds(col, lanes)] = r_p1[pl.ds(row, 128), :]
        acc = jnp.dot(a_cat, b_buf[:], preferred_element_type=jnp.int32)
        # Engine-identical epilogue: (acc*deq + bias) -> relu ->
        # round(y * (1/out_scale)) -> clip -> int8 (reciprocal multiply,
        # matching XLA's strength reduction of run_int8's divide).
        yf = acc.astype(jnp.float32) * deq_ref[:] + bias_ref[:]
        yf = jnp.maximum(yf, 0.0)
        # int32 codes here: Mosaic legalizes neither int8 lane rotates nor
        # int8 maxsi (both measured r5); narrowing happens only at the
        # s_buf store. Same values bit-for-bit.
        q = jnp.clip(jnp.round(yf * inv_s), -127, 127).astype(jnp.int32)
        e = q[0:64]
        o = q[64:128]
        # pool col c needs conv cols 2c-1 (= O[c-1]), 2c (= E[c]), 2c+1
        # (= O[c]); left edge pads with -inf == int8 min. One GLOBAL roll
        # serves every lane group: the cross-group leak lands only in
        # masked (c==0) lanes.
        o_sh = jnp.where(li == 0, -128, pltpu.roll(o, 1, axis=1))
        s3 = jnp.maximum(jnp.maximum(e, o), o_sh).astype(jnp.int8)
        for j in range(chunk):
            s_buf[pl.ds(64 * (y0 + j), 64), :] = s3[:, j * lanes:(j + 1) * lanes]
        return 0

    jax.lax.fori_loop(0, out_h // chunk, conv_chunk, 0)

    def pool_row(p_r, _):
        # rows 2p-1 (clamped: max(mid,mid,bot) == max(mid,bot), exactly
        # the -inf top pad), 2p, 2p+1.
        top = jnp.maximum(2 * p_r - 1, 0)
        t = s_buf[pl.ds(64 * top, 64), :].astype(jnp.int32)
        m = s_buf[pl.ds(64 * (2 * p_r), 64), :].astype(jnp.int32)
        b_ = s_buf[pl.ds(64 * (2 * p_r + 1), 64), :].astype(jnp.int32)
        out_ref[0, pl.ds(64 * p_r, 64), :] = jnp.maximum(
            jnp.maximum(t, m), b_
        ).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, out_h // 2, pool_row, 0)


def stem_conv_pool(
    x_staged: Array,
    a_packed: Array,
    deq: Array,
    bias: Array,
    out_scale: float,
    *,
    image_hw: int,
    chunk: int = 64,
    interpret: bool | None = None,
) -> Array:
    """Staged int8 (B, (H+6)*16, W/4) -> pooled int8 (B, H/4, W/4, 64).

    deq/bias are per-cout (64,) f32; out_scale the stem activation scale.
    Returns NHWC directly (the (cout, lane) -> (lane, cout) transpose is
    XLA's — ~0.16 ms for 2x67 MB int8 at bs=64, measured acceptable in
    the A/B).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x_staged.shape[0]
    h = w = image_hw
    lanes = w // 4
    out_h = h // 2
    assert x_staged.shape == (b, (h + 2 * _PAD) * _U, lanes), x_staged.shape

    deq2 = jnp.tile(deq.astype(jnp.float32).reshape(64), 2).reshape(128, 1)
    bias2 = jnp.tile(bias.astype(jnp.float32).reshape(64), 2).reshape(128, 1)
    # jnp (not np) so a TRACED out_scale (QuantParams under jit — the
    # serving path) works; with a concrete float XLA folds this to the
    # identical f32 reciprocal constant. Traced scales mean the engine's
    # plain arm divides while we multiply — ~1e-6 of codes may differ by
    # 1 at rounding boundaries there (bit-parity is proven on the
    # concrete-scale path: isolated A/B + tests).
    scale = jnp.reshape(
        jnp.float32(1.0) / jnp.asarray(out_scale, jnp.float32), (1, 1)
    )

    while out_h % chunk:
        chunk //= 2
    a_cat = jnp.concatenate([a_packed[0], a_packed[1], a_packed[2]], axis=1)
    kernel = functools.partial(
        _stem_kernel, out_h=out_h, lanes=lanes, chunk=chunk
    )
    flops = 2 * b * out_h * 3 * 128 * _K * lanes
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, (h + 2 * _PAD) * _U, lanes),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 3 * _K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, (out_h // 2) * 64, lanes),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, (out_h // 2) * 64, lanes),
                                       jnp.int8),
        scratch_shapes=[
            pltpu.VMEM(((h + 2 * _PAD) * _U, lanes), jnp.int8),
            pltpu.VMEM(((h + 2 * _PAD) * _U, lanes), jnp.int8),
            pltpu.VMEM((out_h * 64, lanes), jnp.int8),
            pltpu.VMEM((3 * _K, chunk * lanes), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_staged.size + b * (out_h // 2) * 64 * lanes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_staged, a_cat, deq2, bias2, scale)
    # (B, P*64, L) -> (B, P, 64, L) -> NHWC (B, P, L, 64)
    out = out.reshape(b, out_h // 2, 64, lanes)
    return jnp.transpose(out, (0, 1, 3, 2))


def resnet_stem_int8(
    images: Array,
    w_q: Array,
    w_scale: Array,
    bias: Array,
    in_scale: float,
    out_scale: float,
    chunk: int = 64,
    interpret: bool | None = None,
) -> Array:
    """Full fused path: normalized float images -> pooled int8 stem output.

    Drop-in for the engine's [quantize-input, ConvOp(stem 7x7/s2/pad3),
    PoolOp(3,2,explicit_pad=1)] prefix (bit-exactness test-enforced).
    """
    b, h, w, _ = images.shape
    assert h == w, "square inputs only (SSD-512 / RetinaNet presets)"
    x_staged = stage_stem_input(images, in_scale)
    a = pack_stem_weights(w_q)
    deq = in_scale * jnp.asarray(w_scale, jnp.float32)
    return stem_conv_pool(
        x_staged, a, deq, jnp.asarray(bias, jnp.float32), out_scale,
        image_hw=h, chunk=chunk, interpret=interpret,
    )
