"""Per-signature conv A/B for the ResNet-50/SSD-512 trunk laggards.

The r3 in-program HLO profile (chip_logs/hlo_ssd512.log) shows the conv
total at ~23 ms/iter vs the 13.8 ms int8 roofline floor; the isolated
cost map names stage-2 (128x128 spatial, 64-ch) convs and the 7x7/2
Cin=3 stem as the laggards. This bench measures each laggard signature
in isolation under several rewrites to find which mechanism is at
fault (int8 emitter vs lane underfill vs K underfill):

  i8     — int8 conv, int32 accumulate (the production path)
  bf16   — same conv in bf16 (is the int8 emitter the problem?)
  i8pack — 2 images channel-packed, block-diag weights (lane-underfill
           test: B/2, Cin/Cout doubled; only for C<=64 signatures)
  i8s2d  — space-to-depth rewrite (stem only: 7x7/2 on 512x512x3 ->
           4x4 on 256x256x12)

Relative numbers within one signature share dispatch overhead, so the
ratios are trustworthy even though absolute isolated times inflate
small ops (see profile_int8.py docstring).

Usage: python benchmarks/resnet_conv_ab.py [iters]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed

# (name, input NHWC, kernel HWIO, stride)
SIGS = [
    ("stem7x7s2", (64, 512, 512, 3), (7, 7, 3, 64), 2),
    ("s2.c1_64", (64, 128, 128, 64), (1, 1, 64, 64), 1),
    ("s2.c1_256", (64, 128, 128, 256), (1, 1, 256, 64), 1),
    ("s2.c2_3x3", (64, 128, 128, 64), (3, 3, 64, 64), 1),
    ("s2.c3", (64, 128, 128, 64), (1, 1, 64, 256), 1),
    ("s2.proj", (64, 128, 128, 256), (1, 1, 256, 512), 2),
    ("s3.c2_3x3", (64, 64, 64, 128), (3, 3, 128, 128), 1),
    ("s3.c1", (64, 64, 64, 512), (1, 1, 512, 128), 1),
    ("s3.c3", (64, 64, 64, 128), (1, 1, 128, 512), 1),
    # controls: does widening N to 128 lanes change the per-MAC rate?
    ("ctl.n128", (64, 128, 128, 64), (3, 3, 64, 128), 1),
    ("ctl.k128", (64, 128, 128, 128), (3, 3, 128, 128), 1),
]


def conv_fn(stride, preferred):
    def f(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=preferred,
        )
    return f


def block_diag_pack(w):
    """(kh,kw,ci,co) -> (kh,kw,2ci,2co) block diagonal."""
    kh, kw, ci, co = w.shape
    z = np.zeros((kh, kw, ci, co), w.dtype)
    top = np.concatenate([np.asarray(w), z], axis=3)
    bot = np.concatenate([z, np.asarray(w)], axis=3)
    return jnp.asarray(np.concatenate([top, bot], axis=2))


def pack_stem_pairw(w, row_pack=False):
    """(7,7,3,64) -> pair-width packed (7,4,6,64), or with row_pack also
    fold output-row parity into channels: (9,4,6,128), stride (4,1).

    Pair-width: input viewed (B,512,256,6) (free reshape); output col j
    reads col 2j-2+kx -> pair j-1+kp parity q with kx = 2*kp + q.
    Row-pack: output channel m*64+o holds conv row 2R+m; kernel row ky
    maps to W[ky-2m] (input rows 4R-2..4R+6)."""
    kh, kw, ci, co = w.shape
    w = np.asarray(w)
    if not row_pack:
        out = np.zeros((7, 4, 2 * ci, co), w.dtype)
        for kp in range(4):
            for q in range(2):
                kx = 2 * kp + q
                if kx < 7:
                    out[:, kp, q * ci : (q + 1) * ci, :] = w[:, kx]
        return out
    out = np.zeros((9, 4, 2 * ci, 2 * co), w.dtype)
    for m in range(2):
        for ky in range(9):
            if 0 <= ky - 2 * m < 7:
                for kp in range(4):
                    for q in range(2):
                        kx = 2 * kp + q
                        if kx < 7:
                            out[ky, kp, q * ci : (q + 1) * ci,
                                m * co : (m + 1) * co] = w[ky - 2 * m, kx]
    return out


def stem_packed_variants(x8, w8, b):
    """Packed-producer formulations of the 7x7/2 stem (all exact rewrites
    modulo zero taps; only cost is measured here, not parity)."""
    out = {}
    xp = jnp.asarray(np.asarray(x8).reshape(b, 512, 256, 6))
    wp = jnp.asarray(pack_stem_pairw(w8))

    def conv_pairw(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (2, 1), [(2, 3), (1, 2)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    out["i8pairW"] = (conv_pairw, xp, wp)

    wr = jnp.asarray(pack_stem_pairw(w8, row_pack=True))

    def conv_rowpack(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (4, 1), [(2, 5), (1, 2)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    out["i8rowpk"] = (conv_rowpack, xp, wr)

    # image-pair channel packing on top of pair-width.
    x2 = jnp.concatenate([xp[: b // 2], xp[b // 2:]], axis=-1)
    w2 = jnp.asarray(np.asarray(block_diag_pack(jnp.asarray(
        pack_stem_pairw(w8)))))
    out["i8pW2im"] = (conv_pairw, x2, w2)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    print(f"{'sig':12s} {'variant':8s} {'ms':>8s} {'TOP/s':>7s}")
    for name, xshape, wshape, stride in SIGS:
        b, h, w_, ci = xshape
        kh, kw, _, co = wshape
        macs = b * (h // stride) * (w_ // stride) * kh * kw * ci * co
        flops = 2 * macs
        x8 = jnp.asarray(rng.integers(-127, 127, xshape, dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, wshape, dtype=np.int8))
        variants = {
            "i8": (conv_fn(stride, jnp.int32), x8, w8),
            "bf16": (
                conv_fn(stride, jnp.float32),
                x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
            ),
        }
        if (ci <= 64 or co <= 64) and b % 2 == 0:
            xp = jnp.concatenate([x8[: b // 2], x8[b // 2:]], axis=-1)
            variants["i8pack"] = (
                conv_fn(stride, jnp.int32), xp, block_diag_pack(w8)
            )
        if name == "stem7x7s2":
            variants.update(stem_packed_variants(x8, w8, b))
            # exact-cost s2d form: pad 7x7 taps to 8x8, fold 2x2 blocks.
            xs = np.asarray(x8)
            xs = xs.reshape(b, h // 2, 2, w_ // 2, 2, ci).transpose(
                0, 1, 3, 2, 4, 5
            ).reshape(b, h // 2, w_ // 2, 4 * ci)
            w_pad = np.zeros((8, 8, ci, co), np.int8)
            w_pad[:7, :7] = np.asarray(w8)
            ws = w_pad.reshape(4, 2, 4, 2, ci, co).transpose(
                0, 2, 1, 3, 4, 5
            ).reshape(4, 4, 4 * ci, co)
            variants["i8s2d"] = (
                conv_fn(1, jnp.int32), jnp.asarray(xs), jnp.asarray(ws)
            )
        for vname, (f, xa, wa) in variants.items():
            jf = jax.jit(f)
            try:
                dt = timed(jf, xa, wa, iters=iters)
                print(
                    f"{name:12s} {vname:8s} {dt*1e3:8.3f} {flops/dt/1e12:7.1f}",
                    flush=True,
                )
            except Exception as e:
                print(f"{name:12s} {vname:8s} FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
