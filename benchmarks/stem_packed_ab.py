"""Isolated A/B: ResNet stem (7x7/s2 int8 conv + requant + 3x3/s2 maxpool).

Arms:
  direct   — lax.conv 7x7/s2 pad3 (what stem_algo="direct" emits) + int8 pool
  pack2    — image-pair packing (current SSD-512 default, img_pack=True)
  colpack  — NEW: column-pair-packed conv. The 512^2 input is viewed as
             (B, 256, 128, 24) via 2x4 space-to-depth; the stem becomes a
             stride-1 conv with kernel (4, 3, 24, 128) where output channel
             n*64+o holds conv column 2j+n (full 128 MXU lanes, K=288 vs
             the direct form's 147-with-underfill). The 3x3/s2 maxpool on
             this layout is two lane-half maxes + an H slice-max and lands
             DIRECTLY in standard NHWC (B,128,128,64) — no unpack seam.

Exactness: same int8 products accumulated in int32 (structural zeros add
nothing), same f32 epilogue -> bit-exact int8 output. Verified on-device
before timing.

Cost: colpack does 4*3*24=288 MACs/output vs 147 useful (1.96x), but at
full lane occupancy; the direct emitter measures ~10x off roofline.

STATUS (r4, v5e-1, bs=64): ALL packed XLA formulations are MEASURED DEAD
ENDS (chip_logs/stem_packed_ab.log, all arms bit-exact):
  direct 4.34 ms | pack2 4.86 | colpack 7.97 | quadcol 7.89 | paircol 6.71
Including the two RESHAPE-ONLY variants (quadcol: (B,512,128,12) view +
(7,3,12,128)/s(2,1); paircol: (B,512,256,6) view + (7,5,6,128)/s(2,2))
— so the loss is not the s2d transpose; XLA's int8 conv emitter handles
the packed-Cout forms worse than its native small-Cin path. Matches the
r3 VGG findings (im2col 2.4x slower, s2d 0.93x, lane-pad tap stack
0.57x): beating the direct emitter on the 7x7/s2 stem requires a
Mosaic-level kernel, and the lane-tiling constraints that killed the VGG
tap-stack (no slices of sub-128-lane tiled memrefs) apply identically.
Left as the priced r5 lever in TPU_WORK_QUEUE.md.
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

B, H, W, CIN, COUT = 64, 512, 512, 3, 64


def pack_colpair_weights(w: np.ndarray) -> np.ndarray:
    """(7,7,3,64) -> (4,3,24,128): Wp[kh,kw,py*12+qx*3+i, n*64+o] =
    W[2(kh-2)+py+3, 4(kw-1)+qx-2n+3, i, o] (zero outside 0<=dy,dx<7)."""
    kh_, kw_, cin, cout = w.shape
    assert (kh_, kw_) == (7, 7)
    out = np.zeros((4, 3, 8 * cin, 2 * cout), w.dtype)
    for kh in range(4):
        for py in range(2):
            dy = 2 * (kh - 2) + py + 3
            if not 0 <= dy < 7:
                continue
            for kw in range(3):
                for qx in range(4):
                    for n in range(2):
                        dx = 4 * (kw - 1) + qx - 2 * n + 3
                        if not 0 <= dx < 7:
                            continue
                        out[kh, kw, py * 12 + qx * 3:py * 12 + qx * 3 + cin,
                            n * cout:(n + 1) * cout] = w[dy, dx]
    return out


def pack_quadcol_weights(w: np.ndarray) -> np.ndarray:
    """(7,7,3,64) -> (7,3,12,128) for the RESHAPE-ONLY quad-column view
    (B,512,128,12): out col 2j+n <- input col 4j+2n+dx-3 = quad j+kw-1,
    qx=(2n+dx-3)%4. H stays a direct stride-2 conv dim (pad 3)."""
    _, _, cin, cout = w.shape
    out = np.zeros((7, 3, 4 * cin, 2 * cout), w.dtype)
    for dx in range(7):
        for n in range(2):
            t = 2 * n + dx - 3
            qx = t % 4
            kw = (t - qx) // 4 + 1
            out[:, kw, qx * cin:(qx + 1) * cin, n * cout:(n + 1) * cout] = \
                w[:, dx]
    return out


def pack_paircol_weights(w: np.ndarray) -> np.ndarray:
    """(7,7,3,64) -> (7,5,6,128) for the pair-column view (B,512,256,6),
    conv stride (2,2) pad ((3,3),(2,2)): out col 2j+n <- input col
    2(2j+kw-2)+m = 4j+2kw+m-4, so dx = 2kw+m-2n-1."""
    _, _, cin, cout = w.shape
    out = np.zeros((7, 5, 2 * cin, 2 * cout), w.dtype)
    for kw in range(5):
        for m in range(2):
            for n in range(2):
                dx = 2 * kw + m - 2 * n - 1
                if 0 <= dx < 7:
                    out[:, kw, m * cin:(m + 1) * cin,
                        n * cout:(n + 1) * cout] = w[:, dx]
    return out


def s2d_view(x):
    """(B,512,512,3) int8 -> (B,256,128,24): ch = py*12 + qx*3 + i."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 4, 4, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 4, 2 * 4 * c)


def epilogue(acc, deq, bias, out_scale):
    y = acc.astype(jnp.float32) * deq + bias
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)


def pool_direct(y):
    """3x3/s2 pad1 maxpool on int8 NHWC (values >= 0 so 0-pad == -inf-pad)."""
    return jax.lax.reduce_window(
        y, jnp.int8(0), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 0), (1, 0), (0, 0)))


def pool_colpack(y):
    """maxpool on the col-packed (B,256,128,128) layout -> (B,128,128,64).
    Pool col pc = max(conv cols 2pc-1, 2pc, 2pc+1) = max(m1 shifted from
    j-1, m0[j], m1[j]); pool row pr = max(conv rows 2pr-1, 2pr, 2pr+1)."""
    m0, m1 = y[..., :64], y[..., 64:]
    m1s = jnp.pad(m1, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
    wm = jnp.maximum(jnp.maximum(m0, m1), m1s)  # (B,256,128,64)
    a = wm[:, 0::2]                              # rows 2pr
    b = wm[:, 1::2]                              # rows 2pr+1
    c = jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]  # rows 2pr-1
    return jnp.maximum(jnp.maximum(a, b), c)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (B, H, W, CIN), dtype=np.int8))
    w = rng.integers(-127, 128, (7, 7, CIN, COUT)).astype(np.int8)
    deq = jnp.asarray(rng.uniform(1e-4, 2e-4, (COUT,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (COUT,)).astype(np.float32))
    out_scale = 0.05
    wq = jnp.asarray(w)
    wp = jnp.asarray(pack_colpair_weights(w))
    deq2 = jnp.concatenate([deq, deq])
    bias2 = jnp.concatenate([bias, bias])

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def f_direct(x):
        acc = jax.lax.conv_general_dilated(
            x, wq, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return pool_direct(epilogue(acc, deq, bias, out_scale))

    @jax.jit
    def f_pack2(x):
        # image-pair packing: (B,H,W,3)->(B/2,H,W,6), block-diag weights
        half = x.shape[0] // 2
        xp = jnp.concatenate([x[:half], x[half:]], axis=-1)
        wz = jnp.zeros_like(wq)
        wbd = jnp.concatenate([
            jnp.concatenate([wq, wz], axis=-1),
            jnp.concatenate([wz, wq], axis=-1)], axis=-2)
        acc = jax.lax.conv_general_dilated(
            xp, wbd, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = pool_direct(epilogue(acc, deq2, bias2, out_scale))
        return jnp.concatenate([y[..., :64], y[..., 64:]], axis=0)

    @jax.jit
    def f_colpack(x):
        xs = s2d_view(x)
        acc = jax.lax.conv_general_dilated(
            xs, wp, (1, 1), ((2, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return pool_colpack(epilogue(acc, deq2, bias2, out_scale))

    wq4 = jnp.asarray(pack_quadcol_weights(w))
    wq2p = jnp.asarray(pack_paircol_weights(w))

    @jax.jit
    def f_quadcol(x):
        xs = x.reshape(B, H, W // 4, 4 * CIN)
        acc = jax.lax.conv_general_dilated(
            xs, wq4, (2, 1), ((3, 3), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return pool_colpack(epilogue(acc, deq2, bias2, out_scale))

    @jax.jit
    def f_paircol(x):
        xs = x.reshape(B, H, W // 2, 2 * CIN)
        acc = jax.lax.conv_general_dilated(
            xs, wq2p, (2, 2), ((3, 3), (2, 2)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return pool_colpack(epilogue(acc, deq2, bias2, out_scale))

    arms = (("direct", f_direct), ("pack2", f_pack2), ("colpack", f_colpack),
            ("quadcol", f_quadcol), ("paircol", f_paircol))
    y0 = np.asarray(f_direct(x))
    for name, f in arms[1:]:
        y = np.asarray(f(x))
        ok = np.array_equal(y0, y)
        print(f"parity {name:8s}:", "EXACT" if ok else
              f"MISMATCH max={np.abs(y0.astype(int)-y).max()}")

    for name, f in arms:
        dt = timed(f, x, iters=30)
        print(f"{name:8s}: {dt*1e3:7.3f} ms   {B/dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
