"""Per-layer int8 conv cost map for any preset (VERDICT r2 items #4/#5).

The XLA op-level trace merges every conv_general_dilated into one row;
this walks the quant spec, dedupes conv signatures (input shape, kernel,
stride, dilation), and times each unique signature standalone WITH its
fused dequant+bias+relu+requant epilogue — the real unit of work in
run_int8. Prints ms and effective TOP/s per signature, scaled by count,
so the laggard layers (MXU underfill, strided relayouts) are named.

    python benchmarks/conv_layer_profile.py ssd512_resnet50_coco 64
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.headline import _setup  # noqa: E402
from benchmarks.timing import timed  # noqa: E402
from object_detector_tpu.ops import augment as aug_ops  # noqa: E402
from object_detector_tpu.quant import engine as qengine  # noqa: E402
from object_detector_tpu.quant.engine import (  # noqa: E402
    ConvOp, FusedStemOp, LoadOp, PadToEvenOp, PoolOp, SaveOp, TapOp, _conv,
    _pool,
)


def conv_sig(x, w, op: ConvOp):
    return (x.shape, w.shape, op.stride, op.dilation, str(op.padding))


def timed_conv(x, w, op: ConvOp, iters=20):
    deq = jnp.ones((w.shape[-1],), jnp.float32) * 0.01
    bias = jnp.zeros((w.shape[-1],), jnp.float32)

    @jax.jit
    def f(x, w):
        acc = _conv(x, w, op, jnp.int32)
        y = acc.astype(jnp.float32) * deq + bias
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y / 0.05), -127, 127).astype(jnp.int8)

    return timed(f, x, w, iters=iters)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd512_resnet50_coco"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg, model, variables, anchors, images = _setup(preset, bs)
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_ssd(
        cfg, variables["params"], [calib],
        batch_stats=variables.get("batch_stats"),
    )

    rng = np.random.default_rng(0)
    s = cfg.model.image_size
    x = jnp.asarray(rng.integers(-127, 128, (bs, s, s, 3), dtype=np.int8))
    regs = {}
    taps = []
    plan = []  # (path, sig, x_shape, w_shape, macs)
    for op in spec:
        if isinstance(op, ConvOp):
            w = jnp.asarray(qp.w_int8[op.path])
            y = _conv(x, w, op, jnp.int32)
            macs = int(np.prod(y.shape)) * w.shape[0] * w.shape[1] * w.shape[2]
            plan.append((op.path, conv_sig(x, w, op), op, macs))
            x = jnp.clip(y, -127, 127).astype(jnp.int8)
        elif isinstance(op, SaveOp):
            regs[op.name] = x
        elif isinstance(op, LoadOp):
            x = regs[op.name]
        elif isinstance(op, PoolOp):
            x = _pool(x, op)
        elif isinstance(op, PadToEvenOp):
            pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        elif isinstance(op, TapOp):
            taps.append(x)
        elif isinstance(op, FusedStemOp):
            raise SystemExit("run with the unfused spec (vgg only)")
    # Heads on each tap.
    for level, (tap, a) in enumerate(zip(taps, cfg.anchors.anchors_per_level)):
        for kind in ("cls", "box"):
            path = f"head{level}/{kind}"
            w = jnp.asarray(qp.w_int8[path])
            op = ConvOp(path, relu=False)
            y = _conv(tap, w, op, jnp.int32)
            macs = int(np.prod(y.shape)) * w.shape[0] * w.shape[1] * w.shape[2]
            plan.append((path, conv_sig(tap, w, op), op, macs))

    # Dedupe by signature; keep exemplar + count + paths.
    uniq = {}
    for path, sig, op, macs in plan:
        d = uniq.setdefault(sig, {"op": op, "macs": macs, "count": 0, "paths": []})
        d["count"] += 1
        d["paths"].append(path.split("/")[-1] if "head" not in path else path)

    total_ms = 0.0
    total_macs = 0
    rows = []
    for sig, d in uniq.items():
        xs, ws = sig[0], sig[1]
        xx = jnp.asarray(rng.integers(-127, 128, xs, dtype=np.int8))
        ww = jnp.asarray(rng.integers(-127, 128, ws, dtype=np.int8))
        dt = timed_conv(xx, ww, d["op"], iters=15)
        tops = 2 * d["macs"] / dt / 1e12
        rows.append((dt * d["count"], dt, tops, sig, d))
        total_ms += dt * d["count"] * 1e3
        total_macs += d["macs"] * d["count"]
    rows.sort(reverse=True, key=lambda r: r[0])
    print(f"{preset} bs={bs}: {len(plan)} convs, {len(uniq)} unique signatures")
    print(f"{'tot ms':>7} {'each ms':>8} {'TOP/s':>6}  n  shape x kernel /s d  exemplar")
    for tot, dt, tops, sig, d in rows:
        xs, ws, st, dil, _pad = sig
        print(
            f"{tot*1e3:7.2f} {dt*1e3:8.3f} {tops:6.1f} {d['count']:2d}  "
            f"{'x'.join(map(str, xs))} * {'x'.join(map(str, ws))} /{st} d{dil}  "
            f"{d['paths'][0]}"
        )
    print(
        f"TOTAL {total_ms:.2f} ms  {2*total_macs/(total_ms/1e3)/1e12:.1f} TOP/s "
        f"({total_macs/1e9/bs:.2f} GMAC/img)"
    )


if __name__ == "__main__":
    main()
