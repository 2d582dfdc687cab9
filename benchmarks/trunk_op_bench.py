"""Per-op cost map of the int8 SSD trunk (perf triage for the MXU-
utilization work).

Times every ConvOp/PoolOp of the quantized trunk IN ISOLATION with its
true input shape (int8 in -> int32 conv -> fused f32 epilogue -> int8
requant out, same as engine.run_int8). Isolated timings ignore
cross-op fusion, so treat them as an attribution map, not a sum: the
full-trunk number printed at the end is the ground truth.

Usage: python benchmarks/trunk_op_bench.py [preset] [batch_size]
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
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.quant import engine


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ssd300_infer_bs64"
    cfg = get_config(preset)
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else cfg.eval.batch_size
    s = cfg.model.image_size
    model = SSDModel(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    params = variables["params"]
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images_u8[:8].astype(jnp.float32) / 255.0)
    qp, spec = engine.quantize_ssd(
        cfg, params, [calib], batch_stats=variables.get("batch_stats")
    )
    qp = jax.device_put(qp)

    # Walk the spec tracking shapes/registers exactly like run_int8.
    x_shape = (bs, s, s, 3)
    regs = {}
    rows = []
    n_iters = 20
    for op in spec:
        if isinstance(op, engine.ConvOp):
            w = qp.w_int8[op.path]
            xin = jnp.asarray(
                rng.integers(-127, 127, x_shape, dtype=np.int8)
            )
            args = [xin]
            if op.add_register is not None:
                args.append(
                    jnp.asarray(
                        rng.integers(-127, 127, regs[op.add_register], dtype=np.int8)
                    )
                )

            def one(xq, *rest, _op=op):
                acc = engine._conv(xq, jnp.asarray(qp.w_int8[_op.path]), _op, jnp.int32)
                deq = 0.01 * jnp.asarray(qp.w_scale[_op.path])
                y = acc.astype(jnp.float32) * deq + jnp.asarray(qp.bias[_op.path])
                if rest:
                    y = y + rest[0].astype(jnp.float32) * 0.01
                if _op.relu:
                    y = jnp.maximum(y, 0.0)
                return jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)

            fn = jax.jit(one)
            out = jax.eval_shape(fn, *args)
            dt = timed(fn, *args, iters=n_iters)
            kh, kw, cin, cout = w.shape
            macs = (
                np.prod(out.shape[:3]) * kh * kw * cin * cout
            )
            rows.append(
                (op.path, x_shape, out.shape, dt * 1e3, 2 * macs / dt / 1e12)
            )
            x_shape = out.shape
        elif isinstance(op, engine.SaveOp):
            regs[op.name] = x_shape
        elif isinstance(op, engine.LoadOp):
            x_shape = regs[op.name]
        elif isinstance(op, engine.PoolOp):
            xin = jnp.asarray(rng.integers(-127, 127, x_shape, dtype=np.int8))
            fn = jax.jit(lambda v, _op=op: engine._pool(v, _op))
            out = jax.eval_shape(fn, xin)
            dt = timed(fn, xin, iters=n_iters)
            rows.append((f"pool{op.size}s{op.stride}", x_shape, out.shape, dt * 1e3, 0.0))
            x_shape = out.shape
        elif isinstance(op, engine.PadToEvenOp):
            if x_shape[1] % 2 == 1:
                x_shape = (x_shape[0], x_shape[1] + 1, x_shape[2] + 1, x_shape[3])

    total = sum(r[3] for r in rows)
    print(f"{'op':26s} {'in':>20s} {'out':>20s} {'ms':>8s} {'%':>6s} {'TOP/s':>7s}")
    for path, xin, xout, ms, tops in rows:
        print(
            f"{path:26s} {str(tuple(xin)):>20s} {str(tuple(xout)):>20s} "
            f"{ms:8.3f} {100*ms/total:5.1f}% {tops:7.1f}"
        )
    print(f"{'SUM (isolated, no fusion)':68s} {total:8.3f}")

    trunk = jax.jit(
        lambda q, im: [t[0] for t in engine.run_int8(q, spec, im, dequantize_taps=False)]
    )
    img = aug_ops.normalize(images_u8.astype(jnp.float32) / 255.0)
    dt = timed(trunk, qp, img, iters=n_iters)
    print(f"{'FULL trunk (fused)':68s} {dt*1e3:8.3f}")


if __name__ == "__main__":
    main()
