"""Bandwidth-corrected throughput ceilings (VERDICT r4 next #6).

The FLOP-only ceilings in ARCHITECTURE.md (SSD-512 4650, RetinaNet 2700
img/s at 325 TOP/s) overstate what is reachable: many ops in these nets
are HBM-bound at int8 (e.g. SSD-512 stage-1 1x1 convs move ~335 MB for
0.05 ms of MXU work — TPU_WORK_QUEUE.md). This model walks the EXACT op
list the int8 engine executes (same spec builders), tracks shapes, and
floors each op at

    t_op = max(MACs / MXU_RATE, bytes / HBM_BW)

with bytes = int8 activation in + out + int8 weights (each tensor
touching HBM exactly once — i.e. every elementwise epilogue perfectly
fused, which XLA achieves for the requant chains). Pools and the head
convs are included; postprocess/NMS is charged at its measured floor.
This is still optimistic (no dispatch gaps, no partial-tile waste), so
it is a CEILING — but unlike the FLOP table it cannot be beaten by
"overhead removal" claims that ignore traffic.

CPU-only (no chip): shapes and arithmetic, no jax execution.

    python benchmarks/ceiling_model.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Hardware constants (v5e-1)
MXU_INT8 = 325e12    # MAC*2/s measured sustained fused-conv rate (ARCH.md)
MXU_PEAK = 394e12    # datasheet
HBM_BW = 819e9       # bytes/s

# Measured non-conv floors (chip logs): Pallas NMS + prefilter sorts.
POSTPROCESS_MS = {"ssd300": 2.0, "ssd512": 2.5, "retinanet": 2.5}


def conv_cost(h, w, cin, cout, k, stride, pad, batch, dil=1):
    """Returns (out_h, out_w, macs, bytes) for one int8 conv at `batch`."""
    eff_k = k + (k - 1) * (dil - 1)
    if pad == "SAME":
        out_h = -(-h // stride)
        out_w = -(-w // stride)
    elif pad == "VALID":
        out_h = (h - eff_k) // stride + 1
        out_w = (w - eff_k) // stride + 1
    else:
        p = int(pad)
        out_h = (h + 2 * p - eff_k) // stride + 1
        out_w = (w + 2 * p - eff_k) // stride + 1
    macs = batch * out_h * out_w * cout * k * k * cin
    bytes_ = batch * (h * w * cin + out_h * out_w * cout) + k * k * cin * cout
    return out_h, out_w, macs, bytes_


def walk_family(family: str, batch: int):
    """Yields (name, macs, bytes) for every op of the int8 trunk+heads."""
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.quant import engine as E

    preset = {
        "ssd300": "ssd300_infer_bs64",
        "ssd512": "ssd512_resnet50_coco",
        "retinanet": "retinanet_fpn_coco",
    }[family]
    cfg = get_config(preset)
    s = cfg.model.image_size
    if family == "retinanet":
        spec = E.build_resnet_trunk_spec()
    else:
        spec = E._expand_spec(E.build_spec(cfg, fused_stem=False))

    params_dims = {}  # path -> (cin, cout, k) discovered from op walk
    h = w = s
    c = 3
    ops = []
    regs = {}
    # input quantize: f32 read + int8 write
    ops.append(("input_quantize", 0, batch * s * s * 3 * (4 + 1)))
    taps = []
    for op in E._expand_spec(spec):
        if isinstance(op, E.ConvOp):
            k = op.kernel
            # engine convs: cout from the known model structure
            cout = _cout_for(op.path, c)
            oh, ow, macs, by = conv_cost(
                h, w, c, cout, k, op.stride, op.padding, batch, op.dilation
            )
            if op.add_register:
                by += batch * oh * ow * cout  # residual re-read
            ops.append((op.path, macs, by))
            h, w, c = oh, ow, cout
        elif isinstance(op, E.PoolOp):
            p = op.explicit_pad
            if p is not None:
                oh = (h + 2 * p - op.size) // op.stride + 1
                ow = (w + 2 * p - op.size) // op.stride + 1
            elif op.pad_same:
                oh, ow = -(-h // op.stride), -(-w // op.stride)
            else:
                oh, ow = (h - op.size) // op.stride + 1, (w - op.size) // op.stride + 1
            ops.append((f"pool@{h}", 0, batch * c * (h * w + oh * ow)))
            h, w = oh, ow
        elif isinstance(op, E.SaveOp):
            regs[op.name] = (h, w, c)
        elif isinstance(op, E.LoadOp):
            h, w, c = regs[op.name]
        elif isinstance(op, E.PadToEvenOp):
            h, w = h + h % 2, w + w % 2
        elif isinstance(op, E.TapOp):
            taps.append((h, w, c))
    # Heads
    if family == "retinanet":
        # FPN laterals/smooths/p6/p7 + 4-deep shared heads at every level
        fpn_c = cfg.model.fpn_channels
        lvls = []
        for (th, tw, tc) in taps:
            _, _, m, b = conv_cost(th, tw, tc, fpn_c, 1, 1, "SAME", batch)
            ops.append((f"fpn_lateral@{th}", m, b))
            lvls.append((th, tw))
        for (th, tw) in lvls:
            _, _, m, b = conv_cost(th, tw, fpn_c, fpn_c, 3, 1, "SAME", batch)
            ops.append((f"fpn_smooth@{th}", m, b))
        th, tw, tc = taps[-1]
        for name in ("p6", "p7"):
            th, tw, m_, b_ = conv_cost(th, tw, tc if name == "p6" else fpn_c,
                                       fpn_c, 3, 2, "SAME", batch)[0:2] + \
                conv_cost(th, tw, tc if name == "p6" else fpn_c,
                          fpn_c, 3, 2, "SAME", batch)[2:4]
            ops.append((f"fpn_{name}", m_, b_))
            lvls.append((th, tw))
        n_anchor = 9
        for (th, tw) in lvls:
            for head, n_out in (("cls", cfg.model.num_classes), ("box", 4)):
                x_c = fpn_c
                for i in range(cfg.model.head_depth):
                    _, _, m, b = conv_cost(th, tw, x_c, fpn_c, 3, 1, "SAME", batch)
                    ops.append((f"{head}{i}@{th}", m, b))
                _, _, m, b = conv_cost(th, tw, fpn_c, n_anchor * n_out, 3, 1,
                                       "SAME", batch)
                ops.append((f"{head}_out@{th}", m, b))
    else:
        for lvl, (th, tw, tc) in enumerate(taps):
            a = cfg.anchors.anchors_per_level[lvl]
            for kind, n_out in (("cls", cfg.model.num_classes + 1), ("box", 4)):
                _, _, m, b = conv_cost(th, tw, tc, a * n_out, 3, 1, "SAME", batch)
                ops.append((f"head{lvl}/{kind}", m, b))
    return ops


_VGG = {
    "conv1_1": 64, "conv1_2": 64, "conv2_1": 128, "conv2_2": 128,
    "conv3_1": 256, "conv3_2": 256, "conv3_3": 256,
    "conv4_1": 512, "conv4_2": 512, "conv4_3": 512,
    "conv5_1": 512, "conv5_2": 512, "conv5_3": 512,
    "fc6": 1024, "fc7": 1024,
}


def _cout_for(path: str, cin: int) -> int:
    name = path.split("/")[-1]
    if name in _VGG:
        return _VGG[name]
    if name == "stem_conv":
        return 64
    if path.startswith("backbone/stage"):
        stage = int(path.split("stage")[1][0])
        width = (64, 128, 256, 512)[stage - 1]
        if name in ("conv3", "proj"):
            return width * 4
        if name == "conv1":
            return width
        return width  # conv2
    if name.endswith("_1"):  # extras 1x1
        return {"8": 256, "9": 128, "10": 128, "11": 128, "12": 128}.get(
            name[4:-2], 128
        )
    if name.endswith("_2"):  # extras 3x3
        return {"8": 512, "9": 256, "10": 256, "11": 256, "12": 256}.get(
            name[4:-2], 256
        )
    raise KeyError(path)


def report(family: str, batch: int):
    ops = walk_family(family, batch)
    t_mxu = t_bw = t_floor = 0.0
    macs_tot = bytes_tot = 0
    bw_bound = []
    for name, macs, by in ops:
        tm = 2 * macs / MXU_INT8
        tb = by / HBM_BW
        t_mxu += tm
        t_bw += tb
        t_floor += max(tm, tb)
        macs_tot += macs
        bytes_tot += by
        if tb > tm and tb > 20e-6:
            bw_bound.append((name, tb * 1e3, tm * 1e3))
    post = POSTPROCESS_MS[family] * 1e-3
    total = t_floor + post
    print(f"\n== {family} bs={batch} ==")
    print(f"  MACs {macs_tot/1e9:.2f} G   bytes {bytes_tot/1e6:.0f} MB")
    print(f"  sum MXU time          {t_mxu*1e3:7.2f} ms")
    print(f"  sum HBM time          {t_bw*1e3:7.2f} ms")
    print(f"  per-op max(MXU,HBM)   {t_floor*1e3:7.2f} ms")
    print(f"  + postprocess floor   {post*1e3:7.2f} ms (measured)")
    print(f"  ceiling               {batch/total:7.0f} img/s/chip "
          f"(FLOP-only would claim {batch/(t_mxu+post):.0f})")
    print(f"  top HBM-bound ops (bw_ms > mxu_ms):")
    for name, tb, tm in sorted(bw_bound, key=lambda r: -r[1])[:8]:
        print(f"    {name:28s} bw {tb:6.3f} ms  mxu {tm:6.3f} ms")
    return batch / total


if __name__ == "__main__":
    report("ssd300", 64)
    report("ssd512", 64)
    report("retinanet", 64)
