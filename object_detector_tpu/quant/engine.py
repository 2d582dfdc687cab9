"""Int8 post-training-quantization inference engine for the SSD family.

Why: v5e doubles MXU throughput for int8 (measured on this chip:
bf16 conv 193 TOP/s, int8+fused-requant 325 TOP/s — benchmarks/
int8_conv_bench.py), and SSD-300 bs=64 inference is MXU-bound. PTQ with
per-output-channel weight scales and per-tensor activation scales is the
standard production recipe (typical SSD mAP cost < 0.3).

Design: the conv trunk (backbone + extra layers) is described once as an
op list generated from the DetectorConfig (`build_ssd_spec`) and executed
by two interpreters sharing that single source of truth:

  - `run_float`    — reference float path; also records per-stage
                     activation absmax for calibration.
  - `run_int8`     — int8 path: int8 conv -> int32 accum -> fused
                     dequant+bias+relu+requant epilogue (XLA fuses this
                     into the conv). Max pools run directly on int8
                     (order-preserving).

Prediction heads and L2Norm stay in the float compute dtype (a few % of
FLOPs; keeps logits/box regressions full quality). Weights quantize
per-output-channel; activations per-tensor from calibration batches.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.core.config import DetectorConfig

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ConvOp:
    path: str  # param path, e.g. "backbone/conv1_1"
    kernel: int = 3
    stride: int = 1
    padding: Any = "SAME"  # "SAME" | "VALID" | int (explicit symmetric)
    dilation: int = 1
    relu: bool = True
    # Residual support (ResNet): add the named register into the conv
    # epilogue before the (optional) relu. The register holds the SAVED
    # activation from a SaveOp.
    add_register: Optional[str] = None
    # "direct": lax.conv. "im2col": shifted-copy patches + matmul —
    # measured 2.3x faster for tiny-Cin first layers (conv1_1 Cin=3)
    # where XLA's direct int8 conv emitter underutilizes the MXU.
    # "s2d": stride-2 conv via space-to-depth phase packing (K=7/s2
    # ResNet stem: Cin 3 -> 12, K 7 -> 4, stride 1) — bit-exact on the
    # int8 path (same int32 MACs reordered + zeros); float inputs fall
    # back to direct so the float interpreter stays unchanged.
    algo: str = "direct"
    # Image-pair channel packing (between PackImagesOp/UnpackImagesOp):
    # the activation holds TWO images in its channel dim, so the kernel
    # is applied block-diagonally ((kh,kw,2ci,2co), zeros off-diagonal)
    # and per-channel dequant/bias vectors are tiled x2. Bit-exact (the
    # off-diagonal zeros contribute nothing; per-tensor activation
    # scales see the same element multiset). Why: sub-128-channel convs
    # (ResNet stem Cin=3, stage-1 64-ch) underfill MXU lanes/contraction
    # — measured 1.35x (stem 7x7), 2.4x (1x1 64ch), 1.42x (3x3 64ch)
    # isolated (benchmarks/chip_logs/resnet_conv_ab.log).
    img_pack: bool = False


@dataclasses.dataclass(frozen=True)
class PackedConvPoolOp:
    """3x3/s1/SAME conv + 2x2/s2 max-pool folded into ONE 4x4/s2 conv.

    The 4 subpixels of each 2x2 pooling cell become 4 output-channel
    groups (packed weights: W4[ky+dy, kx+dx, :, g*C+o] = W[ky,kx,:,o],
    g = 2*dy+dx), and the pool is a channel-group max in the epilogue,
    BEFORE requant. Exact: same MACs in int32, relu commutes with max.

    Why: for C=64 output channels the direct conv fills half the MXU's
    128 output lanes (measured at the 50%-lane ceiling: conv1_2 2.79 ms
    + pool1 1.29 ms of a 20.6 ms SSD-300 program); packing quadruples
    lanes to 256 at 16/9 FLOP redundancy — net ~1.8x — and never
    materializes the pre-pool tensor (369 MB at bs=64) to HBM.
    """

    path: str
    relu: bool = True


@dataclasses.dataclass(frozen=True)
class FusedStemOp:
    """VGG block-1 (conv1_1 + conv1_2 + pool1) via the odd-pair layout +
    Pallas fused conv1_2+pool — kernels/stem_pallas.py. Exact (same int32
    MACs, same f32 epilogue); the 369 MB pre-pool activation never
    touches HBM and conv1_2 runs at 75% MXU utilization vs the 50%
    N=64-lane ceiling of the direct conv."""

    path1: str = "backbone/conv1_1"
    path2: str = "backbone/conv1_2"


@dataclasses.dataclass(frozen=True)
class BottleneckOp:
    """Stride-1, non-projection ResNet bottleneck (conv1 1x1 -> conv2 3x3
    -> conv3 1x1 + residual) fused into ONE Pallas kernel
    (kernels/bottleneck_pallas.py): both low-channel intermediates stay
    VMEM-resident, cutting the block's HBM traffic from ~4 tensor round
    trips + residual re-read to one read + one write. Bit-exact vs the
    unfused chain (same int32 MACs, same f32 epilogue op sequence).

    Calibration, scale keys and weight quantization EXPAND this op to the
    equivalent unfused ops (_expand_spec), so a single QuantParams serves
    both fused and unfused specs."""

    base: str  # e.g. "backbone/stage1_block2"

    @property
    def conv_paths(self) -> Tuple[str, str, str]:
        return (
            f"{self.base}/conv1", f"{self.base}/conv2", f"{self.base}/conv3"
        )


@dataclasses.dataclass(frozen=True)
class PackImagesOp:
    """(B, H, W, C) -> (B/2, H, W, 2C): first/second batch halves merged
    into channel groups, so downstream img_pack ConvOps run block-diag at
    full MXU lane/contraction fill. No-op when B is odd (the matching
    ConvOps then also run unpacked — resolved statically at trace time
    from the batch shape, see run_int8/run_float)."""


@dataclasses.dataclass(frozen=True)
class UnpackImagesOp:
    """(B/2, H, W, 2C) -> (B, H, W, C): inverse of PackImagesOp."""


def _block_diag2(w: Array) -> Array:
    """(kh, kw, ci, co) -> (kh, kw, 2ci, 2co) block-diagonal kernel."""
    kh, kw, ci, co = w.shape
    z = jnp.zeros((kh, kw, ci, co), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=3), jnp.concatenate([z, w], axis=3)],
        axis=2,
    )


@dataclasses.dataclass(frozen=True)
class SaveOp:
    """Save the current activation into a named register (residual input)."""

    name: str


@dataclasses.dataclass(frozen=True)
class LoadOp:
    """Restore a register as the current activation (branching support)."""

    name: str


@dataclasses.dataclass(frozen=True)
class PoolOp:
    size: int = 2
    stride: int = 2
    pad_same: bool = False  # True -> SAME padding (pool5 3x3/1)
    explicit_pad: Optional[int] = None  # symmetric spatial pad (ResNet stem)


@dataclasses.dataclass(frozen=True)
class StemPoolPallasOp:
    """ResNet 7x7/s2 stem conv + folded-BN bias + ReLU + requant +
    3x3/s2/pad1 max-pool as ONE Pallas kernel
    (kernels/resnet_stem_pallas.py — parity-split-lane formulation).
    Replaces the [input-quantize, ConvOp(stem), PoolOp] prefix: the input
    quantize is fused into the kernel's staging relayout. Bit-exact vs
    the unfused chain (tests/test_resnet_stem_pallas.py); calibration /
    scale keys / weight quantization EXPAND this op (_expand_spec) so one
    QuantParams serves both specs."""

    path: str = "backbone/stem_conv"


@dataclasses.dataclass(frozen=True)
class PadToEvenOp:
    pass


@dataclasses.dataclass(frozen=True)
class TapOp:
    index: int


Spec = List[Any]


def _env_tristate(name: str, auto: bool) -> bool:
    """Parse an on/off/auto env knob with one shared grammar (ADVICE r3:
    the two ODT_IMG_PACK call sites parsed `== "1"` against different
    unset defaults, so "true" silently meant OFF and "auto" was
    inexpressible once set). unset or "auto" -> the caller's
    backend-dependent default; "1" -> on; "0" -> off; anything else is
    an error, never a silent off."""
    val = os.environ.get(name)
    if val is None or val == "auto":
        return auto
    if val == "1":
        return True
    if val == "0":
        return False
    raise ValueError(
        f"{name}={val!r}: expected unset, 'auto', '0', or '1'"
    )


def _extras_spec(cfg: DetectorConfig, n_taps_so_far: int) -> Spec:
    """Extra-layer ops mirroring models/ssd.py SSDExtraLayers selection."""
    spec: Spec = []
    n_extra = len(cfg.anchors.feature_sizes) - n_taps_so_far
    for i in range(n_extra):
        if cfg.model.image_size >= 512:
            stride, padding = 2, "SAME"
        else:
            stride, padding = (2, "SAME") if i < 2 else (1, "VALID")
        spec.append(ConvOp(f"extras/conv{8+i}_1", kernel=1))
        spec.append(ConvOp(f"extras/conv{8+i}_2", stride=stride, padding=padding))
        spec.append(TapOp(n_taps_so_far + i))
    return spec


def build_spec(cfg: DetectorConfig, fused_stem: Optional[bool] = None) -> Spec:
    """Op list for the configured SSD trunk (VGG16 or ResNet-50).

    fused_stem=None resolves to True on TPU for VGG16 (the Pallas fused
    block-1 measured 15.0 vs 15.9 ms trunk at bs=64; bit-exact parity
    with the unfused spec is test-enforced, so specs are interchangeable
    across backends/checkpoints)."""
    if cfg.model.backbone == "vgg16":
        if fused_stem is None:
            fused_stem = (
                jax.default_backend() == "tpu"
                and cfg.model.image_size % 2 == 0
            )
        return build_ssd_spec(cfg, fused_stem=fused_stem)
    if cfg.model.backbone == "resnet50":
        # Image-pair packing of the stem + stage-1: ON by default on TPU
        # (+5.3% SSD-512 end-to-end, bit-exact —
        # benchmarks/chip_logs/resnet_pack_ab.log). RetinaNet resolves its
        # own trunk spec and keeps it OFF (measured 0.98x there: at bs=32
        # 640px the pack/unpack concats outweigh the MXU-fill win).
        img_pack = _env_tristate(
            "ODT_IMG_PACK", auto=jax.default_backend() == "tpu"
        )
        return build_resnet_ssd_spec(cfg, img_pack=img_pack)
    raise NotImplementedError(f"int8 engine: unknown backbone {cfg.model.backbone}")


def _expand_spec(spec: Spec) -> Spec:
    """Expand fused BottleneckOps into their equivalent unfused op chains
    and strip image-pair packing (used by the float interpreter,
    calibration and weight quantization so fused/packed and plain specs
    share one QuantParams by construction — packing permutes elements,
    never values, so per-tensor absmax calibration is identical)."""
    out: Spec = []
    for op in spec:
        if isinstance(op, BottleneckOp):
            c1, c2, c3 = op.conv_paths
            out += [
                SaveOp("sc"),
                ConvOp(c1, kernel=1),
                ConvOp(c2, kernel=3),
                ConvOp(c3, kernel=1, relu=True, add_register="sc"),
            ]
        elif isinstance(op, StemPoolPallasOp):
            out += [
                ConvOp(op.path, kernel=7, stride=2, padding=3),
                PoolOp(3, 2, explicit_pad=1),
            ]
        elif isinstance(op, (PackImagesOp, UnpackImagesOp)):
            continue
        elif isinstance(op, ConvOp) and op.img_pack:
            out.append(dataclasses.replace(op, img_pack=False))
        else:
            out.append(op)
    return out


def build_resnet_ssd_spec(
    cfg: DetectorConfig, fused_bottleneck: Optional[bool] = None,
    img_pack: Optional[bool] = None,
) -> Spec:
    """Op list mirroring models/ssd.py + models/resnet.py (BN pre-folded
    into conv kernels/biases by fold_resnet50)."""
    return build_resnet_trunk_spec(
        fused_bottleneck=fused_bottleneck, img_pack=img_pack
    ) + _extras_spec(cfg, 3)


def build_resnet_trunk_spec(
    stem_algo: str = "direct", fused_bottleneck: Optional[bool] = None,
    img_pack: Optional[bool] = None,
) -> Spec:
    """ResNet-50 C3/C4/C5 trunk (used by both SSD-512 and RetinaNet int8).

    stem_algo="s2d" swaps the 7x7/s2 stem for the space-to-depth
    phase-packed conv (_conv_s2d, bit-exact) — MEASURED DEAD END on v5e:
    0.9334x end-to-end at bs=64 (benchmarks/chip_logs/resnet_stem_ab.log,
    same-session ABAB, on-chip bit-exact parity asserted): XLA's direct
    strided int8 emitter already handles Cin=3 well here, and the 50 MB
    int8 phase relayout + the 4x-wider taps cost more than the fill win.
    Kept selectable for future hardware.

    fused_bottleneck: stride-1 non-projection blocks (block 2+ of every
    stage) run as single Pallas kernels (BottleneckOp). None = auto
    (ODT_FUSED_BOTTLENECK env, default off pending the on-chip A/B —
    benchmarks/bottleneck_ab.py).

    img_pack: stem + stage-1 (the sub-128-channel section) run image-pair
    channel-packed (PackImagesOp / ConvOp.img_pack — bit-exact, falls
    back automatically for odd batches). None = auto (ODT_IMG_PACK env,
    default off here). Measured (chip_logs/resnet_pack_ab.log, v5e-1):
    SSD-512 bs=64 +5.3% — build_spec turns it ON for the SSD path on
    TPU; RetinaNet bs=32 0.98x — quantize_retinanet leaves it off (the
    pack/unpack concats at 640px outweigh the MXU-fill win there)."""
    if fused_bottleneck is None:
        fused_bottleneck = _env_tristate("ODT_FUSED_BOTTLENECK", auto=False)
    if img_pack is None:
        img_pack = _env_tristate("ODT_IMG_PACK", auto=False)
    # Fused Pallas stem kernel (StemPoolPallasOp): replaces quantize+conv+
    # pool with one kernel. STATUS: pending the r5 on-chip A/B
    # (benchmarks/resnet_stem_kernel_ab.py) — every XLA-level stem
    # formulation measured a loss (chip_logs/stem_packed_ab.log), this is
    # the Mosaic-level lever TPU_WORK_QUEUE prices at SSD-512 1806->~2040.
    # When on, image pairing starts AT STAGE 1 (the kernel is per-image;
    # the pooled tensor packs just as well).
    stem_kernel = _env_tristate(
        "ODT_STEM_KERNEL", auto=False
    ) and stem_algo == "direct"
    if stem_kernel:
        spec: Spec = [StemPoolPallasOp()]
        if img_pack:
            spec.append(PackImagesOp())
    else:
        spec = [
            PackImagesOp(),
            ConvOp("backbone/stem_conv", kernel=7, stride=2, padding=3,
                   algo=stem_algo, img_pack=True),
            PoolOp(3, 2, explicit_pad=1),
        ] if img_pack else [
            ConvOp("backbone/stem_conv", kernel=7, stride=2, padding=3,
                   algo=stem_algo),
            PoolOp(3, 2, explicit_pad=1),
        ]
    stage_sizes = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        # stage 1 is the 64-channel section: packed when img_pack (which
        # then takes precedence over the fused-bottleneck knob there).
        packed_stage = img_pack and stage == 1
        if stage == 2 and img_pack:
            spec.append(UnpackImagesOp())
        for block in range(1, n_blocks + 1):
            base = f"backbone/stage{stage}_block{block}"
            stride = 2 if (block == 1 and stage > 1) else 1
            if block == 1:
                spec += [
                    SaveOp("in"),
                    ConvOp(f"{base}/proj", kernel=1, stride=stride,
                           relu=False, img_pack=packed_stage),
                    SaveOp("sc"),
                    LoadOp("in"),
                    ConvOp(f"{base}/conv1", kernel=1, img_pack=packed_stage),
                    ConvOp(f"{base}/conv2", kernel=3, stride=stride,
                           img_pack=packed_stage),
                    ConvOp(f"{base}/conv3", kernel=1, relu=True,
                           add_register="sc", img_pack=packed_stage),
                ]
            elif fused_bottleneck and not packed_stage:
                spec.append(BottleneckOp(base))
            elif packed_stage:
                spec += [
                    SaveOp("sc"),
                    ConvOp(f"{base}/conv1", kernel=1, img_pack=True),
                    ConvOp(f"{base}/conv2", kernel=3, img_pack=True),
                    ConvOp(f"{base}/conv3", kernel=1, relu=True,
                           add_register="sc", img_pack=True),
                ]
            else:
                spec += [
                    SaveOp("sc"),
                    ConvOp(f"{base}/conv1", kernel=1),
                    ConvOp(f"{base}/conv2", kernel=3, stride=stride),
                    ConvOp(f"{base}/conv3", kernel=1, relu=True,
                           add_register="sc"),
                ]
        if stage >= 2:
            spec.append(TapOp(stage - 2))
    return spec


def fold_resnet50(
    params: Dict[str, Any], batch_stats: Dict[str, Any], eps: float = 1e-5
) -> Dict[str, Any]:
    """Fold BatchNorm (inference stats) into conv kernels/biases, producing
    the plain conv+bias tree build_resnet_ssd_spec addresses. Non-backbone
    subtrees (extras, heads) pass through unchanged."""

    def fold(kernel, bn_p, bn_s):
        f = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
            np.asarray(bn_s["var"], np.float32) + eps
        )
        k = np.asarray(kernel, np.float32) * f  # broadcast over out-ch
        b = np.asarray(bn_p["bias"], np.float32) - np.asarray(
            bn_s["mean"], np.float32
        ) * f
        return {"kernel": k, "bias": b}

    bb_p = params["backbone"]
    bb_s = batch_stats["backbone"]
    folded: Dict[str, Any] = {
        "stem_conv": fold(bb_p["stem_conv"]["kernel"], bb_p["stem_bn"], bb_s["stem_bn"])
    }
    for name, block in bb_p.items():
        if not name.startswith("stage"):
            continue
        fb: Dict[str, Any] = {}
        for i in (1, 2, 3):
            fb[f"conv{i}"] = fold(
                block[f"conv{i}"]["kernel"], block[f"bn{i}"], bb_s[name][f"bn{i}"]
            )
        if "proj" in block:
            fb["proj"] = fold(
                block["proj"]["kernel"], block["bn_proj"], bb_s[name]["bn_proj"]
            )
        folded[name] = fb
    out = dict(params)
    out["backbone"] = folded
    return out


def build_ssd_spec(cfg: DetectorConfig, fused_stem: bool = False) -> Spec:
    """Op list mirroring models/ssd.py + models/vgg.py exactly (VGG16).

    fused_stem=True swaps block-1 for the FusedStemOp Pallas path
    (requires image_size divisible by the kernel band size; see
    stem_band_rows)."""
    if cfg.model.backbone != "vgg16":
        return build_spec(cfg)
    block1: Spec = (
        [FusedStemOp()]
        if fused_stem
        else [ConvOp("backbone/conv1_1"), ConvOp("backbone/conv1_2"), PoolOp()]
    )
    spec: Spec = block1 + [
        ConvOp("backbone/conv2_1"), ConvOp("backbone/conv2_2"), PoolOp(),
        ConvOp("backbone/conv3_1"), ConvOp("backbone/conv3_2"),
        ConvOp("backbone/conv3_3"), PadToEvenOp(), PoolOp(),
        ConvOp("backbone/conv4_1"), ConvOp("backbone/conv4_2"),
        ConvOp("backbone/conv4_3"), TapOp(0), PoolOp(),
        ConvOp("backbone/conv5_1"), ConvOp("backbone/conv5_2"),
        ConvOp("backbone/conv5_3"), PoolOp(3, 1, pad_same=True),
        ConvOp("backbone/fc6", dilation=6), ConvOp("backbone/fc7", kernel=1),
        TapOp(1),
    ]
    spec += _extras_spec(cfg, 2)
    return spec


def _get_path(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    node: Any = params
    for part in path.split("/"):
        node = node[part]
    return node


def _conv(x: Array, kernel: Array, op: ConvOp, accum_dtype) -> Array:
    if op.algo == "im2col":
        return _conv_im2col(x, kernel, op, accum_dtype)
    if op.algo == "s2d" and not jnp.issubdtype(x.dtype, jnp.floating):
        return _conv_s2d(x, kernel, op, accum_dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    padding = op.padding
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (op.stride, op.stride),
        padding,
        rhs_dilation=(op.dilation, op.dilation),
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
    )


def _conv_im2col(x: Array, kernel: Array, op: ConvOp, accum_dtype) -> Array:
    """kh*kw shifted copies -> channel-concat patches -> one matmul.

    For tiny input channel counts (conv1_1: Cin=3) XLA's direct conv
    emitter runs far below MXU rate (layout-hostile minor dim); a K=27
    matmul over explicit patches measured 2.79 -> ~1.2 ms in-program on
    v5e (benchmarks/stem_experiments.py history). SAME/stride-1 only.
    """
    assert op.stride == 1 and op.dilation == 1 and op.padding == "SAME"
    kh, kw, cin, cout = kernel.shape
    s_h, s_w = x.shape[1], x.shape[2]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [
        xp[:, ky : ky + s_h, kx : kx + s_w, :]
        for ky in range(kh)
        for kx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,kh*kw*cin)
    return jax.lax.dot_general(
        patches,
        kernel.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    )


def _conv_s2d(x: Array, kernel: Array, op: ConvOp, accum_dtype) -> Array:
    """Stride-2 conv via space-to-depth phase packing (exact).

    The ResNet 7x7/s2 stem has Cin=3 — XLA's direct strided int8 conv
    emitter runs it far below MXU rate (3-lane reduction minor dim +
    strided windows). Splitting rows/cols into even/odd phases turns it
    into a DENSE 4x4/s1 conv with Cin=12 (K taps 147 -> 192 incl. the
    phase zero-pad):

        o(y,x) = sum_{i,j} w[i,j] * xp[2y+i, 2x+j]
               = sum_{p,q in {0,1}} sum_{a,b} w[2a+p, 2b+q]
                                    * phase_pq[y+a, x+b]

    where xp is the explicitly zero-padded input (a zero int8 code IS
    conv zero-padding under symmetric quantization) and phase_pq[u,v] =
    xp[2u+p, 2v+q]. Packing the 4 phases channel-wise makes the sum one
    VALID conv. Int32 accumulation is order-independent, so the int8
    path is bit-exact vs the direct conv (test-enforced).
    """
    assert op.stride == 2 and op.dilation == 1 and isinstance(op.padding, int)
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    p = op.padding
    out_h = (h + 2 * p - kh) // 2 + 1
    out_w = (w + 2 * p - kw) // 2 + 1
    # Pad to even spatial dims for the phase reshape; the extra zero
    # row/col (if any) lies beyond every output window and is sliced off.
    hp = h + 2 * p
    wp = w + 2 * p
    he, we = hp + (hp % 2), wp + (wp % 2)
    xp = jnp.pad(x, ((0, 0), (p, p + he - hp), (p, p + we - wp), (0, 0)))
    xs = xp.reshape(b, he // 2, 2, we // 2, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, he // 2, we // 2, 4 * cin
    )
    # Kernel: (kh, kw, cin, cout) -> (ceil(kh/2), ceil(kw/2), 4*cin, cout)
    # with the same (row-phase, col-phase, channel) minor order as xs.
    kh2, kw2 = (kh + 1) // 2, (kw + 1) // 2
    kp = jnp.pad(kernel, ((0, 2 * kh2 - kh), (0, 2 * kw2 - kw), (0, 0), (0, 0)))
    ks = kp.reshape(kh2, 2, kw2, 2, cin, cout)
    ks = jnp.transpose(ks, (0, 2, 1, 3, 4, 5)).reshape(kh2, kw2, 4 * cin, cout)
    dn = jax.lax.conv_dimension_numbers(
        xs.shape, ks.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        xs, ks, (1, 1), "VALID",
        dimension_numbers=dn, preferred_element_type=accum_dtype,
    )
    return acc[:, :out_h, :out_w, :]


def _pack_pool_kernel(w: np.ndarray) -> np.ndarray:
    """(3,3,Cin,C) conv kernel -> (4,4,Cin,4C) conv+pool packed kernel."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    packed = np.zeros((4, 4, cin, 4 * cout), w.dtype)
    for dy in range(2):
        for dx in range(2):
            g = 2 * dy + dx
            packed[dy : dy + 3, dx : dx + 3, :, g * cout : (g + 1) * cout] = w
    return packed


def _packed_conv_pool_int8(
    x: Array, w_packed: Array, deq: Array, bias: Array, relu: bool
) -> Array:
    """Int8 packed conv+pool: int32 accum -> f32 epilogue -> group max."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w_packed.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        x, w_packed, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * deq + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    b, h, w_, c4 = y.shape
    return jnp.max(y.reshape(b, h, w_, 4, c4 // 4), axis=3)


def _pool(x: Array, op: PoolOp) -> Array:
    # NOTE: a strided-slice max formulation was measured SLOWER than
    # reduce_window on int8 TPU layouts (spatial slicing forces relayouts
    # of T(8,128)(4,1) tiles) — keep reduce_window.
    if op.explicit_pad is not None:
        p = op.explicit_pad
        pad = [(0, 0), (p, p), (p, p), (0, 0)]
    else:
        pad = "SAME" if op.pad_same else "VALID"
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = jnp.array(-jnp.inf, x.dtype)
    else:
        init = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        (1, op.size, op.size, 1),
        (1, op.stride, op.stride, 1),
        pad,
    )


# --------------------------------------------------------------------------
# Float reference / calibration pass
# --------------------------------------------------------------------------

def run_float(
    params: Dict[str, Any],
    spec: Spec,
    images: Array,  # normalized float input (B, S, S, 3)
    compute_dtype=jnp.float32,
) -> Tuple[List[Array], Dict[str, Array]]:
    """Run the trunk in float; returns (taps, absmax-per-stage).

    absmax records the post-activation maximum magnitude of every conv
    output plus the trunk input under key "__input__" (per-tensor scales).
    """
    spec = _expand_spec(spec)  # float path always runs unfused chains
    absmax: Dict[str, Array] = {"__input__": jnp.max(jnp.abs(images))}
    x = images.astype(compute_dtype)
    regs: Dict[str, Array] = {}
    taps: List[Array] = [None] * _num_taps(spec)  # type: ignore[list-item]
    for op in spec:
        if isinstance(op, ConvOp):
            p = _get_path(params, op.path)
            y = _conv(x, p["kernel"].astype(compute_dtype), op, jnp.float32)
            y = y + p["bias"].astype(jnp.float32)
            if op.add_register is not None:
                y = y + regs[op.add_register].astype(jnp.float32)
            if op.relu:
                y = jnp.maximum(y, 0.0)
            x = y.astype(compute_dtype)
            absmax[op.path] = jnp.max(jnp.abs(x))
        elif isinstance(op, PackedConvPoolOp):
            # Float reference: plain conv + relu + pool (identical math;
            # relu>=0 so the pre-pool absmax survives pooling — scales
            # match the packed int8 path exactly).
            p = _get_path(params, op.path)
            y = _conv(
                x, p["kernel"].astype(compute_dtype), ConvOp(op.path), jnp.float32
            )
            y = y + p["bias"].astype(jnp.float32)
            if op.relu:
                y = jnp.maximum(y, 0.0)
            x = _pool(y.astype(compute_dtype), PoolOp())
            absmax[op.path] = jnp.max(jnp.abs(x))
        elif isinstance(op, StemPoolPallasOp):
            # Float reference: plain conv + bias + relu + pool (identical
            # math to the expanded chain; relu>=0 so the pre-pool absmax
            # survives pooling and scales match the kernel path exactly).
            p = _get_path(params, op.path)
            cop = ConvOp(op.path, kernel=7, stride=2, padding=3)
            y = _conv(x, p["kernel"].astype(compute_dtype), cop, jnp.float32)
            y = jnp.maximum(y + p["bias"].astype(jnp.float32), 0.0)
            x = y.astype(compute_dtype)
            absmax[op.path] = jnp.max(jnp.abs(x))
            x = _pool(x, PoolOp(3, 2, explicit_pad=1))
        elif isinstance(op, FusedStemOp):
            # Float reference: conv-relu-conv-relu-pool; absmax recorded
            # per conv exactly like the unfused spec (relu>=0 so the pool
            # preserves conv1_2's absmax).
            for path in (op.path1, op.path2):
                p = _get_path(params, path)
                y = _conv(
                    x, p["kernel"].astype(compute_dtype), ConvOp(path),
                    jnp.float32,
                )
                y = jnp.maximum(y + p["bias"].astype(jnp.float32), 0.0)
                x = y.astype(compute_dtype)
                absmax[path] = jnp.max(jnp.abs(x))
            x = _pool(x, PoolOp())
        elif isinstance(op, SaveOp):
            regs[op.name] = x
        elif isinstance(op, LoadOp):
            x = regs[op.name]
        elif isinstance(op, PoolOp):
            x = _pool(x, op)
        elif isinstance(op, PadToEvenOp):
            pad_h = x.shape[1] % 2 == 1
            pad_w = x.shape[2] % 2 == 1
            if pad_h or pad_w:
                x = jnp.pad(
                    x,
                    ((0, 0), (0, int(pad_h)), (0, int(pad_w)), (0, 0)),
                    mode="edge",
                )
        elif isinstance(op, TapOp):
            taps[op.index] = x
    return taps, absmax


def _num_taps(spec: Spec) -> int:
    return sum(1 for op in spec if isinstance(op, TapOp))


def required_scale_keys(spec: Spec, use_l2norm: bool = False) -> set:
    """Activation-scale keys `run_int8` will look up for this spec.

    Used by benches/tools to validate a cached calibration fixture before
    trusting it (missing keys would crash mid-compile; stale extras are
    harmless). Fused/packed ops record absmax under the ORIGINAL conv
    paths, so fused and unfused specs share a key set by construction."""
    keys = {"__input__"}
    for op in _expand_spec(spec):
        if isinstance(op, (ConvOp, PackedConvPoolOp)):
            keys.add(op.path)
        elif isinstance(op, FusedStemOp):
            keys.update((op.path1, op.path2))
    if use_l2norm:
        keys.add("__l2norm__")
    return keys


# --------------------------------------------------------------------------
# Quantization
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantParams:
    """Int8 trunk weights + scales; float head params ride along.

    Registered as a pytree so it can be device_put / passed through jit.
    Activation scales are static metadata (Python floats baked into the
    compiled program).
    """

    w_int8: Dict[str, np.ndarray]  # path -> int8 HWIO kernel
    w_scale: Dict[str, np.ndarray]  # path -> (out_ch,) f32
    bias: Dict[str, np.ndarray]  # path -> (out_ch,) f32
    act_scale: Dict[str, float]  # stage path (or __input__) -> f32 scalar
    float_params: Dict[str, Any]  # full original float params (heads, l2norm)


def calibrate_scales(
    params: Dict[str, Any], spec: Spec, batches: Sequence[Array],
    use_l2norm: bool = True,
) -> Dict[str, float]:
    """Per-tensor activation scales (absmax/127) over calibration batches.

    For VGG also records "__l2norm__" (the L2Norm'd tap-0 feeding head0)
    so heads can run int8.
    """
    agg: Dict[str, float] = {}

    def probe(p, im):
        taps, absmax = run_float(p, spec, im)
        absmax = dict(absmax)
        if use_l2norm:
            t0 = taps[0]
            sq = jnp.sum(jnp.square(t0), axis=-1, keepdims=True, dtype=jnp.float32)
            ln = t0 * jax.lax.rsqrt(sq + 1e-12) * p["l2norm"]["scale"]
            absmax["__l2norm__"] = jnp.max(jnp.abs(ln))
        return absmax

    run = jax.jit(probe)
    for images in batches:
        absmax = jax.device_get(run(params, images))
        for key, val in absmax.items():
            agg[key] = max(agg.get(key, 0.0), float(val))
    return {k: max(v, 1e-6) / 127.0 for k, v in agg.items()}


def _quantize_kernel(p: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    w = np.asarray(p["kernel"], np.float32)  # (kh, kw, in, out)
    s = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0  # per out-ch
    s = np.maximum(s, 1e-8).astype(np.float32)
    w_q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return w_q, s, np.asarray(p["bias"], np.float32)


def quantize_params(
    params: Dict[str, Any], spec: Spec, act_scale: Dict[str, float],
    quantize_heads: bool = True,
) -> QuantParams:
    w_int8: Dict[str, np.ndarray] = {}
    w_scale: Dict[str, np.ndarray] = {}
    bias: Dict[str, np.ndarray] = {}
    for op in _expand_spec(spec):
        if isinstance(op, FusedStemOp):
            from object_detector_tpu.kernels import stem_pallas

            # Per-out-channel quantization of the ORIGINAL kernels, then
            # pack; packed channel groups reuse the source channel's
            # scale (tiled x2), so parity with the unfused chain is
            # exact. Plain kernels ride along under "#plain" for the
            # batch%8!=0 fallback (the TPU kernel tiles batch in
            # sublanes).
            w1_q, s1, b1 = _quantize_kernel(_get_path(params, op.path1))
            w_int8[op.path1] = stem_pallas.pack_conv11_pair(w1_q)
            w_scale[op.path1] = np.tile(s1, 2)
            bias[op.path1] = np.tile(b1, 2)
            w_int8[op.path1 + "#plain"] = w1_q
            w_scale[op.path1 + "#plain"] = s1
            bias[op.path1 + "#plain"] = b1
            w2_q, s2, b2 = _quantize_kernel(_get_path(params, op.path2))
            w_int8[op.path2] = stem_pallas.pack_conv12_pair(w2_q)
            w_scale[op.path2] = np.tile(s2, 2)
            bias[op.path2] = np.tile(b2, 2)
            w_int8[op.path2 + "#plain"] = w2_q
            w_scale[op.path2 + "#plain"] = s2
            bias[op.path2 + "#plain"] = b2
            continue
        if isinstance(op, PackedConvPoolOp):
            # Quantize the original 3x3 kernel per-out-channel, THEN pack:
            # packed group g channel o reuses scale s[o], so dequant is a
            # 4x-tiled scale vector and parity with the unpacked conv is
            # exact.
            w_q, s, b = _quantize_kernel(_get_path(params, op.path))
            w_int8[op.path] = _pack_pool_kernel(w_q)
            w_scale[op.path] = np.tile(s, 4)
            bias[op.path] = np.tile(b, 4)
            continue
        if not isinstance(op, ConvOp):
            continue
        w_q, s, b = _quantize_kernel(_get_path(params, op.path))
        w_int8[op.path], w_scale[op.path], bias[op.path] = w_q, s, b
    if quantize_heads:
        # SSD prediction heads (they consume int8 taps directly).
        for level in range(_num_taps(spec)):
            for kind in ("cls", "box"):
                path = f"head{level}/{kind}"
                w_q, s, b = _quantize_kernel(_get_path(params, path))
                w_int8[path], w_scale[path], bias[path] = w_q, s, b
    return QuantParams(
        w_int8=w_int8, w_scale=w_scale, bias=bias,
        act_scale=dict(act_scale), float_params=params,
    )


# --------------------------------------------------------------------------
# Int8 inference pass
# --------------------------------------------------------------------------

def run_int8(
    qp: QuantParams,
    spec: Spec,
    images: Array,  # normalized float input (B, S, S, 3)
    dequantize_taps: bool = True,
    input_hwcn: bool = False,  # images staged (S, S, 3, B) — see below
) -> List[Any]:
    """Int8 trunk forward.

    dequantize_taps=True  -> list of bf16 float taps (for float heads)
    dequantize_taps=False -> list of (int8 tap, scale) (for int8 heads)

    input_hwcn=True: `images` is (S, S, 3, B) — the serving batch staged
    batch-minor on the host (free at batch-assembly time). The fused-stem
    producer conv consumes its operand in exactly that memory order, so
    the 0.45 ms / 71 GiB/s batch-to-lanes relayout of the quantized codes
    (r3 profile, copy.41) disappears. Bit-exact either way (the quantize
    is elementwise). Only the fused-stem kernel path exploits it; other
    specs/fallbacks transpose back to NHWC up front.
    """
    in_scale = qp.act_scale["__input__"]
    # When the fused Pallas stem will consume the input, fold the
    # pair-column reshape in BEFORE the quantize elementwise so XLA emits
    # the int8 codes directly in conv1_1pp's operand layout (the
    # post-quantize reshape cost a 0.45 ms relayout copy at bs=64; see
    # stem_pallas.conv11_pair_acc pre_paired).
    batch = images.shape[3] if input_hwcn else images.shape[0]
    pre_paired = (
        bool(spec)
        and isinstance(spec[0], FusedStemOp)
        and not (batch % 8 != 0 and jax.default_backend() == "tpu")
    )
    if input_hwcn and not pre_paired:
        images = jnp.transpose(images, (3, 0, 1, 2))  # back to NHWC
        input_hwcn = False
    if pre_paired:
        if input_hwcn:
            h0, w0, c0, b0 = images.shape
            images = images.reshape(h0, w0 // 2, 2 * c0, b0)
        else:
            b0, h0, w0, c0 = images.shape
            images = images.reshape(b0, h0, w0 // 2, 2 * c0)
    if bool(spec) and isinstance(spec[0], StemPoolPallasOp):
        # The Pallas stem's staging IS the input quantize (fused with the
        # (U, L) relayout + y-pad) — the generic 64 MB quantize pass below
        # never materializes for this path.
        from object_detector_tpu.kernels import resnet_stem_pallas

        x = resnet_stem_pallas.stage_stem_input(images, in_scale)
    else:
        x = jnp.clip(jnp.round(images / in_scale), -127, 127).astype(jnp.int8)
    cur_scale = in_scale

    regs: Dict[str, Tuple[Array, float]] = {}
    taps: List[Any] = [None] * _num_taps(spec)
    # Zero-padded-width carry-through (fused stem only): the Pallas stem
    # emits its full Jp-wide tensor with columns >= junk_from exactly 0 —
    # slicing to the true width cost a 0.57 ms relayout at bs=64. A zero
    # int8 code column is bit-exact SAME-conv padding, so block 2/3 run
    # at the padded width with the junk columns re-zeroed inside each
    # conv's fused requant epilogue (one fused select, no extra HBM
    # pass); the VALID pools floor the junk away and shapes reconverge
    # at pool3 (300: 152->76->38; 512: 258->129->64). The PadToEvenOp
    # ceil-pad is absorbed by a zero junk column exactly because relu'd
    # codes are >= 0 (max(x, 0) == x == ceil-mode edge pool).
    junk_from: Optional[int] = None

    def _junk_mask(w: int) -> Array:
        # Compile-time 0/1 f32 column mask, applied multiplicatively to
        # the f32 epilogue BEFORE the requant convert: the whole
        # dequant+bias+relu+mask+clip+convert chain stays one elementwise
        # epilogue XLA fuses into the conv (an int8 select AFTER the
        # convert compiled to a separate 147 GiB/s pass — measured
        # broadcast_select_fusion.4/.6, 1.85 ms at bs=64).
        import numpy as _np

        return jnp.asarray(
            (_np.arange(w) < junk_from).astype(_np.float32).reshape(
                1, 1, w, 1
            )
        )

    # Image-pair packing needs an even batch; resolved statically at trace
    # time (shapes are static under jit) so odd/single-image calls fall
    # back to the identical unpacked math.
    pack_ok = batch % 2 == 0

    for op in spec:
        if isinstance(op, PackImagesOp):
            if pack_ok:
                half = x.shape[0] // 2
                x = jnp.concatenate([x[:half], x[half:]], axis=-1)
            continue
        if isinstance(op, UnpackImagesOp):
            if pack_ok:
                ch = x.shape[-1] // 2
                x = jnp.concatenate([x[..., :ch], x[..., ch:]], axis=0)
            continue
        if isinstance(op, ConvOp):
            w_q = jnp.asarray(qp.w_int8[op.path])
            w_sc = jnp.asarray(qp.w_scale[op.path])
            w_bias = jnp.asarray(qp.bias[op.path])
            if op.img_pack and pack_ok:
                w_q = _block_diag2(w_q)
                w_sc = jnp.concatenate([w_sc, w_sc])
                w_bias = jnp.concatenate([w_bias, w_bias])
            acc = _conv(x, w_q, op, jnp.int32)
            # Fused epilogue: dequant (per-channel) + bias (+ residual add)
            # + relu + requant. Folding 1/out_scale into the per-channel
            # multiplier keeps it one multiply; f32 epilogue (bf16 loses
            # requant precision near the clip boundary).
            deq = cur_scale * w_sc  # (out_ch,)
            y = acc.astype(jnp.float32) * deq + w_bias
            if op.add_register is not None:
                rq, rs = regs[op.add_register]
                y = y + rq.astype(jnp.float32) * rs
            if op.relu:
                y = jnp.maximum(y, 0.0)
            if junk_from is not None and y.shape[2] > junk_from:
                y = y * _junk_mask(y.shape[2])
            # NOTE: pooling in f32 here (pool commutes with requant) was
            # measured SLOWER — it breaks the conv+requant epilogue fusion
            # and materializes the f32 conv output to HBM. Keep requant
            # fused and pool on int8.
            out_scale = qp.act_scale[op.path]
            x = jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
            cur_scale = out_scale
        elif isinstance(op, StemPoolPallasOp):
            from object_detector_tpu.kernels import resnet_stem_pallas

            # x is the STAGED input (B, (H+6)*16, W/4) — see above.
            h_img = x.shape[1] // resnet_stem_pallas._U - 2 * resnet_stem_pallas._PAD
            out_scale = qp.act_scale[op.path]
            a = resnet_stem_pallas.pack_stem_weights(
                jnp.asarray(qp.w_int8[op.path])
            )
            x = resnet_stem_pallas.stem_conv_pool(
                x,
                a,
                cur_scale * jnp.asarray(qp.w_scale[op.path]),
                jnp.asarray(qp.bias[op.path]),
                out_scale,
                image_hw=h_img,
            )
            cur_scale = out_scale
        elif isinstance(op, BottleneckOp):
            from object_detector_tpu.kernels import bottleneck_pallas

            c1, c2, c3 = op.conv_paths
            s1 = qp.act_scale[c1]
            s2 = qp.act_scale[c2]
            s3 = qp.act_scale[c3]
            cin = x.shape[-1]
            cm = qp.w_int8[c1].shape[-1]
            x = bottleneck_pallas.fused_bottleneck(
                x,
                jnp.asarray(qp.w_int8[c1]).reshape(cin, cm),
                cur_scale * jnp.asarray(qp.w_scale[c1]),
                jnp.asarray(qp.bias[c1]),
                jnp.asarray(qp.w_int8[c2]),
                s1 * jnp.asarray(qp.w_scale[c2]),
                jnp.asarray(qp.bias[c2]),
                jnp.asarray(qp.w_int8[c3]).reshape(cm, cin),
                s2 * jnp.asarray(qp.w_scale[c3]),
                jnp.asarray(qp.bias[c3]),
                s1=s1, s2=s2, s3=s3, resid_scale=cur_scale,
            )
            cur_scale = s3
        elif isinstance(op, FusedStemOp):
            from object_detector_tpu.kernels import stem_pallas

            if input_hwcn:
                h_img, w_half, _, b_ = x.shape
                w_img = 2 * w_half
            else:
                b_, h_img, w_half, cin_ = x.shape
                w_img = 2 * w_half if pre_paired else w_half
            if b_ % 8 != 0 and jax.default_backend() == "tpu":
                # The TPU kernel tiles batch in sublanes (8 per program);
                # odd batches run the equivalent unfused chain on the
                # plain weights (bit-exact either way).
                for path in (op.path1, op.path2):
                    cop = ConvOp(path)
                    acc = _conv(
                        x, jnp.asarray(qp.w_int8[path + "#plain"]), cop,
                        jnp.int32,
                    )
                    deq = cur_scale * jnp.asarray(qp.w_scale[path + "#plain"])
                    y = acc.astype(jnp.float32) * deq + jnp.asarray(
                        qp.bias[path + "#plain"]
                    )
                    y = jnp.maximum(y, 0.0)
                    out_scale = qp.act_scale[path]
                    x = jnp.clip(jnp.round(y / out_scale), -127, 127).astype(
                        jnp.int8
                    )
                    cur_scale = out_scale
                x = _pool(x, PoolOp())
                continue
            w1r = jnp.asarray(qp.w_int8[op.path1])
            # Fully-fused stem (conv1_1 inside the kernel over the
            # tap-stacked 36-lane input — no 376 MB odd-pair intermediate;
            # see stem_pallas._stem_fp_kernel). Bit-exact vs the two-stage
            # path (test-enforced); trace-time env knob like
            # ODT_STEM_CARRY, pending the on-chip A/B
            # (benchmarks/stem_fp_ab.py). Square-packed w1 (A/B variant)
            # has no flat form — falls through to the two-stage path.
            if (
                os.environ.get("ODT_STEM_FP", "0") == "1"
                and w1r.shape[1] == 2
            ):
                xin = (
                    jnp.transpose(x, (3, 0, 1, 2)) if input_hwcn else x
                )
                s1 = qp.act_scale[op.path1]
                s2 = qp.act_scale[op.path2]
                w1flat = w1r.reshape(-1, w1r.shape[-1])
                # K padded to a full 128-lane tile (pack_conv11_flat)
                w1flat = jnp.pad(w1flat, ((0, 128 - w1flat.shape[0]), (0, 0)))
                x = stem_pallas.stem_fused_producer(
                    xin,
                    w1flat,
                    cur_scale * jnp.asarray(qp.w_scale[op.path1]),
                    jnp.asarray(qp.bias[op.path1]),
                    s1,
                    jnp.asarray(qp.w_int8[op.path2]),
                    s1 * jnp.asarray(qp.w_scale[op.path2]),
                    jnp.asarray(qp.bias[op.path2]),
                    s2,
                    out_width=w_img // 2,
                    band_rows=stem_pallas.stem_band_rows(h_img),
                )
                cur_scale = s2
                continue
            acc = stem_pallas.conv11_pair_acc(
                x,
                w1r,
                out_order="HWNC" if input_hwcn else "NHWC",
                pre_paired=pre_paired,
                in_order="HWCN" if input_hwcn else "NHWC",
            )
            deq1 = cur_scale * jnp.asarray(qp.w_scale[op.path1])
            y = acc.astype(jnp.float32) * deq1 + jnp.asarray(qp.bias[op.path1])
            y = jnp.maximum(y, 0.0)
            s1 = qp.act_scale[op.path1]
            # Halo positions hold garbage (partial sums + bias); the
            # Pallas kernel zeroes them in VMEM after the DMA — an XLA
            # mask here costs a full 376 MB select pass.
            q = jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)
            s2 = qp.act_scale[op.path2]
            # MEASURED DEAD END (kept off-default, benchmarks/
            # stem_carry_ab.py): carrying the zero-padded full width
            # through block 2/3 (junk-column tracking below) instead of
            # slicing here lost 1.3% headline (3336 vs 3380 img/s/chip
            # interleaved same-session, v5e-1). The launcher's slice is
            # fused into the unpack reshape — it was never a separate
            # pass — while the junk re-zero selects compile to separate
            # 147 GiB/s passes after conv3_1/conv3_2 (even expressed as a
            # pre-requant f32 multiply, XLA keeps them out of the conv
            # epilogue fusion). Bit-exact either way (test-enforced).
            carry = os.environ.get("ODT_STEM_CARRY", "0") == "1"
            x = stem_pallas.conv12_pool_pair(
                q,
                jnp.asarray(qp.w_int8[op.path2]),
                s1 * jnp.asarray(qp.w_scale[op.path2]),
                jnp.asarray(qp.bias[op.path2]),
                s2,
                out_width=w_img // 2,
                band_rows=stem_pallas.stem_band_rows(h_img),
                input_transposed=input_hwcn,
                full_width=carry,
            )
            if x.shape[2] > w_img // 2:
                junk_from = w_img // 2
            cur_scale = s2
        elif isinstance(op, PackedConvPoolOp):
            # Requant BEFORE the group max: every group shares the same
            # per-channel scale, and x -> clip(round(x/s)) is monotone, so
            # max commutes with requant exactly — and the conv keeps its
            # fused dequant+relu+requant epilogue (a f32 pre-max tensor
            # would cost ~1.5 GB of HBM traffic at bs=64).
            w_p = jnp.asarray(qp.w_int8[op.path])
            deq = cur_scale * jnp.asarray(qp.w_scale[op.path])
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w_p.shape, ("NHWC", "HWIO", "NHWC")
            )
            acc = jax.lax.conv_general_dilated(
                x, w_p, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * deq + jnp.asarray(qp.bias[op.path])
            if op.relu:
                y = jnp.maximum(y, 0.0)
            out_scale = qp.act_scale[op.path]
            q = jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
            b_, h_, w_, c4 = q.shape
            x = jnp.max(q.reshape(b_, h_, w_, 4, c4 // 4), axis=3)
            cur_scale = out_scale
        elif isinstance(op, SaveOp):
            regs[op.name] = (x, cur_scale)
        elif isinstance(op, LoadOp):
            x, cur_scale = regs[op.name]
        elif isinstance(op, PoolOp):
            if junk_from is not None and (
                op.pad_same or op.explicit_pad is not None
            ):
                # Non-VALID pool windows would mix junk into true columns;
                # reconverge first (current specs never hit this: junk
                # clears at pool3, the SAME pool5 comes later).
                x = x[:, :, :junk_from, :]
                junk_from = None
            x = _pool(x, op)  # int8 max pool is exact
            if junk_from is not None:
                # VALID pool: junk columns pool to 0 (relu'd codes >= 0,
                # junk re-zeroed each conv) or get floored away entirely.
                junk_from = (junk_from - op.size) // op.stride + 1
                if x.shape[2] <= junk_from:
                    junk_from = None  # shape reconverged with the truth
        elif isinstance(op, PadToEvenOp):
            pad_h = x.shape[1] % 2 == 1
            true_w = junk_from if junk_from is not None else x.shape[2]
            # Pad W only when the TRUE width is odd; with junk carry the
            # zero junk column next to the last true column IS the ceil
            # pad (max(code, 0) == code == edge-pool value), so no
            # physical pad is needed — just count it as true.
            pad_w = true_w % 2 == 1 and junk_from is None
            if junk_from is not None and junk_from % 2 == 1:
                junk_from += 1
            if pad_h or pad_w:
                x = jnp.pad(
                    x,
                    ((0, 0), (0, int(pad_h)), (0, int(pad_w)), (0, 0)),
                    mode="edge",
                )
        elif isinstance(op, TapOp):
            xt = x
            if junk_from is not None and xt.shape[2] > junk_from:
                xt = xt[:, :, :junk_from, :]  # defensive; specs tap late
            if dequantize_taps:
                taps[op.index] = xt.astype(jnp.bfloat16) * jnp.bfloat16(
                    cur_scale
                )
            else:
                taps[op.index] = (xt, cur_scale)
    return taps


def apply_heads_int8(
    qp: QuantParams,
    taps_q: List[Tuple[Array, float]],
    cfg: DetectorConfig,
    pallas_l2norm: Optional[bool] = None,
    logits_dtype=jnp.float32,
    concat: bool = True,
) -> Tuple[Array, Array]:
    """Int8 prediction heads over int8 taps. concat=False returns
    per-level native-layout tuples (see the loop comment) instead of the
    concatenated (B, A, C)/(B, A, 4) pair.

    L2Norm on tap0 (VGG only) is scale-invariant in its input (x/||x||
    cancels any per-tensor scale), so it runs directly on the int8 codes
    and requants with the calibrated "__l2norm__" scale. The jnp
    formulation is the default everywhere: a fused Pallas variant
    (kernels/l2norm_pallas.py) measured SLOWER in-program on v5e (21.2 vs
    20.4 ms pipeline — the pallas_call fusion boundary costs more than
    XLA's fused lowering of the jnp ops); kept for reference. Head convs
    are int8 with f32 dequant outputs (no further requant — final logits).
    """
    taps = list(taps_q)
    if "__l2norm__" in qp.act_scale:
        q0, _ = taps[0]
        gamma = jnp.asarray(qp.float_params["l2norm"]["scale"], jnp.float32)
        s0 = qp.act_scale["__l2norm__"]
        if pallas_l2norm is None:
            pallas_l2norm = False
        if pallas_l2norm:
            from object_detector_tpu.kernels.l2norm_pallas import l2norm_requant

            taps[0] = (l2norm_requant(q0, gamma, s0), s0)
        else:
            qf = q0.astype(jnp.float32)
            sq = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
            ln = qf * jax.lax.rsqrt(sq + 1e-12) * gamma
            taps[0] = (
                jnp.clip(jnp.round(ln / s0), -127, 127).astype(jnp.int8),
                s0,
            )

    cls_out, box_out = [], []
    for level, ((tap, s_tap), a) in enumerate(
        zip(taps, cfg.anchors.anchors_per_level)
    ):
        b, h, w, _ = tap.shape
        outs = {}
        for kind in ("cls", "box"):
            path = f"head{level}/{kind}"
            op = ConvOp(path, relu=False)
            acc = _conv(tap, jnp.asarray(qp.w_int8[path]), op, jnp.int32)
            deq = s_tap * jnp.asarray(qp.w_scale[path])
            y = acc.astype(jnp.float32) * deq + jnp.asarray(qp.bias[path])
            if kind == "cls":
                # Cast fuses into the conv epilogue — halves the write of
                # the largest postprocess operand when logits_dtype=bf16
                # (box offsets stay f32: they become eval coordinates).
                y = y.astype(logits_dtype)
            outs[kind] = y
        if not concat:
            # Per-level native layout for the per-level postprocess
            # (ops/postprocess.postprocess_levels): the (H, W, a*C) ->
            # (H*W*a, C) retile + concat of every level cost ~2.8 ms HBM
            # at SSD-512/COCO bs=64 (r3 HLO profile: reshape.24 +
            # dynamic-update-slice concat + copy.69).
            cls_out.append(outs["cls"])
            box_out.append(outs["box"])
            continue
        # NOTE (r4 measured dead end, chip_logs/headpad_ab.log): emitting
        # this slab with the class dim padded to the 128-lane tile (hoping
        # the unaligned C-minor retile would become fused aligned block
        # moves) LOST uniformly — 0.87x SSD-512, 0.86x RetinaNet, 0.63x
        # SSD-300, bitwise-equal outputs — proving XLA stores (B, A, C)
        # compactly (NOT lane-padded), so padding is pure added traffic.
        cls_out.append(outs["cls"].reshape(b, h * w * a, cfg.model.num_classes))
        box_out.append(outs["box"].reshape(b, h * w * a, 4))
    if not concat:
        return tuple(cls_out), tuple(box_out)
    return jnp.concatenate(cls_out, axis=1), jnp.concatenate(box_out, axis=1)


# --------------------------------------------------------------------------
# Heads (float) + full model assembly
# --------------------------------------------------------------------------

def _head_conv(x: Array, p: Dict[str, Any], dtype) -> Array:
    dn = jax.lax.conv_dimension_numbers(
        x.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    return y + p["bias"].astype(jnp.float32)


def apply_heads(
    params: Dict[str, Any],
    taps: List[Array],
    cfg: DetectorConfig,
    dtype=jnp.bfloat16,
) -> Tuple[Array, Array]:
    """[L2Norm on tap0 (VGG)] + per-level cls/box heads; mirrors ssd.py."""
    taps = list(taps)
    if cfg.model.backbone == "vgg16":
        # L2Norm (float): x * rsqrt(sum x^2) * scale.
        scale = jnp.asarray(params["l2norm"]["scale"], dtype)
        t0 = taps[0].astype(dtype)
        sq = jnp.sum(jnp.square(t0), axis=-1, keepdims=True, dtype=jnp.float32)
        taps[0] = t0 * jax.lax.rsqrt(sq + 1e-12).astype(dtype) * scale

    cls_out, box_out = [], []
    for level, (tap, a) in enumerate(zip(taps, cfg.anchors.anchors_per_level)):
        hp = params[f"head{level}"]
        b, h, w, _ = tap.shape
        cls = _head_conv(tap, hp["cls"], dtype).reshape(
            b, h * w * a, cfg.model.num_classes
        )
        box = _head_conv(tap, hp["box"], dtype).reshape(b, h * w * a, 4)
        cls_out.append(cls)
        box_out.append(box)
    return (
        jnp.concatenate(cls_out, axis=1).astype(jnp.float32),
        jnp.concatenate(box_out, axis=1).astype(jnp.float32),
    )


def quantize_ssd(
    cfg: DetectorConfig,
    params: Dict[str, Any],
    calibration_batches: Sequence[Array],
    batch_stats: Optional[Dict[str, Any]] = None,
    spec: Optional[Spec] = None,
) -> Tuple[QuantParams, Spec]:
    """One-call PTQ: [BN-fold] + calibrate + quantize. `calibration_batches`
    are normalized float image batches; `batch_stats` is required for
    BatchNorm backbones (ResNet). `spec` overrides the default op list
    (e.g. a PackedConvPoolOp variant)."""
    if spec is None:
        spec = build_spec(cfg)
    use_l2norm = cfg.model.backbone == "vgg16"
    if cfg.model.backbone == "resnet50":
        if batch_stats is None:
            raise ValueError("resnet50 quantization needs batch_stats to fold BN")
        params = fold_resnet50(params, batch_stats)
    scales = calibrate_scales(params, spec, calibration_batches, use_l2norm)
    return quantize_params(params, spec, scales), spec


def int8_forward(
    qp: QuantParams,
    spec: Spec,
    cfg: DetectorConfig,
    images: Array,
    int8_heads: bool = True,
    input_hwcn: bool = False,
    concat_heads: bool = True,
) -> Tuple[Array, Array]:
    """Normalized float images -> (cls_logits, box_offsets), int8 trunk.

    input_hwcn: images staged (S, S, 3, B) — see run_int8.
    concat_heads=False (int8 heads only): per-level native-layout tuples
    for postprocess_levels."""
    if int8_heads:
        taps_q = run_int8(
            qp, spec, images, dequantize_taps=False, input_hwcn=input_hwcn
        )
        logits_dtype = (
            jnp.bfloat16 if cfg.eval.int8_logits_bf16 else jnp.float32
        )
        return apply_heads_int8(
            qp, taps_q, cfg, logits_dtype=logits_dtype, concat=concat_heads
        )
    taps = run_int8(qp, spec, images, input_hwcn=input_hwcn)
    return apply_heads(qp.float_params, taps, cfg)


def float_forward(
    params: Dict[str, Any], spec: Spec, cfg: DetectorConfig, images: Array,
    compute_dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Reference float path through the same spec (parity oracle)."""
    taps, _ = run_float(params, spec, images, compute_dtype)
    return apply_heads(params, taps, cfg, dtype=compute_dtype)


# --------------------------------------------------------------------------
# RetinaNet: int8 ResNet trunk + int8 FPN + int8 shared heads
# --------------------------------------------------------------------------
#
# r3 (VERDICT r2 item #5): the FPN and the shared 4-conv heads are ~77% of
# RetinaNet's FLOPs (the head subnets run at every pyramid level); leaving
# them float capped the family at 951 img/s/chip. The int8 dataflow:
#
#   laterals (1x1, int8) -> f32 upsample-adds (exact) -> requant ->
#   smooths (3x3, int8) -> requant -> P3..P5 ; P6/P7 stride-2 int8 convs
#   (relu on int8 codes — requant is monotone) ; heads: shared int8
#   weights, PER-LEVEL activation scales for every intermediate, final
#   out-conv emits f32 logits (no requant — full head quality).
#
# The float calibration runner below mirrors this dataflow node-for-node
# and is parity-tested against the flax modules, so absmax is recorded at
# exactly the tensors the int8 path requants.

_FPN_LEVELS = ("P3", "P4", "P5", "P6", "P7")


def _fpn_upsample2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def fpn_head_conv_paths(cfg: DetectorConfig) -> List[str]:
    """Every conv param path of the FPN + shared heads (weight-quant set)."""
    paths = [f"fpn/lateral{i}" for i in (3, 4, 5)]
    paths += [f"fpn/smooth{i}" for i in (3, 4, 5)]
    paths += ["fpn/p6", "fpn/p7"]
    for head in ("cls_head", "box_head"):
        paths += [f"{head}/conv{i}" for i in range(cfg.model.head_depth)]
        paths.append(f"{head}/out")
    return paths


def run_float_fpn_heads(
    params: Dict[str, Any], cfg: DetectorConfig, taps: List[Array],
) -> Tuple[Array, Array, Dict[str, Array]]:
    """Float FPN + heads mirroring the int8 dataflow; returns
    (cls_logits, box_offsets, absmax-at-every-requant-point).

    Numerically identical (f32) to the flax FPN/RetinaNetHead modules —
    parity-tested in tests/test_quant.py."""
    absmax: Dict[str, Array] = {}

    def conv(x, path, stride=1, k=None):
        p = _get_path(params, path)
        op = ConvOp(path, kernel=k or p["kernel"].shape[0], stride=stride)
        y = _conv(x, p["kernel"].astype(jnp.float32), op, jnp.float32)
        return y + p["bias"].astype(jnp.float32)

    c3, c4, c5 = [t.astype(jnp.float32) for t in taps]
    pre5 = conv(c5, "fpn/lateral5")
    pre4 = conv(c4, "fpn/lateral4") + _fpn_upsample2x(pre5)
    pre3 = conv(c3, "fpn/lateral3") + _fpn_upsample2x(pre4)
    pres = {"P3": pre3, "P4": pre4, "P5": pre5}
    pyramid: Dict[str, Array] = {}
    for lvl in ("P3", "P4", "P5"):
        absmax[f"fpn/pre{lvl[1]}"] = jnp.max(jnp.abs(pres[lvl]))
        pyramid[lvl] = conv(pres[lvl], f"fpn/smooth{lvl[1]}")
    p6 = conv(c5, "fpn/p6", stride=2)
    pyramid["P6"] = p6
    pyramid["P7"] = conv(jnp.maximum(p6, 0.0), "fpn/p7", stride=2)
    for lvl in _FPN_LEVELS:
        absmax[f"fpn/{lvl}"] = jnp.max(jnp.abs(pyramid[lvl]))

    outs = {"cls_head": [], "box_head": []}
    for head in ("cls_head", "box_head"):
        n_out = cfg.model.num_classes if head == "cls_head" else 4
        for lvl in _FPN_LEVELS:
            x = pyramid[lvl]
            for i in range(cfg.model.head_depth):
                x = jnp.maximum(conv(x, f"{head}/conv{i}"), 0.0)
                absmax[f"{head}/conv{i}@{lvl}"] = jnp.max(jnp.abs(x))
            y = conv(x, f"{head}/out")
            b, h, w, _ = y.shape
            outs[head].append(y.reshape(b, h * w * 9, n_out))
    return (
        jnp.concatenate(outs["cls_head"], axis=1),
        jnp.concatenate(outs["box_head"], axis=1),
        absmax,
    )


def run_int8_fpn_heads(
    qp: QuantParams, cfg: DetectorConfig, taps_q: List[Tuple[Array, float]],
    logits_dtype=jnp.float32,
    concat: bool = True,
) -> Tuple[Array, Array]:
    """Int8 FPN + shared heads over int8 trunk taps (see section comment).
    concat=False returns per-level native-layout (B, H, W, 9*n) tuples for
    the per-level postprocess (same rationale as apply_heads_int8)."""
    sc = qp.act_scale

    def conv_f32(x_q, s_in, path, stride=1):
        op = ConvOp(path, kernel=qp.w_int8[path].shape[0], stride=stride)
        acc = _conv(x_q, jnp.asarray(qp.w_int8[path]), op, jnp.int32)
        deq = s_in * jnp.asarray(qp.w_scale[path])
        return acc.astype(jnp.float32) * deq + jnp.asarray(qp.bias[path])

    def requant(y, key):
        s = sc[key]
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8), s

    (q3, s3), (q4, s4), (q5, s5) = taps_q
    pre5 = conv_f32(q5, s5, "fpn/lateral5")
    pre4 = conv_f32(q4, s4, "fpn/lateral4") + _fpn_upsample2x(pre5)
    pre3 = conv_f32(q3, s3, "fpn/lateral3") + _fpn_upsample2x(pre4)
    pyramid: Dict[str, Tuple[Array, float]] = {}
    for lvl, pre in (("P3", pre3), ("P4", pre4), ("P5", pre5)):
        q_pre, s_pre = requant(pre, f"fpn/pre{lvl[1]}")
        pyramid[lvl] = requant(
            conv_f32(q_pre, s_pre, f"fpn/smooth{lvl[1]}"), f"fpn/{lvl}"
        )
    q_p6, s_p6 = requant(conv_f32(q5, s5, "fpn/p6", stride=2), "fpn/P6")
    pyramid["P6"] = (q_p6, s_p6)
    # relu commutes with the (monotone, sign-preserving) requant: apply it
    # on the int8 codes and feed p7's conv directly.
    pyramid["P7"] = requant(
        conv_f32(jnp.maximum(q_p6, 0), s_p6, "fpn/p7", stride=2), "fpn/P7"
    )

    outs = {"cls_head": [], "box_head": []}
    for head in ("cls_head", "box_head"):
        n_out = cfg.model.num_classes if head == "cls_head" else 4
        for lvl in _FPN_LEVELS:
            x_q, s_x = pyramid[lvl]
            for i in range(cfg.model.head_depth):
                y = jnp.maximum(conv_f32(x_q, s_x, f"{head}/conv{i}"), 0.0)
                x_q, s_x = requant(y, f"{head}/conv{i}@{lvl}")
            y = conv_f32(x_q, s_x, f"{head}/out")
            if head == "cls_head":
                # bf16 cast fuses into the out-conv epilogue (see
                # apply_heads_int8); box offsets stay f32.
                y = y.astype(logits_dtype)
            if not concat:
                outs[head].append(y)
                continue
            b, h, w, _ = y.shape
            outs[head].append(y.reshape(b, h * w * 9, n_out))
    if not concat:
        return tuple(outs["cls_head"]), tuple(outs["box_head"])
    return (
        jnp.concatenate(outs["cls_head"], axis=1),
        jnp.concatenate(outs["box_head"], axis=1),
    )


def quantize_retinanet(
    cfg: DetectorConfig,
    variables: Dict[str, Any],
    calibration_batches: Sequence[Array],
    quantize_fpn_heads: bool = True,
) -> Tuple[QuantParams, Spec]:
    """PTQ for RetinaNet: BN-fold + quantize trunk AND (by default) the
    FPN + shared heads (r3; the float-FPN fallback remains available with
    quantize_fpn_heads=False)."""
    params = variables["params"]
    spec = build_resnet_trunk_spec()
    folded = fold_resnet50(params, variables["batch_stats"])

    agg: Dict[str, float] = {}

    def probe(p, im):
        taps, absmax = run_float(p, spec, im)
        if quantize_fpn_heads:
            _, _, fpn_absmax = run_float_fpn_heads(p, cfg, taps)
            absmax = {**absmax, **fpn_absmax}
        return absmax

    run = jax.jit(probe)
    for images in calibration_batches:
        for key, val in jax.device_get(run(folded, images)).items():
            agg[key] = max(agg.get(key, 0.0), float(val))
    scales = {k: max(v, 1e-6) / 127.0 for k, v in agg.items()}

    qp = quantize_params(folded, spec, scales, quantize_heads=False)
    if quantize_fpn_heads:
        for path in fpn_head_conv_paths(cfg):
            w_q, s, b = _quantize_kernel(_get_path(folded, path))
            qp.w_int8[path], qp.w_scale[path], qp.bias[path] = w_q, s, b
    return qp, spec


def retinanet_int8_forward(
    qp: QuantParams, spec: Spec, cfg: DetectorConfig, images: Array,
    dtype=jnp.bfloat16,
    concat_heads: bool = True,
) -> Tuple[Array, Array]:
    """Normalized float images -> (cls_logits, box_offsets).

    Runs the int8 FPN/heads when their weights are present in `qp`
    (default quantize_retinanet output), else the float flax modules over
    dequantized taps (legacy r1/r2 path). concat_heads=False (int8
    FPN/heads only): per-level native tuples for postprocess_levels."""
    if "fpn/lateral3" in qp.w_int8:
        taps_q = run_int8(qp, spec, images, dequantize_taps=False)
        logits_dtype = (
            jnp.bfloat16 if cfg.eval.int8_logits_bf16 else jnp.float32
        )
        return run_int8_fpn_heads(
            qp, cfg, taps_q, logits_dtype=logits_dtype, concat=concat_heads
        )

    from object_detector_tpu.models.retinanet import FPN, RetinaNetHead

    taps = run_int8(qp, spec, images, dequantize_taps=True)
    p = qp.float_params
    pyramid = FPN(channels=cfg.model.fpn_channels, compute_dtype=dtype).apply(
        {"params": p["fpn"]}, [t.astype(dtype) for t in taps]
    )
    cls_head = RetinaNetHead(
        num_anchors=9, num_outputs=cfg.model.num_classes,
        depth=cfg.model.head_depth, channels=cfg.model.fpn_channels,
        use_class_bias=True, compute_dtype=dtype,
    )
    box_head = RetinaNetHead(
        num_anchors=9, num_outputs=4,
        depth=cfg.model.head_depth, channels=cfg.model.fpn_channels,
        compute_dtype=dtype,
    )
    cls = [
        cls_head.apply({"params": p["cls_head"]}, lv).astype(jnp.float32)
        for lv in pyramid
    ]
    box = [
        box_head.apply({"params": p["box_head"]}, lv).astype(jnp.float32)
        for lv in pyramid
    ]
    return jnp.concatenate(cls, axis=1), jnp.concatenate(box, axis=1)
