"""Pretrained-backbone weight import (SURVEY.md §2 component #14).

The reference initialized backbones from ImageNet weights. This environment
has no network (SURVEY.md §7 hard part #4), so pretrained init is an
external artifact: this module converts a torchvision ``state_dict`` (torch
is baked into the image; weights must be supplied as a local .pth/.npz) into
our flax param pytrees. Scratch training stays fully supported.

Layouts: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O). When the
state_dict carries VGG classifier weights, fc6/fc7 are derived via the
SSD atrous-subsampling recipe (the SSD paper's fc-to-conv conversion):
fc6 Linear(25088->4096) -> reshape (4096,512,7,7), decimate outputs x4
and spatial 7->3 (stride 3; dilation-6 conv covers the original taps);
fc7 Linear(4096->4096) -> 1x1 conv decimated x4 on both sides.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


_VGG_FEATURE_IDX = {  # torchvision vgg16.features index -> our layer name
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def vgg16_from_torch(state: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg16 state_dict -> VGG16Backbone params. The conv
    stack converts directly; fc6/fc7 convert from the classifier weights
    when present (SSD atrous subsampling), else stay randomly
    initialized."""
    out: Dict[str, Any] = {}
    for idx, name in _VGG_FEATURE_IDX.items():
        w = np.asarray(state[f"features.{idx}.weight"])
        b = np.asarray(state[f"features.{idx}.bias"])
        out[name] = {"kernel": _t(w), "bias": b}
    if "classifier.0.weight" in state:
        # fc6: (4096, 25088) -> (4096, 512, 7, 7) -> decimate out x4,
        # spatial 7->3 with stride 3 ([0,3,6] — matched by dilation=6 on a
        # 19x19 grid), -> (3,3,512,1024).
        w6 = np.asarray(state["classifier.0.weight"]).reshape(4096, 512, 7, 7)
        w6 = w6[::4, :, ::3, ::3]
        out["fc6"] = {
            "kernel": _t(w6),
            "bias": np.asarray(state["classifier.0.bias"])[::4],
        }
    if "classifier.3.weight" in state:
        # fc7: (4096, 4096) -> 1x1 conv decimated x4 on both sides.
        w7 = np.asarray(state["classifier.3.weight"])[::4, ::4]
        out["fc7"] = {
            "kernel": w7.T[None, None],  # (1, 1, 1024, 1024)
            "bias": np.asarray(state["classifier.3.bias"])[::4],
        }
    return out


def _bn(state: Mapping[str, np.ndarray], prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": np.asarray(state[f"{prefix}.weight"]),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(state[f"{prefix}.running_mean"]),
        "var": np.asarray(state[f"{prefix}.running_var"]),
    }
    return params, stats


def resnet50_from_torch(
    state: Mapping[str, np.ndarray],
) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet50 state_dict -> (params, batch_stats) for
    ResNet50Backbone."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem_conv"] = {"kernel": _t(np.asarray(state["conv1.weight"]))}
    params["stem_bn"], stats["stem_bn"] = _bn(state, "bn1")

    stage_sizes = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            src = f"layer{stage+1}.{block}"
            dst = f"stage{stage+1}_block{block+1}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {
                    "kernel": _t(np.asarray(state[f"{src}.conv{i}.weight"]))
                }
                p[f"bn{i}"], s[f"bn{i}"] = _bn(state, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in state:
                p["proj"] = {
                    "kernel": _t(np.asarray(state[f"{src}.downsample.0.weight"]))
                }
                p["bn_proj"], s["bn_proj"] = _bn(state, f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s
    return params, stats


# ---------------------------------------------------------------------------
# Canonical torchvision state_dict inventories (public, stable since 2017).
#
# No network in this environment means no real .pth has ever been through the
# converters; these hard-coded key+shape inventories are the defense: the
# validator fails loudly on any layout drift, and the test fixtures are built
# FROM this inventory, so they are provably key-exact (VERDICT r2 item #7).
# ---------------------------------------------------------------------------

def torchvision_state_dict_shapes(arch: str) -> Dict[str, tuple]:
    """Full key -> shape inventory of a torchvision ImageNet state_dict.

    vgg16: torchvision.models.vgg16() — 13 convs in `features` (indices
    interleaved with ReLU/MaxPool), 3 linears in `classifier`.
    resnet50: torchvision.models.resnet50() — stem + 4 bottleneck stages
    (3/4/6/3 blocks, expansion 4) + fc. `num_batches_tracked` BN buffers
    (int64 scalars, present since torch 0.4) are included with shape ().
    """
    shapes: Dict[str, tuple] = {}
    if arch == "vgg16":
        chans = {
            0: (64, 3), 2: (64, 64),
            5: (128, 64), 7: (128, 128),
            10: (256, 128), 12: (256, 256), 14: (256, 256),
            17: (512, 256), 19: (512, 512), 21: (512, 512),
            24: (512, 512), 26: (512, 512), 28: (512, 512),
        }
        for idx, (o, i) in chans.items():
            shapes[f"features.{idx}.weight"] = (o, i, 3, 3)
            shapes[f"features.{idx}.bias"] = (o,)
        for idx, (o, i) in {0: (4096, 25088), 3: (4096, 4096), 6: (1000, 4096)}.items():
            shapes[f"classifier.{idx}.weight"] = (o, i)
            shapes[f"classifier.{idx}.bias"] = (o,)
        return shapes
    if arch == "resnet50":
        def bn(prefix: str, c: int) -> None:
            shapes[f"{prefix}.weight"] = (c,)
            shapes[f"{prefix}.bias"] = (c,)
            shapes[f"{prefix}.running_mean"] = (c,)
            shapes[f"{prefix}.running_var"] = (c,)
            shapes[f"{prefix}.num_batches_tracked"] = ()

        shapes["conv1.weight"] = (64, 3, 7, 7)
        bn("bn1", 64)
        stage_sizes = (3, 4, 6, 3)
        widths = (64, 128, 256, 512)
        in_ch = 64
        for s, (n_blocks, w) in enumerate(zip(stage_sizes, widths), start=1):
            for b in range(n_blocks):
                pre = f"layer{s}.{b}"
                dims = [(w, in_ch if b == 0 else 4 * w, 1), (w, w, 3), (4 * w, w, 1)]
                for i, (o, i_ch, k) in enumerate(dims, start=1):
                    shapes[f"{pre}.conv{i}.weight"] = (o, i_ch, k, k)
                    bn(f"{pre}.bn{i}", o)
                if b == 0:
                    shapes[f"{pre}.downsample.0.weight"] = (4 * w, in_ch, 1, 1)
                    bn(f"{pre}.downsample.1", 4 * w)
            in_ch = 4 * w
        shapes["fc.weight"] = (1000, 2048)
        shapes["fc.bias"] = (1000,)
        return shapes
    raise ValueError(f"unknown arch {arch!r}")


def validate_torch_state_dict(
    state: Mapping[str, np.ndarray], arch: str, allow_missing_fc: bool = False
) -> None:
    """Raise ValueError with a full diff if `state` is not key- and
    shape-identical to the canonical torchvision `arch` state_dict.

    allow_missing_fc tolerates classifier/fc-stripped dicts (feature
    extractors exported without the ImageNet head; for vgg16 the fc6/fc7
    atrous conversion is then skipped by vgg16_from_torch)."""
    want = torchvision_state_dict_shapes(arch)
    got = {k: tuple(np.asarray(v).shape) for k, v in state.items()}
    head_prefixes = ("classifier.", "fc.")
    missing = [
        k for k in want
        if k not in got
        and not (allow_missing_fc and k.startswith(head_prefixes))
    ]
    extra = [k for k in got if k not in want]
    bad_shapes = [
        f"{k}: got {got[k]}, want {want[k]}"
        for k in want
        if k in got and got[k] != want[k] and not k.endswith("num_batches_tracked")
    ]
    if missing or extra or bad_shapes:
        raise ValueError(
            f"state_dict does not match torchvision {arch}:\n"
            f"  missing keys: {sorted(missing)}\n"
            f"  unexpected keys: {sorted(extra)}\n"
            f"  shape mismatches: {bad_shapes}"
        )


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt state_dict (CPU) or an .npz of the same keys."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    return {k: v.numpy() for k, v in blob.items()}


def inject_backbone(params: Dict[str, Any], backbone_params: Dict[str, Any]) -> Dict[str, Any]:
    """Graft converted backbone weights into a freshly-initialized model
    param tree (params['backbone'] subtree), shape-checked at every leaf.
    Recursive, so both VGG's flat layers and ResNet's nested block dicts
    merge correctly; layers absent from the source stay initialized."""

    def merge(tgt: Dict[str, Any], src: Dict[str, Any], where: str) -> Dict[str, Any]:
        out = dict(tgt)
        for name, sub in src.items():
            here = f"{where}/{name}" if where else name
            if name not in tgt:
                raise KeyError(f"backbone layer {here!r} missing from model params")
            if isinstance(sub, dict):
                if not isinstance(tgt[name], dict):
                    raise ValueError(f"{here}: source is a dict, model has a leaf")
                out[name] = merge(tgt[name], sub, here)
            else:
                want = tuple(np.shape(tgt[name]))
                v = np.asarray(sub)
                if tuple(v.shape) != want:
                    raise ValueError(f"{here}: shape {v.shape} != model {want}")
                out[name] = v
        return out

    out = dict(params)
    out["backbone"] = merge(params["backbone"], backbone_params, "")
    return out
