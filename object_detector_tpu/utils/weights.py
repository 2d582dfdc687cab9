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
    param tree (params['backbone'] subtree), shape-checked."""
    import jax

    tgt = dict(params["backbone"])
    for name, sub in backbone_params.items():
        if name not in tgt:
            raise KeyError(f"backbone layer {name!r} missing from model params")
        for k, v in sub.items():
            want = np.asarray(jax.tree.leaves({k: tgt[name][k]})[0]).shape
            if tuple(v.shape) != tuple(want):
                raise ValueError(f"{name}.{k}: shape {v.shape} != model {want}")
        merged = dict(tgt[name])
        merged.update({k: np.asarray(v) for k, v in sub.items()})
        tgt[name] = merged
    out = dict(params)
    out["backbone"] = tgt
    return out
