"""CLI: convert a torchvision backbone state_dict into a framework
checkpoint-ready .npz (SURVEY.md §2 component #14).

    python -m object_detector_tpu.cli.convert_weights \
        --backbone vgg16 --src vgg16-imagenet.pth --dst vgg16_backbone.npz

The output .npz stores flattened "path/to/leaf" -> array entries that
`load_backbone_npz` re-nests and `inject_backbone` grafts into a model's
param tree at init.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten_tree(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def load_backbone_npz(path: str) -> Dict[str, Any]:
    blob = np.load(path)
    params = {k[len("params:"):]: blob[k] for k in blob.files if k.startswith("params:")}
    stats = {k[len("stats:"):]: blob[k] for k in blob.files if k.startswith("stats:")}
    return {
        "params": unflatten_tree(params),
        "batch_stats": unflatten_tree(stats) if stats else {},
    }


def main(argv=None) -> int:
    from object_detector_tpu.utils.weights import (
        load_torch_state_dict,
        resnet50_from_torch,
        vgg16_from_torch,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--backbone", required=True, choices=["vgg16", "resnet50"])
    p.add_argument("--src", required=True, help="torch .pth/.pt or .npz state_dict")
    p.add_argument("--dst", required=True, help="output .npz")
    p.add_argument(
        "--no-validate", action="store_true",
        help="skip the canonical torchvision key/shape check (non-standard dicts)",
    )
    args = p.parse_args(argv)

    state = load_torch_state_dict(args.src)
    if not args.no_validate:
        from object_detector_tpu.utils.weights import validate_torch_state_dict

        validate_torch_state_dict(state, args.backbone, allow_missing_fc=True)
    if args.backbone == "vgg16":
        params, stats = vgg16_from_torch(state), {}
    else:
        params, stats = resnet50_from_torch(state)

    payload = {f"params:{k}": v for k, v in flatten_tree(params).items()}
    payload.update({f"stats:{k}": v for k, v in flatten_tree(stats).items()})
    np.savez(args.dst, **payload)
    print(f"wrote {len(payload)} arrays -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
