"""FPN + RetinaNet-style detector (BASELINE config #5).

ResNet-50 C3/C4/C5 -> FPN P3..P7 (arXiv:1612.03144), shared 4-conv
classification and regression heads over all levels with 9 anchors per
location (arXiv:1708.02002). Output contract identical to SSDModel:
(B, A_total, C) sigmoid logits + (B, A_total, 4) offsets, matching
anchors/priors.retinanet_anchors ordering (levels in stride order 8..128).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.models.resnet import ResNet50Backbone
from object_detector_tpu.models.ssd import _class_bias_init

Array = jnp.ndarray


class FPN(nn.Module):
    """Top-down feature pyramid: [C3, C4, C5] -> [P3..P7]."""

    channels: int = 256
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[Array]) -> List[Array]:
        c3, c4, c5 = feats
        lat = lambda i, x: nn.Conv(  # noqa: E731
            self.channels, (1, 1), dtype=self.compute_dtype, name=f"lateral{i}"
        )(x)
        smooth = lambda i, x: nn.Conv(  # noqa: E731
            self.channels, (3, 3), padding="SAME", dtype=self.compute_dtype,
            name=f"smooth{i}",
        )(x)

        p5 = lat(5, c5)
        p4 = lat(4, c4) + _upsample2x(p5)
        p3 = lat(3, c3) + _upsample2x(p4)
        p3, p4, p5 = smooth(3, p3), smooth(4, p4), smooth(5, p5)
        # P6/P7 from C5 via stride-2 convs (RetinaNet §4 variant).
        p6 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.compute_dtype, name="p6")(c5)
        p7 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.compute_dtype, name="p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]


def _upsample2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample, NHWC — pure reshape/broadcast (cheap
    on TPU; no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class RetinaNetHead(nn.Module):
    """Shared 4-conv subnet applied to every pyramid level."""

    num_anchors: int
    num_outputs: int  # num_classes for cls subnet, 4 for box subnet
    depth: int = 4
    channels: int = 256
    use_class_bias: bool = False
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.depth):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding="SAME",
                        dtype=self.compute_dtype, name=f"conv{i}")(x)
            )
        bias = _class_bias_init if self.use_class_bias else nn.initializers.zeros_init()
        out = nn.Conv(
            self.num_anchors * self.num_outputs, (3, 3), padding="SAME",
            dtype=self.compute_dtype, bias_init=bias, name="out",
        )(x)
        b, h, w, _ = out.shape
        return out.reshape(b, h * w * self.num_anchors, self.num_outputs)


class RetinaNetModel(nn.Module):
    """ResNet-50 + FPN + shared heads. Same output contract as SSDModel."""

    config: DetectorConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False) -> Tuple[Array, Array]:
        cfg = self.config
        dtype = jnp.dtype(cfg.model.compute_dtype)
        feats = ResNet50Backbone(compute_dtype=dtype, name="backbone")(
            images.astype(dtype), train=train
        )
        pyramid = FPN(channels=cfg.model.fpn_channels, compute_dtype=dtype,
                      name="fpn")(feats)
        cls_head = RetinaNetHead(
            num_anchors=9, num_outputs=cfg.model.num_classes,
            depth=cfg.model.head_depth, channels=cfg.model.fpn_channels,
            use_class_bias=True, compute_dtype=dtype, name="cls_head",
        )
        box_head = RetinaNetHead(
            num_anchors=9, num_outputs=4,
            depth=cfg.model.head_depth, channels=cfg.model.fpn_channels,
            compute_dtype=dtype, name="box_head",
        )
        cls_out = [cls_head(p).astype(jnp.float32) for p in pyramid]
        box_out = [box_head(p).astype(jnp.float32) for p in pyramid]
        return jnp.concatenate(cls_out, axis=1), jnp.concatenate(box_out, axis=1)


def build_model(cfg: DetectorConfig) -> nn.Module:
    """Factory: config -> flax module (SSD or RetinaNet family)."""
    if cfg.model.family == "retinanet":
        return RetinaNetModel(cfg)
    from object_detector_tpu.models.ssd import SSDModel

    return SSDModel(cfg)
