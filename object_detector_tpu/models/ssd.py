"""SSD detector assembly: backbone + extra layers + multi-scale heads.

Output contract (SURVEY.md §3.4): concatenated over levels,
  cls_logits: (B, num_anchors, num_classes)   — sigmoid one-vs-all
  box_offsets: (B, num_anchors, 4)            — SSD-encoded regression

Variants:
  - SSD-300 / VGG16:   taps conv4_3 (L2Norm'd), fc7 + 4 extra blocks  -> 6 levels
  - SSD-512 / ResNet50: taps C3, C4, C5 + 4 extra blocks              -> 7 levels

NHWC throughout; conv stacks run in bfloat16, logits cast to float32 at the
boundary. Head class-bias initialized to -log((1-p)/p), p=0.01 (RetinaNet
§4.1 trick) so early training isn't swamped by background loss.
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.models.resnet import ResNet50Backbone
from object_detector_tpu.models.vgg import L2Norm, SSDExtraLayers, VGG16Backbone

Array = jnp.ndarray

_PRIOR_P = 0.01


def _class_bias_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.full(shape, -math.log((1.0 - _PRIOR_P) / _PRIOR_P), dtype)


class PredictionHead(nn.Module):
    """Per-level 3x3 conv heads -> flattened (HW*A, C) / (HW*A, 4)."""

    num_anchors: int
    num_classes: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        b, h, w, _ = x.shape
        cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            dtype=self.compute_dtype, bias_init=_class_bias_init, name="cls",
        )(x)
        box = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME",
            dtype=self.compute_dtype, name="box",
        )(x)
        cls = cls.reshape(b, h * w * self.num_anchors, self.num_classes)
        box = box.reshape(b, h * w * self.num_anchors, 4)
        return cls.astype(jnp.float32), box.astype(jnp.float32)


class SSDModel(nn.Module):
    """Full SSD forward. `train` toggles BatchNorm mode (ResNet only)."""

    config: DetectorConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False) -> Tuple[Array, Array]:
        cfg = self.config
        dtype = jnp.dtype(cfg.model.compute_dtype)
        x = images.astype(dtype)

        if cfg.model.backbone == "vgg16":
            taps = VGG16Backbone(
                compute_dtype=dtype,
                pack_block1=cfg.model.pack_block1,
                pool_grad_kernel=cfg.model.pool_grad_kernel,
                remat_block1=cfg.model.remat_block1,
                name="backbone",
            )(x)
            taps[0] = L2Norm(init_scale=cfg.model.l2norm_scale, name="l2norm")(taps[0])
            trunk = taps[-1]
        elif cfg.model.backbone == "resnet50":
            taps = ResNet50Backbone(compute_dtype=dtype, name="backbone")(x, train=train)
            trunk = taps[-1]
        else:
            raise ValueError(f"unknown backbone {cfg.model.backbone!r}")

        n_extra = len(cfg.anchors.feature_sizes) - len(taps)
        if n_extra > 0:
            # SSD-300: (256,512,s2,SAME),(128,256,s2,SAME),(128,256,s1,VALID)x2
            # SSD-512 tail: stride-2 SAME blocks down to 1x1.
            if cfg.model.image_size >= 512:
                blocks = (((256, 512, 2, "SAME"),) + ((128, 256, 2, "SAME"),) * (n_extra - 1))
            else:
                blocks = (
                    (256, 512, 2, "SAME"),
                    (128, 256, 2, "SAME"),
                    (128, 256, 1, "VALID"),
                    (128, 256, 1, "VALID"),
                )[:n_extra]
            extra_feats = SSDExtraLayers(
                blocks=blocks, compute_dtype=dtype, name="extras"
            )(trunk)
            taps = taps + extra_feats

        expected = tuple(cfg.anchors.feature_sizes)
        got = tuple(t.shape[1] for t in taps)
        if got != expected:
            raise ValueError(
                f"feature pyramid mismatch: model produced {got}, anchors expect {expected}"
            )

        cls_out: List[Array] = []
        box_out: List[Array] = []
        for level, (feat, a) in enumerate(zip(taps, cfg.anchors.anchors_per_level)):
            c, bx = PredictionHead(
                num_anchors=a, num_classes=cfg.model.num_classes,
                compute_dtype=dtype, name=f"head{level}",
            )(feat)
            cls_out.append(c)
            box_out.append(bx)
        return jnp.concatenate(cls_out, axis=1), jnp.concatenate(box_out, axis=1)
