"""ResNet-50 backbone — flax.linen, NHWC, bottleneck-v1.5 (stride on 3x3).

Returns the C3/C4/C5 pyramid (strides 8/16/32) used by both the SSD-512
heads and the FPN/RetinaNet variant (BASELINE configs #3, #5). BatchNorm
statistics live in the `batch_stats` collection; inference uses running
stats (use_running_average=True).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class BottleneckBlock(nn.Module):
    filters: int  # bottleneck width; output is 4x
    stride: int = 1
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.compute_dtype, name=name,
        )
        out = nn.Conv(self.filters, (1, 1), use_bias=False,
                      dtype=self.compute_dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding="SAME", use_bias=False,
                      dtype=self.compute_dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                      dtype=self.compute_dtype, name="conv3")(out)
        out = norm("bn3")(out)

        shortcut = x
        if x.shape[-1] != self.filters * 4 or self.stride != 1:
            shortcut = nn.Conv(
                self.filters * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.compute_dtype, name="proj",
            )(x)
            shortcut = norm("bn_proj")(shortcut)
        return nn.relu(out + shortcut)


class ResNet50Backbone(nn.Module):
    """ResNet-50. Returns [C3, C4, C5] (strides 8, 16, 32)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.compute_dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.compute_dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats: List[Array] = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(n_blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = BottleneckBlock(
                    width, stride, self.compute_dtype,
                    name=f"stage{stage+1}_block{block+1}",
                )(x, train=train)
            if stage >= 1:  # C3, C4, C5
                feats.append(x)
        return feats
