"""VGG16 backbone with SSD modifications — flax.linen, NHWC (TPU-native).

SSD paper §3: VGG16 through conv5_3, pool5 changed to 3x3/stride-1, fc6/fc7
converted to dilated 3x3x1024 and 1x1x1024 convs. Taps: conv4_3 (38² at 300)
and fc7 (19²). L2Norm rescales the conv4_3 tap (ParseNet trick).

Reference citation: unavailable (SURVEY.md §0 — /root/reference empty);
architecture follows arXiv:1512.02325 and the BASELINE.json contract
("VGG/ResNet convolutional backbone and multi-scale detection heads").
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class L2Norm(nn.Module):
    """Channelwise L2 normalization with learned per-channel scale."""

    init_scale: float = 20.0
    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale",
            lambda _, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (x.shape[-1],),
        )
        # Accumulate the channel sum-of-squares in f32 (bf16 would overflow
        # precision over 512 channels) but keep the tensor-wide math in the
        # compute dtype — no f32 materialization of the activation.
        sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
        inv = jax.lax.rsqrt(sq + self.epsilon).astype(x.dtype)
        return x * inv * scale.astype(x.dtype)


class _PairConv(nn.Module):
    """3x3 SAME conv on image PAIRS packed in channels: input
    (B/2, H, W, 2*Cin) -> output (B/2, H, W, 2*features).

    Why: at C=64 bf16, block-1 tensors half-fill the 128-lane TPU tiles
    and the convs run HBM-bound at ~310 GB/s (train profile). Packing
    pairs doubles the channel dim to a full tile. The parameters are the
    CANONICAL (3,3,Cin,features) kernel + (features,) bias — identical
    pytree to nn.Conv, so checkpoints are interchangeable between packed
    and plain modes — and the block-diagonal expansion happens on the
    fly. Numerically equivalent to the plain conv: the MAC set per
    output is identical (the off-diagonal blocks contribute exact 0.0
    terms), but XLA's accumulation tree over the wider channel dim may
    reassociate the nonzero terms, so outputs can drift by ~1 ULP
    (tests pin rtol=1e-5 forward / 1e-4 grads).
    """

    features: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        cin = xp.shape[-1] // 2
        f = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, f),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        k = kernel.astype(self.compute_dtype)
        kp = jnp.zeros((3, 3, 2 * cin, 2 * f), self.compute_dtype)
        kp = kp.at[:, :, :cin, :f].set(k).at[:, :, cin:, f:].set(k)
        dn = jax.lax.conv_dimension_numbers(
            xp.shape, kp.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xp.astype(self.compute_dtype), kp, (1, 1), "SAME",
            dimension_numbers=dn,
        )
        return y + jnp.concatenate([bias, bias]).astype(self.compute_dtype)


class VGG16Backbone(nn.Module):
    """VGG16 (SSD-modified). Returns [conv4_3, fc7] feature maps, NHWC."""

    compute_dtype: Any = jnp.bfloat16
    pack_block1: bool = False
    pool_grad_kernel: bool = False
    remat_block1: bool = False

    def _pool(self):
        # reduce_window + select_and_scatter backward (3.6 ms/step) is the
        # MEASURED best at every level tried: XLA rewrites lost (6D mask:
        # 9.1 ms, lane-half pairwise max: +26 ms) and the Pallas
        # first-max kernel lost 0.12-0.44x isolated
        # (chip_logs/pool_bwd_ab.log) — see ops/pooling.py STATUS.
        # pool_grad_kernel keeps the kernel selectable (bitwise-identical
        # gradients, same reduce_window forward).
        if self.pool_grad_kernel:
            from object_detector_tpu.ops.pooling import max_pool_2x2_fastgrad

            return max_pool_2x2_fastgrad
        return lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

    def _block1(self, x: Array) -> Array:
        """Block 1 (conv1_1 + conv1_2 + pool1), separable so it can run
        under nn.remat — its activations are the largest live train-step
        buffers (2x (B, S, S, 64)); param names stay canonical because the
        method shares the module's scope."""
        pool = self._pool()
        # Image-pair packed (full 128-lane tiles) when enabled and the
        # batch is even; pairing first-half/second-half so the post-pool
        # unpack restores the original batch order exactly.
        if self.pack_block1 and x.shape[0] % 2 == 0:
            half = x.shape[0] // 2
            xb = jnp.concatenate([x[:half], x[half:]], axis=-1)
            xb = nn.relu(_PairConv(64, self.compute_dtype, name="conv1_1")(xb))
            xb = nn.relu(_PairConv(64, self.compute_dtype, name="conv1_2")(xb))
            xb = pool(xb)
            return jnp.concatenate([xb[..., :64], xb[..., 64:]], axis=0)
        conv = lambda c, name: nn.Conv(  # noqa: E731
            c, (3, 3), padding="SAME", dtype=self.compute_dtype, name=name
        )
        x = nn.relu(conv(64, "conv1_1")(x))
        x = nn.relu(conv(64, "conv1_2")(x))
        return pool(x)

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        conv = lambda c, name, **kw: nn.Conv(  # noqa: E731
            c, (3, 3), padding="SAME", dtype=self.compute_dtype, name=name, **kw
        )
        pool = self._pool()

        x = x.astype(self.compute_dtype)
        if self.remat_block1:
            x = nn.remat(VGG16Backbone._block1)(self, x)
        else:
            x = self._block1(x)
        x = nn.relu(conv(128, "conv2_1")(x))
        x = nn.relu(conv(128, "conv2_2")(x))
        x = pool(x)
        x = nn.relu(conv(256, "conv3_1")(x))
        x = nn.relu(conv(256, "conv3_2")(x))
        x = nn.relu(conv(256, "conv3_3")(x))
        # ceil-mode pool3 (keeps 75 -> 38 at input 300): pad to even first.
        # Constant dtype-min pad (not edge): same max-pool output, but the
        # pad lowers to lax.pad whose transpose is a slice — edge mode
        # lowers to concatenate + add_any (~1 ms/step in the backward,
        # chip_logs/train_profile.log) and introduces gradient ties.
        if x.shape[1] % 2 == 1:
            x = jnp.pad(
                x,
                ((0, 0), (0, 1), (0, 1), (0, 0)),
                constant_values=jnp.finfo(x.dtype).min,
            )
        x = pool(x)
        # Block 4
        x = nn.relu(conv(512, "conv4_1")(x))
        x = nn.relu(conv(512, "conv4_2")(x))
        x = nn.relu(conv(512, "conv4_3")(x))
        conv4_3 = x
        x = pool(x)
        # Block 5 (stride-1 pool afterwards)
        x = nn.relu(conv(512, "conv5_1")(x))
        x = nn.relu(conv(512, "conv5_2")(x))
        x = nn.relu(conv(512, "conv5_3")(x))
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        # fc6: dilated 3x3, fc7: 1x1 (SSD §3 "atrous" conversion).
        x = nn.relu(
            nn.Conv(
                1024, (3, 3), padding="SAME", kernel_dilation=(6, 6),
                dtype=self.compute_dtype, name="fc6",
            )(x)
        )
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.compute_dtype, name="fc7")(x))
        return [conv4_3, x]


class SSDExtraLayers(nn.Module):
    """Stride-2 pyramid after fc7: conv8..conv11 (300) / conv8..conv12 (512).

    Each block: 1x1 bottleneck then 3x3 stride-2 (or VALID 3x3 for the last
    maps), per SSD paper fig. 2.
    """

    # (bottleneck, out, stride, padding) per extra block.
    blocks: Tuple[Tuple[int, int, int, str], ...] = (
        (256, 512, 2, "SAME"),
        (128, 256, 2, "SAME"),
        (128, 256, 1, "VALID"),
        (128, 256, 1, "VALID"),
    )
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats: List[Array] = []
        for i, (mid, out, stride, pad) in enumerate(self.blocks):
            x = nn.relu(
                nn.Conv(mid, (1, 1), dtype=self.compute_dtype, name=f"conv{8+i}_1")(x)
            )
            x = nn.relu(
                nn.Conv(
                    out, (3, 3), strides=(stride, stride), padding=pad,
                    dtype=self.compute_dtype, name=f"conv{8+i}_2",
                )(x)
            )
            feats.append(x)
        return feats


SSD300_EXTRAS = SSDExtraLayers.blocks.default if hasattr(SSDExtraLayers.blocks, "default") else None

# SSD-512 uses one more stride-2 block and a final 4x4->1 reduction.
SSD512_EXTRA_BLOCKS: Tuple[Tuple[int, int, int, str], ...] = (
    (256, 512, 2, "SAME"),
    (128, 256, 2, "SAME"),
    (128, 256, 2, "SAME"),
    (128, 256, 2, "SAME"),
    (128, 256, 2, "SAME"),
)
