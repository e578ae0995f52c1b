"""ResNet backbone (NHWC Flax) for RetinaNet.

The reference lists RetinaNet as an unchecked TODO (README.md:13-14) with
``models/loss/focal_loss.py`` as groundwork; this completes it TPU-first.
Standard bottleneck ResNet-50 with feature taps at C3/C4/C5 (strides 8/16/32),
bf16 compute with f32 BN — same conventions as the Darknet backbone.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.layers import ConvBnAct


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBnAct(self.features, 1, dtype=self.dtype, qat=self.qat, name="conv1")(x, train)
        y = ConvBnAct(self.features, 3, strides=self.strides,
                      dtype=self.dtype, qat=self.qat, name="conv2")(y, train)
        y = ConvBnAct(self.features * 4, 1, act=None, dtype=self.dtype,
                      qat=self.qat, name="conv3")(y, train)
        if residual.shape[-1] != y.shape[-1] or self.strides != 1:
            residual = ConvBnAct(self.features * 4, 1, strides=self.strides,
                                 act=None, dtype=self.dtype, qat=self.qat,
                                 name="downsample")(x, train)
        return nn.relu(y + residual).astype(self.dtype)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    dtype: jnp.dtype = jnp.float32
    qat: bool = False
    out_indices: Sequence[int] = (2, 3, 4)  # C3, C4, C5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(64, 7, strides=2, dtype=self.dtype, qat=self.qat, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(n_blocks):
                strides = 2 if (block == 0 and stage > 0) else 1
                x = Bottleneck(width, strides, dtype=self.dtype,
                               qat=self.qat,
                               name=f"stage{stage + 1}_block{block}")(x, train)
            if stage + 1 in self.out_indices:
                feats.append(x)
        return feats


def resnet50(dtype=jnp.float32, out_indices=(2, 3, 4), qat=False):
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype,
                  out_indices=out_indices, qat=qat)
