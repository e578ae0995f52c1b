"""RetinaNet detector (the reference's unchecked TODO, built TPU-first).

ResNet-50 C3/C4/C5 -> FPN P3..P7 (256ch) -> shared 4-conv class and box
subnets. Heads output raw logits; the class subnet's final conv bias is
initialized to -log((1-pi)/pi) with pi=0.01 (the focal-loss prior) so early
training isn't swamped by easy negatives.

Returns a list of (cls [B,H,W,A*C], box [B,H,W,A*4]) per level, A = 9.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

PRIOR_PI = 0.01
NUM_LEVELS = 5
ANCHORS_PER_CELL = 9


class _Subnet(nn.Module):
    out_channels: int
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=self.dtype, param_dtype=jnp.float32, name="pred",
        )(x)
        return x.astype(jnp.float32)


class RetinaNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False  # fake-quants the ResNet ConvBnAct blocks (FPN/head
    # raw convs stay float — the PTQ path leaves them float too)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from podtpu.models.resnet import ResNet

        c3, c4, c5 = ResNet(
            stage_sizes=(3, 4, 6, 3), dtype=self.dtype, qat=self.qat,
            name="backbone"
        )(x, train)

        # FPN lateral + top-down (P3-P5), plus P6/P7 from C5
        p5 = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="lateral5")(c5)
        p4 = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="lateral4")(c4) + _up2(p5)
        p3 = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="lateral3")(c3) + _up2(p4)
        p3 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                     param_dtype=jnp.float32, name="smooth3")(p3)
        p4 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                     param_dtype=jnp.float32, name="smooth4")(p4)
        p5 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                     param_dtype=jnp.float32, name="smooth5")(p5)
        p6 = nn.Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, param_dtype=jnp.float32, name="p6")(c5)
        p7 = nn.Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="p7")(nn.relu(p6))

        cls_net = _Subnet(
            ANCHORS_PER_CELL * self.num_classes,
            bias_init_value=-math.log((1.0 - PRIOR_PI) / PRIOR_PI),
            dtype=self.dtype, name="cls_subnet",
        )
        box_net = _Subnet(ANCHORS_PER_CELL * 4, dtype=self.dtype,
                          name="box_subnet")
        return [(cls_net(p), box_net(p)) for p in (p3, p4, p5, p6, p7)]


def _up2(x):
    from podtpu.models.layers import upsample_nearest_2x

    return upsample_nearest_2x(x)


def retinanet_strides() -> Sequence[int]:
    return (8, 16, 32, 64, 128)
