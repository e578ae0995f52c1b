"""YOLOv4-tiny detector (models/detector/yolov4_tiny.py:13-111, NHWC).

Self-contained CSP-tiny backbone (stem s2, layer1 s2, three V4TinyBlocks with
concat skips + maxpools, layer4) plus a two-route FPN and three heads.
Returns (p3, p4, p5) NHWC raw logits at strides 8/16/32.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.layers import (
    ConvBnAct,
    HeadConv,
    V4TinyBlock,
    max_pool_2x2,
    upsample_nearest_2x,
)
from podtpu.models.stem import stem_s2d_enabled


class YoloV4Tiny(nn.Module):
    num_classes: int
    num_anchors: int = 9
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_anchors == 9
        per_scale = self.num_anchors // 3
        out_ch = per_scale * (self.num_classes + 5)
        dt = self.dtype

        x = ConvBnAct(32, 3, strides=2, dtype=dt, qat=self.qat,
                      s2d=stem_s2d_enabled(), name="stem")(x, train)
        y = ConvBnAct(64, 3, strides=2, dtype=dt, qat=self.qat, name="layer1_0")(x, train)
        y = ConvBnAct(64, 3, dtype=dt, qat=self.qat, name="layer1_1")(y, train)
        x = V4TinyBlock(32, dtype=dt, qat=self.qat, name="tiny_block1")(y, train)
        x = jnp.concatenate([y, x], axis=-1)

        y = max_pool_2x2(x)
        y = ConvBnAct(128, 3, dtype=dt, qat=self.qat, name="layer2")(y, train)
        b3 = V4TinyBlock(64, dtype=dt, qat=self.qat, name="tiny_block2")(y, train)
        x = jnp.concatenate([y, b3], axis=-1)

        y = max_pool_2x2(x)
        y = ConvBnAct(256, 3, dtype=dt, qat=self.qat, name="layer3")(y, train)
        b4 = V4TinyBlock(128, dtype=dt, qat=self.qat, name="tiny_block3")(y, train)
        x = jnp.concatenate([y, b4], axis=-1)

        x = max_pool_2x2(x)
        x = ConvBnAct(512, 3, dtype=dt, qat=self.qat, name="layer4_0")(x, train)
        b5 = ConvBnAct(256, 1, dtype=dt, qat=self.qat, name="layer4_1")(x, train)

        # Prediction branches (yolov4_tiny.py:96-109)
        p5 = ConvBnAct(512, 3, dtype=dt, qat=self.qat, name="p5_expand")(b5, train)
        p5 = HeadConv(out_ch, dtype=dt, name="p5_pred")(p5)

        b5_route = ConvBnAct(128, 1, dtype=dt, qat=self.qat, name="b5_route")(b5, train)
        b5_route = upsample_nearest_2x(b5_route)
        b4 = jnp.concatenate([b5_route, b4], axis=-1)  # 128 + 256 = 384
        b4 = ConvBnAct(256, 3, dtype=dt, qat=self.qat, name="b4_conv")(b4, train)
        p4 = HeadConv(out_ch, dtype=dt, name="p4_pred")(b4)

        b4_route = ConvBnAct(64, 1, dtype=dt, qat=self.qat, name="b4_route")(b4, train)
        b4_route = upsample_nearest_2x(b4_route)
        b3 = jnp.concatenate([b4_route, b3], axis=-1)  # 64 + 128 = 192
        p3 = ConvBnAct(128, 3, dtype=dt, qat=self.qat, name="p3_expand")(b3, train)
        p3 = HeadConv(out_ch, dtype=dt, name="p3_pred")(p3)

        return p3, p4, p5
