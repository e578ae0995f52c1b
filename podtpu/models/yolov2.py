"""YOLOv2 detector head (models/detector/yolov2.py:14-55, NHWC re-design).

Backbone taps layer4 (512ch, /16) and layer5 (1024ch, /32); the passthrough
branch is a 1x1 conv to 64ch followed by the reference's raw ``.view``
reorg to /32 (see :func:`podtpu.models.layers.passthrough_reorg`), concat with
the 2x conv3x3(1024) deep branch, then conv3x3(1024) + 1x1 prediction conv.
Output: [B, H/32, W/32, A*(5+C)] raw logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.darknet import Darknet19
from podtpu.models.layers import ConvBnAct, HeadConv, passthrough_reorg


class YoloV2(nn.Module):
    num_classes: int
    num_anchors: int = 5
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b4, b5 = Darknet19(out_indices=(4, 5), dtype=self.dtype, qat=self.qat, name="backbone")(
            x, train
        )

        b4 = ConvBnAct(64, 1, dtype=self.dtype, qat=self.qat, name="b4_layer")(b4, train)
        b4 = passthrough_reorg(b4)

        b5 = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="b5_layer0")(b5, train)
        b5 = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="b5_layer1")(b5, train)

        x = jnp.concatenate([b4, b5], axis=-1)  # 256 + 1024 = 1280ch
        x = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="head_conv")(x, train)
        return HeadConv(
            self.num_anchors * (self.num_classes + 5), dtype=self.dtype, name="head"
        )(x)
