"""YOLOv3 detector (models/detector/yolov3.py:13-91, NHWC re-design).

Darknet-19 taps c3/c4/c5 (out_indices 3,4,5); top-down FPN with conv-route +
2x nearest upsample; three heads each predicting 3*(5+C) channels.
Returns (p3, p4, p5) NHWC raw logits at strides 8/16/32.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.darknet import Darknet19
from podtpu.models.layers import ConvBnAct, HeadConv, upsample_nearest_2x


class _ConvTriple(nn.Module):
    """1x1 -> 3x3 -> 1x1 squeeze/expand trio (yolov3.py:23-39)."""

    mid: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.mid, 1, dtype=self.dtype, qat=self.qat, name="c0")(x, train)
        x = ConvBnAct(self.mid * 2, 3, dtype=self.dtype, qat=self.qat, name="c1")(x, train)
        x = ConvBnAct(self.mid, 1, dtype=self.dtype, qat=self.qat, name="c2")(x, train)
        return x


class _Head(nn.Module):
    """3x3 expand + 1x1 raw prediction conv (yolov3.py:53-69)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.mid, 3, dtype=self.dtype, qat=self.qat, name="expand")(x, train)
        return HeadConv(self.out, dtype=self.dtype, name="pred")(x)


class YoloV3(nn.Module):
    num_classes: int
    num_anchors: int = 9  # global; 3 per scale
    dtype: jnp.dtype = jnp.float32
    qat: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_anchors == 9
        per_scale = self.num_anchors // 3
        out_ch = per_scale * (self.num_classes + 5)

        c3, c4, c5 = Darknet19(
            out_indices=(3, 4, 5), dtype=self.dtype, remat=self.remat,
            qat=self.qat, name="backbone",
        )(x, train)

        c5 = _ConvTriple(512, dtype=self.dtype, qat=self.qat, name="c5_conv")(c5, train)
        p5 = _Head(1024, out_ch, dtype=self.dtype, qat=self.qat, name="p5_head")(c5, train)

        c5_route = ConvBnAct(256, 3, dtype=self.dtype, qat=self.qat, name="c5_route")(c5, train)
        c5_route = upsample_nearest_2x(c5_route)
        c4 = jnp.concatenate([c5_route, c4], axis=-1)  # 256 + 512 = 768
        c4 = _ConvTriple(256, dtype=self.dtype, qat=self.qat, name="c4_conv")(c4, train)
        p4 = _Head(512, out_ch, dtype=self.dtype, qat=self.qat, name="p4_head")(c4, train)

        c4_route = ConvBnAct(128, 3, dtype=self.dtype, qat=self.qat, name="c4_route")(c4, train)
        c4_route = upsample_nearest_2x(c4_route)
        c3 = jnp.concatenate([c4_route, c3], axis=-1)  # 128 + 256 = 384
        c3 = _ConvTriple(128, dtype=self.dtype, qat=self.qat, name="c3_conv")(c3, train)
        p3 = _Head(256, out_ch, dtype=self.dtype, qat=self.qat, name="p3_head")(c3, train)

        return p3, p4, p5
