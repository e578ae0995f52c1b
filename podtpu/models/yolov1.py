"""YOLOv1 detector (models/detector/yolov1.py:15-51, NHWC re-design).

Darknet-19 final stage (1024ch, /32 -> 14x14 at 448 input) followed by five
conv-bn-relu layers (one stride-2 -> 7x7), flatten, dropout(0.5), and a
linear layer to ``7*7*(C + 5*B)`` raw logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.darknet import Darknet19
from podtpu.models.layers import ConvBnAct


class YoloV1(nn.Module):
    num_classes: int
    num_boxes: int = 2
    dtype: jnp.dtype = jnp.float32
    qat: bool = False
    # rate 0.0 short-circuits flax Dropout even in train mode — the grad/
    # trajectory parity tests use it to compare train-mode BN without
    # stochastic dropout (the torch side sets its Dropout module to eval)
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Darknet19(out_indices=(5,), dtype=self.dtype, qat=self.qat, name="backbone")(x, train)[0]

        x = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="head0")(x, train)
        x = ConvBnAct(1024, 3, strides=2, dtype=self.dtype, qat=self.qat, name="head1")(x, train)
        x = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="head2")(x, train)
        x = ConvBnAct(1024, 3, dtype=self.dtype, qat=self.qat, name="head3")(x, train)
        x = ConvBnAct(256, 3, dtype=self.dtype, qat=self.qat, name="head4")(x, train)

        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        out = 7 * 7 * (self.num_classes + 5 * self.num_boxes)
        x = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(x)
        return x.astype(jnp.float32)
