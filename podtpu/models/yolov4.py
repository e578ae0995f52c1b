"""YOLOv4 (full) detector — CSPDarknet53 + SPP + PANet, NHWC.

The reference lists YOLOv4 as an unchecked TODO (README.md:13) next to
RetinaNet (built in podtpu/models/retinanet.py); this module completes it
the same way: a from-scratch TPU-native implementation that plugs into the
existing v3-family loss/decode/NMS stack (the reference already trains
YOLOv4-tiny with ``YoloV3LossV2`` — train_yolov4-tiny.py:38-41 — so full
YOLOv4 reuses that exact loss/decoder contract: three NHWC heads with
``3*(5+C)`` channels at strides 8/16/32).

Architecture follows the canonical darknet yolov4.cfg:

* CSPDarknet53 backbone — stem conv(32,3) + five CSP stages with block
  counts [1, 2, 8, 8, 4], Mish activation throughout; stage1 keeps full
  width in its CSP split (hidden == features), the rest split to C/2.
* SPP — 5/9/13 stride-1 maxpools concatenated with the identity, between
  two 1x1/3x3/1x1 squeeze trios on c5 (leaky ReLU 0.1 from here on).
* PANet — top-down FPN (1x1 route + 2x nearest upsample + 5-conv blocks)
  followed by a bottom-up path (stride-2 3x3 downsample + 5-conv blocks).
* Heads — 3x3 expand + bias-free 1x1 prediction conv (HeadConv), raw
  logits, decoded by ``ops/decode.decode_yolov3``.

All blocks are built from the shared ``ConvBnAct`` (bias-free conv,
torch-style padding, f32-stat/bf16-act BatchNorm), so bf16 compute, QAT,
int8 PTQ serving, and the StableHLO export path apply to this family
unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from podtpu.models.layers import ConvBnAct, HeadConv, upsample_nearest_2x


def mish(x):
    """x * tanh(softplus(x)) — CSPDarknet53's activation (jax.nn.mish)."""
    return jax.nn.mish(x)


def leaky01(x):
    """LeakyReLU(0.1) — yolov4.cfg's neck/head activation."""
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def _maxpool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stride-1 kxk maxpool with symmetric same-padding (SPP pools)."""
    p = k // 2
    return nn.max_pool(
        x, window_shape=(k, k), strides=(1, 1), padding=((p, p), (p, p))
    )


class _CSPRes(nn.Module):
    """Residual unit inside a CSP stage: 1x1 squeeze -> 3x3 -> add."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnAct(self.mid, 1, act=mish, dtype=self.dtype, qat=self.qat,
                      name="c0")(x, train)
        y = ConvBnAct(self.out, 3, act=mish, dtype=self.dtype, qat=self.qat,
                      name="c1")(y, train)
        return x + y


class _CSPStage(nn.Module):
    """One CSPDarknet53 stage: stride-2 downsample, split, residual chain,
    transition, cross-stage concat, merge (yolov4.cfg CSP topology)."""

    features: int
    blocks: int
    first: bool = False  # stage1 keeps full width in the split
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features if self.first else self.features // 2
        res_mid = self.features // 2
        x = ConvBnAct(self.features, 3, strides=2, act=mish, dtype=self.dtype,
                      qat=self.qat, name="down")(x, train)
        route = ConvBnAct(hidden, 1, act=mish, dtype=self.dtype, qat=self.qat,
                          name="split_route")(x, train)
        x = ConvBnAct(hidden, 1, act=mish, dtype=self.dtype, qat=self.qat,
                      name="split_main")(x, train)
        for i in range(self.blocks):
            x = _CSPRes(res_mid, hidden, dtype=self.dtype, qat=self.qat,
                        name=f"res{i}")(x, train)
        x = ConvBnAct(hidden, 1, act=mish, dtype=self.dtype, qat=self.qat,
                      name="transition")(x, train)
        x = jnp.concatenate([x, route], axis=-1)
        return ConvBnAct(self.features, 1, act=mish, dtype=self.dtype,
                         qat=self.qat, name="merge")(x, train)


class CSPDarknet53(nn.Module):
    """CSPDarknet53 feature extractor; returns (c3, c4, c5) at /8, /16, /32."""

    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, q = self.dtype, self.qat
        x = ConvBnAct(32, 3, act=mish, dtype=dt, qat=q, name="stem")(x, train)
        x = _CSPStage(64, 1, first=True, dtype=dt, qat=q, name="stage1")(x, train)
        x = _CSPStage(128, 2, dtype=dt, qat=q, name="stage2")(x, train)
        c3 = _CSPStage(256, 8, dtype=dt, qat=q, name="stage3")(x, train)
        c4 = _CSPStage(512, 8, dtype=dt, qat=q, name="stage4")(c3, train)
        c5 = _CSPStage(1024, 4, dtype=dt, qat=q, name="stage5")(c4, train)
        return c3, c4, c5


class CSPDarknet53Classifier(nn.Module):
    """Classification variant for backbone pretraining (the darknet19
    tiny-imagenet recipe, models/backbone/darknet.py:96-150, applied to
    CSPDarknet53). Shares the ``backbone`` scope with ``YoloV4`` so the
    saved weights partial-load via cfg ``backbone_pretrained``."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c5 = CSPDarknet53(dtype=self.dtype, qat=self.qat,
                          name="backbone")(x, train)[2]
        x = nn.Dropout(0.5, deterministic=not train)(c5)
        x = ConvBnAct(self.num_classes, 1, dtype=self.dtype,
                      name="classifier")(x, train)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class _ConvTrioLeaky(nn.Module):
    """1x1 squeeze -> 3x3 expand -> 1x1 squeeze (leaky), SPP sandwich."""

    mid: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.mid, 1, act=leaky01, dtype=self.dtype,
                      qat=self.qat, name="c0")(x, train)
        x = ConvBnAct(self.mid * 2, 3, act=leaky01, dtype=self.dtype,
                      qat=self.qat, name="c1")(x, train)
        x = ConvBnAct(self.mid, 1, act=leaky01, dtype=self.dtype,
                      qat=self.qat, name="c2")(x, train)
        return x


class _FiveConv(nn.Module):
    """PANet 5-conv block: 1x1 C, 3x3 2C, 1x1 C, 3x3 2C, 1x1 C (leaky)."""

    mid: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (ch, k) in enumerate([
            (self.mid, 1), (self.mid * 2, 3), (self.mid, 1),
            (self.mid * 2, 3), (self.mid, 1),
        ]):
            x = ConvBnAct(ch, k, act=leaky01, dtype=self.dtype, qat=self.qat,
                          name=f"c{i}")(x, train)
        return x


class YoloV4(nn.Module):
    """Full YOLOv4: returns (p3, p4, p5) raw NHWC logits at strides 8/16/32,
    the same contract as YoloV3/YoloV4Tiny (loss: yolov3_loss_v2, decode:
    decode_yolov3)."""

    num_classes: int
    num_anchors: int = 9  # global; 3 per scale
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_anchors == 9
        per_scale = self.num_anchors // 3
        out_ch = per_scale * (self.num_classes + 5)
        dt, q = self.dtype, self.qat

        c3, c4, c5 = CSPDarknet53(dtype=dt, qat=q, name="backbone")(x, train)

        # SPP sandwich on c5 (yolov4.cfg: trio -> pools 5/9/13 -> trio)
        x5 = _ConvTrioLeaky(512, dtype=dt, qat=q, name="spp_pre")(c5, train)
        x5 = jnp.concatenate(
            [_maxpool_same(x5, 13), _maxpool_same(x5, 9),
             _maxpool_same(x5, 5), x5], axis=-1)  # 2048
        n5 = _ConvTrioLeaky(512, dtype=dt, qat=q, name="spp_post")(x5, train)

        # Top-down FPN
        r5 = ConvBnAct(256, 1, act=leaky01, dtype=dt, qat=q,
                       name="td_route5")(n5, train)
        r5 = upsample_nearest_2x(r5)
        l4 = ConvBnAct(256, 1, act=leaky01, dtype=dt, qat=q,
                       name="td_lateral4")(c4, train)
        n4 = _FiveConv(256, dtype=dt, qat=q, name="td_block4")(
            jnp.concatenate([l4, r5], axis=-1), train)  # 512 -> 256

        r4 = ConvBnAct(128, 1, act=leaky01, dtype=dt, qat=q,
                       name="td_route4")(n4, train)
        r4 = upsample_nearest_2x(r4)
        l3 = ConvBnAct(128, 1, act=leaky01, dtype=dt, qat=q,
                       name="td_lateral3")(c3, train)
        n3 = _FiveConv(128, dtype=dt, qat=q, name="td_block3")(
            jnp.concatenate([l3, r4], axis=-1), train)  # 256 -> 128

        # Bottom-up PAN + heads
        p3 = ConvBnAct(256, 3, act=leaky01, dtype=dt, qat=q,
                       name="p3_expand")(n3, train)
        p3 = HeadConv(out_ch, dtype=dt, name="p3_pred")(p3)

        d3 = ConvBnAct(256, 3, strides=2, act=leaky01, dtype=dt, qat=q,
                       name="bu_down3")(n3, train)
        m4 = _FiveConv(256, dtype=dt, qat=q, name="bu_block4")(
            jnp.concatenate([d3, n4], axis=-1), train)  # 512 -> 256
        p4 = ConvBnAct(512, 3, act=leaky01, dtype=dt, qat=q,
                       name="p4_expand")(m4, train)
        p4 = HeadConv(out_ch, dtype=dt, name="p4_pred")(p4)

        d4 = ConvBnAct(512, 3, strides=2, act=leaky01, dtype=dt, qat=q,
                       name="bu_down4")(m4, train)
        m5 = _FiveConv(512, dtype=dt, qat=q, name="bu_block5")(
            jnp.concatenate([d4, n5], axis=-1), train)  # 1024 -> 512
        p5 = ConvBnAct(1024, 3, act=leaky01, dtype=dt, qat=q,
                       name="p5_expand")(m5, train)
        p5 = HeadConv(out_ch, dtype=dt, name="p5_pred")(p5)

        return p3, p4, p5
