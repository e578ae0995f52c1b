"""Core conv building blocks (NHWC, MXU-friendly).

TPU-native counterparts of the reference's ``Conv2dBnRelu / Conv2dBnAct /
Conv2dBn / V4TinyBlock`` (models/layers/conv_block.py:5-70):

* convolutions are bias-free with torch-style symmetric ``(k-1)//2`` padding
  (explicit pad pairs, *not* XLA 'SAME', which aligns stride-2 windows
  differently);
* BatchNorm uses the torch defaults the reference actually trained with
  (eps=1e-5, running-stat momentum 0.1 -> flax momentum 0.9; the reference's
  ``initialize_weights`` that would change eps/momentum is never called —
  models/initialize.py:21-30 per SURVEY.md);
* activations default to plain ReLU (conv_block.py:14 — not leaky);
* compute runs in ``dtype`` (bf16 on TPU) with f32 params and f32 BN
  statistics; XLA fuses the BN+act epilogue into the conv.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


class BatchNormMixed(nn.Module):
    """BatchNorm with f32 statistics but compute-dtype activations.

    A stock BatchNorm run in f32 materializes f32 activation tensors between
    every conv pair (the batch-stat reductions break XLA's conv-epilogue
    fusion), doubling HBM traffic on a bandwidth-bound convnet. Here the
    mean/var reductions cast to f32 on the fly (the reduction reads the same
    bf16 bytes; only the [C]-sized stats are f32), and the normalization is
    a bf16 multiply-add — so the tensor that hits HBM stays bf16.

    Parameter/stat names match flax ``nn.BatchNorm`` (scale/bias params,
    mean/var batch_stats), so checkpoints are interchangeable. Defaults are
    the torch values the reference trained with (eps 1e-5, torch momentum
    0.1 == running-stat decay 0.9).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if train:
            import os

            if os.environ.get("PODTPU_BN_STATS", "reduce") == "einsum":
                # MEASURED DEAD END (kept as opt-in scaffold): the moment
                # reductions as contractions — Σx via ones, Σx² via the
                # x·x self-contraction. Motivation was MXU latency hiding
                # for the 80-160 GB/s deep-extent stat reduces (RESULTS.md
                # round-11 table); measured 290 vs 1036 img/s @128 (3.6x
                # WORSE): 'nc,nc->c' is a c-batched matvec with one output
                # element per contraction — minimal MXU utilization. The
                # vector reducer stays the default.
                n = x.shape[0] * x.shape[1] * x.shape[2]
                xf = x.reshape(-1, features)
                mean = jnp.einsum(
                    "nc,n->c", xf, jnp.ones((xf.shape[0],), x.dtype),
                    preferred_element_type=jnp.float32) / n
                ex2 = jnp.einsum(
                    "nc,nc->c", xf, xf,
                    preferred_element_type=jnp.float32) / n
                var = jnp.maximum(0.0, ex2 - jnp.square(mean))
            else:
                x32 = x.astype(jnp.float32)
                mean = jnp.mean(x32, axis=(0, 1, 2))
                # clamp: E[x^2] - E[x]^2 can cancel negative in f32 for
                # large-mean/tiny-variance channels, and rsqrt(var + eps)
                # would go NaN — the guard stock flax applies (flax
                # _compute_stats)
                var = jnp.maximum(
                    0.0, jnp.mean(jnp.square(x32), axis=(0, 1, 2))
                    - jnp.square(mean))
            # [C]-sized; saving them under PODTPU_REMAT avoids re-reducing
            # the full conv output when the backward recomputes BN-apply.
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                # torch updates running_var with the UNBIASED batch variance
                # (Bessel n/(n-1); _BatchNorm.forward) while normalizing
                # with the biased one — match it exactly so BN EWMAs stay
                # in lockstep with the reference (test_reference_grad_parity
                # ::test_training_trajectory_lockstep).
                n = x.shape[0] * x.shape[1] * x.shape[2]
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * bessel * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        # y = (x - mean) * inv + bias, folded into one bf16 multiply-add
        mul = inv.astype(self.dtype)
        add = (bias - mean * inv).astype(self.dtype)
        return x.astype(self.dtype) * mul + add


class _KernelParam(nn.Module):
    """Holds a conv kernel param under nn.Conv's name/init so the QAT
    branch can fake-quantize it before the conv (same trick as
    podtpu/models/stem.py; checkpoint-compatible either way)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_ch: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
            jnp.float32,
        )


def _fake_quant(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Symmetric int8 fake quantization with a straight-through estimator.

    ``axis=None`` -> per-tensor (activations); an axis tuple -> the scale
    reduces over those dims (per-output-channel weights). The scale is the
    current abs-max (matching the PTQ calibration scheme in
    podtpu/export/quantize.py), detached so only the STE path carries
    gradient: ``x + sg(q(x) - x)``. Math runs in f32 so round/clip are
    exact regardless of compute dtype.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32)) if axis is None else jnp.max(
        jnp.abs(x32), axis=axis, keepdims=True)
    scale = jax.lax.stop_gradient(
        jnp.where(absmax > 0, absmax, 1.0) / 127.0)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127) * scale
    return (x32 + jax.lax.stop_gradient(q - x32)).astype(x.dtype)


def _s2d_conv(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv computed as a 2x2 stride-1 conv on the
    space-to-depth input — an exact reparameterization (same 27 products
    per output element, so forward-equal to f32 summation order).

    Derivation: y[i,j] = sum_{di,dj in 0..2} w[di,dj] * x[2i+di-1, 2j+dj-1].
    With X[i,j,(a,b,c)] = x[2i+a, 2j+b, c], row 2i+di-1 lands on s2d row
    i-1 (di=0, a=1) or i (di=1 a=0 / di=2 a=1) — a 2-tap in s2d space with
    one-sided top/left padding; taps (r,a) not in the map are zero. The
    stride-2 conv's bottom/right pad rows are provably never read for even
    H, W, so the one-sided pad loses nothing.

    Why: C_in=3 at 416^2 is the most padding-hostile tensor on the chip
    (lane dim 3/128); s2d trades it for C_in=12 at 208^2 with 4x fewer
    vregs of pure padding (VERDICT r2 item 3 / RESULTS.md round-2 HLO
    table: ~26% of step time sits in the >=208^2 HBM zone).
    """
    n, h, ww, c = x.shape
    assert h % 2 == 0 and ww % 2 == 0, (h, ww)
    assert w.shape[0] == w.shape[1] == 3, w.shape
    xs = x.reshape(n, h // 2, 2, ww // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, ww // 2, 4 * c).astype(dtype)
    zero = jnp.zeros_like(w[0, 0])
    tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    w2 = jnp.stack([jnp.stack([jnp.stack([jnp.stack([
        w[tap[(r, a)], tap[(s, b)]]
        if (r, a) in tap and (s, b) in tap else zero
        for b in (0, 1)]) for a in (0, 1)]) for s in (0, 1)])
        for r in (0, 1)])  # (r, s, a, b, C, F)
    w2 = w2.reshape(2, 2, 4 * c, w.shape[-1]).astype(dtype)
    return jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBnAct(nn.Module):
    """Conv2d(pad=(k-1)//2, bias=False) + BatchNorm + activation.

    Serving-time int8: when a ``quant`` collection entry exists for this
    block (built by :mod:`podtpu.export.quantize` from calibration stats),
    the convolution runs int8 x int8 -> int32 on the MXU — input quantized
    with the calibrated activation scale, kernel with its per-output-channel
    scale — then dequantizes into the f32 BN affine. Training and float
    serving are untouched (the branch is a trace-time constant). During
    calibration (``mutable=['quant_stats']``) each block sows the abs-max of
    its input activations.

    QAT (cfg ``qat: true``, threaded by the factory; or ``qat=True``):
    train-mode forward fake-quantizes the input per-tensor and the kernel
    per-output-channel with straight-through gradients — the same symmetric
    abs-max scheme the int8 serving path uses, so PTQ of a QAT-trained
    model sees activations/weights already shaped to the int8 grid. The
    param tree, eval path, and export path are unchanged.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    act: Callable | None = nn.relu  # None => linear (Conv2dBn)
    dtype: jnp.dtype = jnp.float32
    qat: bool = False  # cfg `qat: true`, threaded by the factory
    s2d: bool = False  # PODTPU_STEM=s2d: space-to-depth reparam (3x3/2 only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        pad = ((p, p), (p, p))
        if not self.is_initializing():
            self.sow("quant_stats", "x_absmax", jnp.max(jnp.abs(x)),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        if self.has_variable("quant", "w_int8"):
            w_int8 = self.get_variable("quant", "w_int8")
            w_scale = self.get_variable("quant", "w_scale")  # [Cout]
            x_scale = self.get_variable("quant", "x_scale")  # []
            x_int8 = jnp.clip(
                jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                x_int8, w_int8,
                window_strides=(self.strides, self.strides),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            x = acc.astype(jnp.float32) * (x_scale * w_scale)
            x = x.astype(self.dtype)
        elif self.s2d and not (self.qat and train):
            # Exact space-to-depth reparameterization of the stride-2 stem
            # (see _s2d_conv). Same "conv/kernel" param as the stock path,
            # so checkpoints are interchangeable and the kernel transform
            # (a [3,3,C,F]-sized gather) is re-derived inside the jit.
            assert self.kernel_size == 3 and self.strides == 2
            kernel = _KernelParam(self.features, self.kernel_size,
                                  name="conv")(x.shape[-1])
            x = _s2d_conv(x, kernel, self.dtype)
        elif self.qat and train and not self.is_initializing():
            kernel = _KernelParam(self.features, self.kernel_size,
                                  name="conv")(x.shape[-1])
            wq = _fake_quant(kernel, axis=(0, 1, 2)).astype(self.dtype)
            xq = _fake_quant(x).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                xq, wq,
                window_strides=(self.strides, self.strides),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(self.dtype)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=pad,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        # Remat-policy anchors (no-ops unless the train step wraps the
        # forward in jax.checkpoint with a name-based policy — see
        # podtpu/train/steps.py::remat_policy): "conv_out" = the pre-BN
        # conv output, "post_act" = the block output.
        x = checkpoint_name(x, "conv_out")
        x = BatchNormMixed(dtype=self.dtype, name="bn")(x, train)
        if self.act is not None:
            x = self.act(x)
        return checkpoint_name(x.astype(self.dtype), "post_act")


class HeadConv(nn.Module):
    """The raw 1x1 prediction conv (bias=False like the reference heads,
    e.g. models/detector/yolov3.py:56). Output stays f32 for a stable loss."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return x.astype(jnp.float32)


class V4TinyBlock(nn.Module):
    """CSP-ish partial block: 3x3 -> 3x3 -> concat -> 1x1 (conv_block.py:57-70)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnAct(self.features, 3, dtype=self.dtype, qat=self.qat,
                      name="conv1")(x, train)
        x = ConvBnAct(self.features, 3, dtype=self.dtype, qat=self.qat,
                      name="conv2")(y, train)
        x = jnp.concatenate([x, y], axis=-1)
        x = ConvBnAct(self.features * 2, 1, dtype=self.dtype, qat=self.qat,
                      name="conv3")(x, train)
        return x


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(2, 2) == VALID 2x2/2 pooling (floor division).

    Two lowerings, selected by env ``PODTPU_POOL``:

    * ``window`` (default): ``reduce_window`` — XLA's native pooling; its
      backward is ``select_and_scatter`` (first-match, torch-identical).
    * ``reshape``: non-overlapping 2x2/2 expressed as reshape + max-reduce,
      which XLA *can* fuse into the producing elementwise epilogue
      (reduce_window is a fusion boundary), trading a separate full-tensor
      read for a tie-splitting backward. Forward outputs are identical.
    """
    import os

    if os.environ.get("PODTPU_POOL", "window") == "reshape":
        b, h, w, c = x.shape
        he, we = (h // 2) * 2, (w // 2) * 2
        if (he, we) != (h, w):
            x = x[:, :he, :we, :]
        x = x.reshape(b, he // 2, 2, we // 2, 2, c)
        return jnp.max(x, axis=(2, 4))
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2) nearest-neighbor, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def passthrough_reorg(x: jnp.ndarray) -> jnp.ndarray:
    """YOLOv2's raw ``.view(bs, -1, h//2, w//2)`` passthrough.

    The reference is NOT a true space-to-depth: it reinterprets the
    contiguous NCHW buffer (models/detector/yolov2.py:45-46). Reproduce those
    exact semantics by round-tripping through NCHW ordering.
    """
    b, h, w, c = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW
    x = x.reshape(b, c * 4, h // 2, w // 2)
    return jnp.transpose(x, (0, 2, 3, 1))
