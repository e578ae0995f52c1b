"""Fused stem module: darknet stage0 conv+BN+ReLU and layer1's leading pool.

Train-mode fast path for the measured throughput ceiling (the BN batch-stat
reduction forces XLA to materialize the [B,H,W,32] stem activation — see
RESULTS.md "Round-2 MFU attack" and podtpu/ops/pallas/stem_fused.py).

The parameter/variable tree exactly matches the XLA path's
``stage0/conv0/{conv,bn}`` naming (nn.Conv's lecun_normal kernel init,
BatchNormMixed's scale/bias + batch_stats mean/var), so checkpoints are
interchangeable and either path can load the other's weights: eval,
calibration, and export keep using the XLA modules.

Reference semantics covered: models/backbone/darknet.py:53-60 stem conv +
torch BatchNorm2d(track_running_stats) + ReLU + MaxPool2d(2,2).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.layers import _KernelParam
from podtpu.ops.pallas.stem_fused import make_fused_stem


def stem_fused_enabled() -> bool:
    """Env gate: ``PODTPU_STEM=fused`` opts the train step into the Pallas
    stem; anything else (default ``xla``) keeps the stock lowering."""
    return os.environ.get("PODTPU_STEM", "xla") == "fused"


def stem_s2d_enabled() -> bool:
    """Env gate: ``PODTPU_STEM=s2d`` computes the stride-2 stem conv as a
    2x2 conv on the space-to-depth input — exact reparameterization, same
    params (podtpu/models/layers.py::_s2d_conv)."""
    return os.environ.get("PODTPU_STEM", "xla") == "s2d"


def stem_fusable(x: jnp.ndarray, train: bool, out_indices) -> bool:
    """The fused kernel covers exactly conv3x3(3->C) stride 1 + 2x2/2 pool
    in train mode, with H a multiple of 8 (the kernel's row tile) and no
    consumer of the pre-pool stage0 feature."""
    return (
        train
        and stem_fused_enabled()
        and 0 not in out_indices
        and x.ndim == 4
        and x.shape[-1] == 3
        and x.shape[1] % 8 == 0
        and x.shape[2] % 2 == 0
    )


class _BnParams(nn.Module):
    """Holds BN affine params + running stats under BatchNormMixed's names."""

    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class _FusedConvBn(nn.Module):
    """conv3x3 + train-mode BN + ReLU + 2x2 maxpool via the Pallas kernel."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = _KernelParam(self.features, 3, name="conv")(x.shape[-1])
        scale, bias, ra_mean, ra_var = _BnParams(self.features, name="bn")()
        fused = make_fused_stem(
            int(x.shape[1]), int(x.shape[2]), int(x.shape[3]),
            self.features, jnp.dtype(self.dtype).name, float(self.epsilon),
        )
        pooled, mean, var = fused(x.astype(self.dtype), kernel, scale, bias)
        if not self.is_initializing():
            # torch-exact running var uses the unbiased batch variance
            # (Bessel), matching BatchNormMixed.
            n = x.shape[0] * x.shape[1] * x.shape[2]
            bessel = n / max(n - 1, 1)
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * bessel * var)
        return pooled


class FusedStemPool(nn.Module):
    """Drop-in for darknet ``stage0`` + the following pool (train mode)."""

    features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _FusedConvBn(self.features, dtype=self.dtype, name="conv0")(x)
