"""Darknet-19 backbone (NHWC Flax re-design of models/backbone/darknet.py).

Six stages (stem + layer1..5) built from ``[out_ch, k]`` / ``'M'`` config
lists (darknet.py:53-94). ``Darknet19`` returns the features at
``out_indices`` (the reference's ``FeatureListNet`` semantics,
darknet.py:15-43); ``Darknet19Classifier`` adds the conv1x1 -> GAP head used
for (tiny-)ImageNet pretraining (darknet.py:96-116).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from podtpu.models.layers import ConvBnAct, max_pool_2x2

# (out_channels, kernel) conv entries; "M" = 2x2/2 max pool. darknet.py:53-87.
STAGE_CFGS = (
    ((32, 3),),                                                     # stem
    ("M", (64, 3)),                                                 # layer1
    ("M", (128, 3), (64, 1), (128, 3)),                             # layer2
    ("M", (256, 3), (128, 1), (256, 3)),                            # layer3
    ("M", (512, 3), (256, 1), (512, 3), (256, 1), (512, 3)),        # layer4
    ("M", (1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3)),     # layer5
)

STAGE_CHANNELS = (32, 64, 128, 256, 512, 1024)


class _Stage(nn.Module):
    cfg: tuple
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_idx = 0
        for entry in self.cfg:
            if entry == "M":
                x = max_pool_2x2(x)
            else:
                out_ch, k = entry
                x = ConvBnAct(out_ch, k, dtype=self.dtype, qat=self.qat,
                              name=f"conv{conv_idx}")(x, train)
                conv_idx += 1
        return x


class Darknet19(nn.Module):
    """Feature extractor; returns a list of stage outputs at ``out_indices``.

    ``remat=True`` rematerializes each stage in the backward pass
    (jax.checkpoint): the step is HBM-bandwidth-bound, so recomputing the
    early high-resolution activations instead of round-tripping them can be
    a net win — measure per workload.
    """

    out_indices: Sequence[int] = (5,)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from podtpu.models.stem import FusedStemPool, stem_fusable

        # static_argnums: `train` is a python bool, not a tracer
        stage_cls = (nn.remat(_Stage, static_argnums=(2,))
                     if self.remat else _Stage)
        # Train-mode fast path (PODTPU_STEM=fused): stage0's conv+BN+ReLU and
        # layer1's leading pool run as one Pallas kernel that never
        # materializes the full-resolution stem activation. Param tree and
        # numerics match the stock path (podtpu/models/stem.py).
        # the fused stem has no fake-quant branch; under QAT keep the
        # stock path so every ConvBnAct trains on the int8 grid
        fuse_stem = stem_fusable(x, train, self.out_indices) and not self.qat
        feats = []
        for i, cfg in enumerate(STAGE_CFGS):
            if fuse_stem and i == 0:
                x = FusedStemPool(STAGE_CHANNELS[0], dtype=self.dtype,
                                  name="stage0")(x, train)
                continue
            cfg_i = cfg[1:] if (fuse_stem and i == 1) else cfg
            x = stage_cls(cfg_i, dtype=self.dtype, qat=self.qat,
                          name=f"stage{i}")(x, train)
            if i in self.out_indices:
                feats.append(x)
        return feats


class Darknet19Classifier(nn.Module):
    """Classification variant for backbone pretraining (darknet.py:96-116)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32
    qat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Darknet19(out_indices=(5,), dtype=self.dtype, qat=self.qat,
                      name="backbone")(x, train)[0]
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ConvBnAct(self.num_classes, 1, dtype=self.dtype, name="classifier")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
        return x
