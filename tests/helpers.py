"""Shared test utilities: deterministic synthetic inputs.

The random streams here regenerate the exact tensors used to produce the
reference-implementation golden scalars in test_losses.py (generated once by
running /root/reference's losses under torch-cpu on these same arrays).
"""

from __future__ import annotations

import numpy as np

VOC_SCALED_ANCHORS = [
    [1.3221, 1.73145],
    [3.19275, 4.00944],
    [5.05587, 8.09892],
    [9.47112, 4.84053],
    [11.2364, 10.0071],
]
VOC_ANCHORS = [
    [10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
    [59, 119], [116, 90], [156, 198], [373, 326],
]


def make_targets(batch: int, max_annots: int, num_classes: int, seed: int) -> np.ndarray:
    """[B, T, 5] padded annotations with -1 padding rows."""
    r = np.random.default_rng(seed)
    t = -np.ones((batch, max_annots, 5), np.float32)
    for b in range(batch):
        n = int(r.integers(0, max_annots + 1))
        for i in range(n):
            cx, cy = r.uniform(0.05, 0.95, 2)
            w, h = r.uniform(0.05, 0.6, 2)
            t[b, i] = [cx, cy, w, h, r.integers(0, num_classes)]
    return t


def normal(shape, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))
