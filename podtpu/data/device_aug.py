"""On-device batch augmentation (jit-compiled, TPU-resident).

The host pipeline (cv2) handles decode + geometry that needs per-image
dynamic shapes (letterbox, affine warps). The remaining photometric work —
HSV-style jitter, horizontal flip, normalization — is elementwise and
bandwidth-light, so it can run fused on the TPU right before the train step,
cutting host CPU per image and overlapping with the step via async dispatch.

Semantics mirror the host versions in spirit (not bit-exact: the host HSV
uses integer LUTs in OpenCV's HSV space; this uses a differentiable
RGB-space approximation with the same gain ranges), and everything is a pure
function of (images, rng) — deterministic and replayable.

Usage: ``aug = make_device_augment(hgain, sgain, vgain); imgs = aug(rng, imgs)``
with imgs [B, H, W, 3] float32 in [0, 1]; runs inside or outside the train
step jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[...,3] in [0,1] -> HSV with H in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


@functools.partial(jax.jit, static_argnames=("hgain", "sgain", "vgain",
                                             "flip_p"))
def device_augment(
    rng: jax.Array,
    images: jnp.ndarray,
    annots: jnp.ndarray,
    hgain: float = 0.015,
    sgain: float = 0.7,
    vgain: float = 0.4,
    flip_p: float = 0.5,
):
    """Per-image HSV jitter + horizontal flip on device.

    images: [B, H, W, 3] float32 in [0, 1]; annots: [B, T, 5] normalized
    (cx flipped with the image; padding rows stay untouched).
    Returns (images, annots).
    """
    b = images.shape[0]
    k_h, k_s, k_v, k_f = jax.random.split(rng, 4)

    gains_h = 1.0 + jax.random.uniform(k_h, (b, 1, 1), minval=-1.0, maxval=1.0) * hgain
    gains_s = 1.0 + jax.random.uniform(k_s, (b, 1, 1), minval=-1.0, maxval=1.0) * sgain
    gains_v = 1.0 + jax.random.uniform(k_v, (b, 1, 1), minval=-1.0, maxval=1.0) * vgain

    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] * gains_h) % 1.0
    s = jnp.clip(hsv[..., 1] * gains_s, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gains_v, 0.0, 1.0)
    images = hsv_to_rgb(jnp.stack([h, s, v], axis=-1))

    flips = jax.random.uniform(k_f, (b,)) < flip_p  # [B]
    flipped = images[:, :, ::-1, :]
    images = jnp.where(flips[:, None, None, None], flipped, images)

    valid = jnp.sum(annots, axis=-1, keepdims=True) > 0  # [B, T, 1]
    flipped_cx = jnp.where(valid[..., 0], 1.0 - annots[..., 0], annots[..., 0])
    new_cx = jnp.where(flips[:, None], flipped_cx, annots[..., 0])
    annots = annots.at[..., 0].set(new_cx)
    return images, annots


def separable_affine(images: jnp.ndarray, geom: jnp.ndarray,
                     fill: float = 114.0 / 255.0) -> jnp.ndarray:
    """Batched scale+translate bilinear warp as two MXU matmuls.

    The active letterbox recipe's random affine has degrees=0 and shear=0
    (the reference calls ``random_perspective(translate=.1, scale=.5)`` with
    rotation/shear left at 0 — dataset/detection/datasets.py:47-52), so the
    warp is axis-separable: ``out[y, x] = Σ_h Σ_w Wy[y, h] Wx[x, w] im[h, w]``
    with per-sample interpolation matrices built from three scalars. Two
    batched einsums put the whole geometric augmentation on the MXU instead
    of host ``cv2.warpAffine`` — this is the ``device_geom`` fast path.

    images: [B, H, W, C] float in [0, 1] (already letterboxed, un-warped).
    geom:   [B, 4] rows ``(sx, sy, bx, by)`` of the forward map
            ``dst = (sx*x + bx, sy*y + by)`` — the letterbox affine has
            ``sx == sy`` (= ``m[0,0], m[1,1], m[0,2], m[1,2]`` of
            :func:`podtpu.data.augment.draw_affine_params`); the simple
            pipeline's RandomResizedCrop is anisotropic. Identity rows
            ``(1, 1, 0, 0)`` pass through exactly.
    Out-of-image taps blend with the gray ``fill``, matching
    ``cv2.warpAffine(borderValue=114)`` bilinear semantics (float-exact
    coordinates; cv2's 5-bit fixed-point tables differ by ≤~2/255).
    """
    b, h, w, _ = images.shape
    # inverse map: src = (dst - t) / s, per axis
    src_x = (jnp.arange(w, dtype=jnp.float32)[None, :] - geom[:, 2:3]) / geom[:, 0:1]
    src_y = (jnp.arange(h, dtype=jnp.float32)[None, :] - geom[:, 3:4]) / geom[:, 1:2]
    # bilinear weight matrices [B, out, in]: hat function around src
    wx = jnp.clip(
        1.0 - jnp.abs(src_x[:, :, None] - jnp.arange(w, dtype=jnp.float32)),
        0.0, 1.0)
    wy = jnp.clip(
        1.0 - jnp.abs(src_y[:, :, None] - jnp.arange(h, dtype=jnp.float32)),
        0.0, 1.0)
    tmp = jnp.einsum("boh,bhwc->bowc", wy, images)       # contract src rows
    out = jnp.einsum("bxw,bowc->boxc", wx, tmp)          # contract src cols
    # taps falling outside the source blend with the constant border fill:
    # total bilinear weight at (y, x) is rowsum(wy)[y] * rowsum(wx)[x]
    cover = wy.sum(-1)[:, :, None] * wx.sum(-1)[:, None, :]  # [B, H, W]
    return out + (1.0 - cover)[..., None] * fill


def make_device_augment(cfg: dict):
    """Config -> device-augment fn, or None when disabled.

    Enable with ``device_augment: true``; the host pipeline should then skip
    its own HSV/flip stages (pass ``augment='geometry-only'`` semantics by
    configuring the dataset accordingly).
    """
    if not cfg.get("device_augment", False):
        return None
    return functools.partial(
        device_augment, hgain=0.015, sgain=0.7, vgain=0.4, flip_p=0.5
    )
