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


# ---------------------------------------------------------------------------
# cv2-exact uint8 HSV math (the reference's augment_hsv LUT path,
# dataset/detection/augmentations.py:47-60, runs cv2.cvtColor BGR2HSV on
# 8-bit images; OpenCV's 8u kernels are fixed-point with 12-bit division
# tables). Opt-in via cfg ``device_hsv: exact``.
# ---------------------------------------------------------------------------

_HSV_SHIFT = 12


@functools.lru_cache(maxsize=1)
def _hsv_div_tables():
    import numpy as np

    i = np.arange(256, dtype=np.float64)
    sdiv = np.zeros(256, np.int32)
    hdiv = np.zeros(256, np.int32)
    sdiv[1:] = np.round((255 << _HSV_SHIFT) / i[1:]).astype(np.int32)
    hdiv[1:] = np.round((180 << _HSV_SHIFT) / (6.0 * i[1:])).astype(np.int32)
    return jnp.asarray(sdiv), jnp.asarray(hdiv)


def bgr_hsv_u8(rgb_u8: jnp.ndarray):
    """[..., 3] RGB uint8 -> (h, s, v) int32, cv2 ``COLOR_BGR2HSV`` 8u math
    (h in [0, 180)). The BGR convention matches the host pipeline, which
    jitters before its final BGR->RGB conversion exactly like the
    reference does."""
    x = rgb_u8.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    vmin = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - vmin
    sdiv, hdiv = _hsv_div_tables()
    half = 1 << (_HSV_SHIFT - 1)
    s = (diff * jnp.take(sdiv, v) + half) >> _HSV_SHIFT
    h_raw = jnp.where(v == r, g - b,
                      jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h_raw * jnp.take(hdiv, diff) + half) >> _HSV_SHIFT
    return h + jnp.where(h < 0, 180, 0), s, v


def hsv_bgr_u8(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(h [0,180), s, v uint8-ranged ints) -> [..., 3] RGB uint8, cv2
    ``COLOR_HSV2BGR`` 8u math.

    cv2's 8u path normalizes s and v by ``* (1.f/255)``, runs the float
    sector kernel, multiplies by ``255.f`` and TRUNCATES (a C cast, not
    cvRound) — reverse-engineered against the full 256x256 (s, v) grid:
    the hue-independent entries match cv2 bit-exactly (other
    round/association variants mismatch on 0.9-49% of the grid); the
    hue-interpolated entries land within 1 LSB on <0.05% of (h, s, v)
    triples (ULP-level differences in cv2's vectorized kernel)."""
    one = jnp.float32(1.0)
    r255 = jnp.float32(1.0 / 255.0)
    hf = h.astype(jnp.float32) * jnp.float32(6.0 / 180.0)
    sf = s.astype(jnp.float32) * r255
    vf = v.astype(jnp.float32) * r255
    sector = jnp.clip(jnp.floor(hf).astype(jnp.int32), 0, 5)
    frac = hf - sector.astype(jnp.float32)
    tab = jnp.stack([vf, vf * (one - sf), vf * (one - sf * frac),
                     vf * (one - sf * (one - frac))], axis=-1)
    # per-sector (b, g, r) tab indices — OpenCV's sector_data
    sector_data = jnp.asarray([[1, 3, 0], [1, 0, 2], [3, 0, 1],
                               [0, 2, 1], [0, 1, 3], [2, 1, 0]], jnp.int32)
    idx = jnp.take(sector_data, sector, axis=0)        # [..., 3] b,g,r
    bgr = jnp.take_along_axis(tab, idx, axis=-1)       # [..., 3]
    rgb = bgr[..., ::-1]
    return jnp.clip(jnp.trunc(rgb * jnp.float32(255.0)), 0, 255).astype(jnp.uint8)


def exact_hsv_jitter_u8(rgb_u8: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """The reference's LUT jitter on cv2 8u HSV: per-image ``gains``
    [B, 3] multiply (h % 180, clip s, clip v) with truncation — the exact
    ``((x*r) % 180).astype(u8)`` / ``clip(x*r, 0, 255).astype(u8)`` LUTs of
    augmentations.py:53-56 applied analytically."""
    h, s, v = bgr_hsv_u8(rgb_u8)
    gh = gains[:, 0, None, None]
    gs = gains[:, 1, None, None]
    gv = gains[:, 2, None, None]
    h2 = jnp.floor(jnp.mod(h.astype(jnp.float32) * gh, 180.0)).astype(jnp.int32)
    s2 = jnp.floor(jnp.clip(s.astype(jnp.float32) * gs, 0.0, 255.0)).astype(jnp.int32)
    v2 = jnp.floor(jnp.clip(v.astype(jnp.float32) * gv, 0.0, 255.0)).astype(jnp.int32)
    return hsv_bgr_u8(h2, s2, v2)


@functools.partial(jax.jit, static_argnames=("hgain", "sgain", "vgain",
                                             "flip_p", "hsv"))
def device_augment(
    rng: jax.Array,
    images: jnp.ndarray,
    annots: jnp.ndarray,
    hgain: float = 0.015,
    sgain: float = 0.7,
    vgain: float = 0.4,
    flip_p: float = 0.5,
    hsv: str = "approx",
):
    """Per-image HSV jitter + horizontal flip on device.

    images: [B, H, W, 3] float32 in [0, 1]; annots: [B, T, 5] normalized
    (cx flipped with the image; padding rows stay untouched).
    ``hsv='exact'`` runs the cv2-faithful uint8 LUT math (images are
    re-quantized to uint8 around the jitter, as every cv2 stage does);
    ``'approx'`` (default) is the float RGB-space approximation — measured
    accuracy-neutral over full soaks (RESULTS.md round-3 A/B).
    Returns (images, annots).
    """
    b = images.shape[0]
    k_h, k_s, k_v, k_f = jax.random.split(rng, 4)

    gains_h = 1.0 + jax.random.uniform(k_h, (b, 1, 1), minval=-1.0, maxval=1.0) * hgain
    gains_s = 1.0 + jax.random.uniform(k_s, (b, 1, 1), minval=-1.0, maxval=1.0) * sgain
    gains_v = 1.0 + jax.random.uniform(k_v, (b, 1, 1), minval=-1.0, maxval=1.0) * vgain

    if hsv == "exact":
        u8 = jnp.clip(jnp.round(images * 255.0), 0, 255).astype(jnp.uint8)
        gains = jnp.concatenate(
            [gains_h[:, :, 0], gains_s[:, :, 0], gains_v[:, :, 0]], axis=1)
        images = exact_hsv_jitter_u8(u8, gains).astype(jnp.float32) / 255.0
    else:
        hsv_img = rgb_to_hsv(images)
        h = (hsv_img[..., 0] * gains_h) % 1.0
        s = jnp.clip(hsv_img[..., 1] * gains_s, 0.0, 1.0)
        v = jnp.clip(hsv_img[..., 2] * gains_v, 0.0, 1.0)
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
        device_augment, hgain=0.015, sgain=0.7, vgain=0.4, flip_p=0.5,
        hsv=str(cfg.get("device_hsv", "approx")),
    )
