"""Fused Pallas stem: conv3x3(ci->32) + BN(batch stats) + ReLU + 2x2 maxpool.

TPU-native replacement for the darknet stem zone (reference
models/backbone/darknet.py:53-60 — the 3->32 conv + BatchNorm + ReLU, and
the following MaxPool2d(2,2)). This is the measured throughput ceiling of
the whole train step (RESULTS.md "Round-2 MFU attack"): in train mode XLA
must materialize the [B,416,416,32] conv output once for the BN batch-stat
reduction, then re-read it for the BN+ReLU epilogue, the maxpool, and three
more times in the backward pass — ~20 ms of pure HBM traffic per batch-128
step for ~38 GFLOP of actual math.

Design (recompute instead of materialize):

* The conv is tiny in FLOPs (ci=3), so every pass RECOMPUTES it from a
  [B,ci,2,H+2,W/2+1] parity-split planar input (0.13 GB) instead of reading
  the 1.4 GB activation. Four passes total — fwd stats, fwd emit, bwd
  stat-grads, bwd weight-grads — touch ~1 GB combined vs ~10 GB for the
  XLA lowering.
* MXU formulation: per (image, 8-output-row tile) two im2col matrices
  ``A_even/A_odd`` of shape [3*ci*16, W/2] — one per output-x parity — are
  each built from 3*ci contiguous 10-sublane block copies (group (dx,ci)
  holds input rows y0..y0+9 from parity plane (dx+p)%2 at lane offset
  (dx+p)//2). ONE host-precomputed block-diagonal weight matrix
  ``W2[g*16 + t, r*32 + co] = w[t-r, dx, ci, co]`` serves both parities;
  each dot yields all 8 output rows at once: pre[x_half, r*32+co].
  K=144/N=256 keeps the MXU well fed; unused group rows (t=10..15) hit
  zero rows of ``W2``.
* The 2x2 pool is then STRIDE-FREE (Mosaic lowers strided sublane slices
  as unsupported gathers): x-pairs are the elementwise max of the two
  parity matmuls, y-pairs are adjacent 32-lane blocks. Tie-breaking
  replicates ``select_and_scatter`` / torch MaxPool2d first-match order
  (dy,dx)=(0,0),(0,1),(1,0),(1,1).
* Backward needs only (dW, dscale, dbias) — the stem has no upstream — and
  includes the exact train-mode BN stat-gradient terms:
  ``dpre = inv*(dy - mean(dy) - xhat*mean(dy*xhat))``.

Numerics match the XLA path (ConvBnAct + max_pool_2x2 with BatchNormMixed):
the f32 MXU accumulator is rounded to the compute dtype before the stats
and the affine, exactly where XLA's bf16 conv output is rounded.

The batch mean/var outputs feed the module's running-stat update only; they
are never differentiated (flax mutable collections are auxiliary), so their
cotangents are ignored in the VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8    # conv output rows per inner tile
_GROUP = 16  # sublane-aligned rows reserved per (dx, ci) im2col group


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _planarize(x: jnp.ndarray, cdtype) -> jnp.ndarray:
    """[B,H,W,ci] NHWC -> parity-split planar [B,ci,2,H+2,W//2+1].

    ``out[b,c,p,y,u] = x_padded[b,c,y,2u+p]`` — splitting output-x parity on
    the host lets the kernel read every conv tap as a contiguous lane slice.
    """
    B, H, W, ci = x.shape
    xp = jnp.pad(x.astype(cdtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.transpose(xp, (0, 3, 1, 2))          # [B,ci,H+2,W+2]
    xp = xp.reshape(B, ci, H + 2, (W + 2) // 2, 2)
    return jnp.transpose(xp, (0, 1, 4, 2, 3))     # [B,ci,2,H+2,(W+2)//2]


def _blockdiag_weights(w: jnp.ndarray, cdtype) -> jnp.ndarray:
    """[3,3,ci,co] HWIO -> [3*ci*_GROUP, _TILE*co] block-diagonal matrix.

    Row (dx*ci + c)*_GROUP + t holds, for output row r = t - dy, the tap
    w[dy, dx, c, :] at columns r*co..r*co+co. Rows t >= _TILE+2 stay zero so
    uninitialized im2col sublanes contribute nothing.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    w4 = jnp.zeros((kw, ci, _GROUP, _TILE, co), w.dtype)
    for dy in range(kh):
        for r in range(_TILE):
            w4 = w4.at[:, :, r + dy, r, :].set(w[dy])
    return w4.reshape(kw * ci * _GROUP, _TILE * co).astype(cdtype)


def _fold_groups(v: jnp.ndarray, co: int) -> jnp.ndarray:
    """[_TILE*co] per-(row,channel) lane vector -> [co] channel reduction."""
    return v.reshape(_TILE, co).sum(axis=0)


def _tile_vec(v: jnp.ndarray) -> jnp.ndarray:
    """[co] channel vector -> [1, _TILE*co] per-lane broadcast row."""
    return jnp.tile(v, (_TILE,))[None, :]


@functools.lru_cache(maxsize=None)
def make_fused_stem(H: int, W: int, ci: int, co: int, cdtype_name: str,
                    eps: float):
    """Factory: shape-specialized fused stem op with custom VJP.

    Returns ``f(x, w, scale, bias) -> (pooled, batch_mean, batch_var)`` where
    x is [B,H,W,ci] (any float dtype), w is [3,3,ci,co] HWIO f32, and pooled
    is [B,H//2,W//2,co] in the compute dtype. Only ``pooled`` carries
    gradients (to w/scale/bias; the stem consumes no input cotangent).
    """
    assert H % _TILE == 0 and W % 2 == 0, (H, W)
    cdtype = jnp.dtype(cdtype_name)
    K = 3 * ci * _GROUP
    N = _TILE * co
    Wh = W // 2
    ntiles = H // _TILE
    interp = _interpret()

    xp_spec = pl.BlockSpec((1, ci, 2, H + 2, Wh + 1),
                           lambda b: (b, 0, 0, 0, 0))
    w2_spec = pl.BlockSpec((K, N), lambda b: (0, 0))
    vec_spec = pl.BlockSpec((1, N), lambda b: (0, 0))
    # one grid step = one full image (the per-tile loop lives INSIDE the
    # kernel: thousands of tiny grid steps would drown in per-step fixed
    # costs). The lane-padded full-image block needs the VMEM limit raised —
    # v5e has 128 MB; everything here fits in ~50 MB.
    img_spec = pl.BlockSpec((1, H // 2, Wh, co), lambda b: (b, 0, 0, 0))
    acc_spec = lambda rows: pl.BlockSpec((rows, N), lambda b: (0, 0))
    scratch = [pltpu.VMEM((2, K, Wh), cdtype)]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def first_step():
        return pl.program_id(0) == 0

    def build_a(xp_ref, a, ti):
        """Fill A_even (a[0]) and A_odd (a[1]) for tile ti's 8 rows."""
        y0 = pl.multiple_of(ti * _TILE, _TILE)
        for p in range(2):
            for dx in range(3):
                for c in range(ci):
                    g = dx * ci + c
                    a[p, pl.ds(g * _GROUP, _TILE + 2), :] = xp_ref[
                        0, c, (dx + p) % 2,
                        pl.ds(y0, _TILE + 2), pl.ds((dx + p) // 2, Wh),
                    ]

    def conv_parity(a, w2_ref, p):
        """[Wh, N] pre-activations for output-x parity p; returns the
        compute-dtype rounding (XLA's bf16 conv output point) + f32 view."""
        pre = jax.lax.dot_general(
            a[p], w2_ref[:, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        prec = pre.astype(cdtype)
        return prec, prec.astype(jnp.float32)

    def window(vals_e, vals_o, j):
        """The 4 pool-window candidate blocks [Wh, co] for pooled row j, in
        torch first-match scan order (dy,dx)=(00),(01),(10),(11)."""
        lo, hi = (2 * j) * co, (2 * j + 1) * co
        return (vals_e[:, lo:hi], vals_o[:, lo:hi],
                vals_e[:, hi:hi + co], vals_o[:, hi:hi + co])

    def winners(y00, y01, y10, y11):
        """First-match argmax masks over the relu'd window values.

        Comparisons run in f32 (exact for bf16 inputs): the VPU has no bf16
        compare ('Target does not support this comparison')."""
        z00, z01 = jnp.maximum(y00, 0), jnp.maximum(y01, 0)
        z10, z11 = jnp.maximum(y10, 0), jnp.maximum(y11, 0)
        m = jnp.maximum(jnp.maximum(z00, z01), jnp.maximum(z10, z11))
        w00 = z00 == m
        w01 = (z01 == m) & ~w00
        w10 = (z10 == m) & ~w00 & ~w01
        w11 = (z11 == m) & ~w00 & ~w01 & ~w10
        return w00, w01, w10, w11

    def routed(y_views, gp):
        """Per-window-position dL/dy (pool routing x relu mask), f32."""
        y00, y01, y10, y11 = (v.astype(jnp.float32) for v in y_views)
        w00, w01, w10, w11 = winners(y00, y01, y10, y11)
        return (jnp.where(w00 & (y00 > 0), gp, 0.0),
                jnp.where(w01 & (y01 > 0), gp, 0.0),
                jnp.where(w10 & (y10 > 0), gp, 0.0),
                jnp.where(w11 & (y11 > 0), gp, 0.0))

    def stats_kernel(xp_ref, w2_ref, stats_ref, a):
        @pl.when(first_step())
        def _():
            stats_ref[:, :] = jnp.zeros_like(stats_ref)
            a[:, :, :] = jnp.zeros_like(a)

        def tile(ti, carry):
            s1, s2 = carry
            build_a(xp_ref, a, ti)
            for p in range(2):
                _, pref = conv_parity(a, w2_ref, p)
                s1 = s1 + jnp.sum(pref, axis=0, keepdims=True)
                s2 = s2 + jnp.sum(pref * pref, axis=0, keepdims=True)
            return s1, s2

        zero = jnp.zeros((1, N), jnp.float32)
        s1, s2 = jax.lax.fori_loop(0, ntiles, tile, (zero, zero))
        stats_ref[0:1, :] += s1
        stats_ref[1:2, :] += s2

    def emit_kernel(xp_ref, w2_ref, mul_ref, add_ref, out_ref, a):
        @pl.when(first_step())
        def _():
            a[:, :, :] = jnp.zeros_like(a)

        mul = mul_ref[:, :].astype(cdtype)
        add = add_ref[:, :].astype(cdtype)

        def tile(ti, _):
            build_a(xp_ref, a, ti)
            pe, _ = conv_parity(a, w2_ref, 0)
            po, _ = conv_parity(a, w2_ref, 1)
            ze = jnp.maximum(pe * mul + add, 0)
            zo = jnp.maximum(po * mul + add, 0)
            for j in range(_TILE // 2):
                v00, v01, v10, v11 = window(ze, zo, j)
                out_ref[0, ti * (_TILE // 2) + j] = jnp.maximum(
                    jnp.maximum(v00, v01), jnp.maximum(v10, v11)
                )
            return 0

        jax.lax.fori_loop(0, ntiles, tile, 0)

    def bwd_sums_kernel(xp_ref, w2_ref, mul_ref, add_ref, mean_ref, rinv_ref,
                        g_ref, sums_ref, a):
        @pl.when(first_step())
        def _():
            sums_ref[:, :] = jnp.zeros_like(sums_ref)
            a[:, :, :] = jnp.zeros_like(a)

        mul = mul_ref[:, :].astype(cdtype)
        add = add_ref[:, :].astype(cdtype)

        def tile(ti, carry):
            sdy, sdyx = carry
            build_a(xp_ref, a, ti)
            pe, pfe = conv_parity(a, w2_ref, 0)
            po, pfo = conv_parity(a, w2_ref, 1)
            ye = pe * mul + add
            yo = po * mul + add
            xe = (pfe - mean_ref[:, :]) * rinv_ref[:, :]
            xo = (pfo - mean_ref[:, :]) * rinv_ref[:, :]
            # collect per-output-row [1, co] partial sums in lane order and
            # join with ONE concat (lane-sliced .at updates lower to
            # unsupported scatters on TPU)
            dy_parts, dyx_parts = [], []
            for j in range(_TILE // 2):
                gp = g_ref[0, ti * (_TILE // 2) + j].astype(jnp.float32)
                d00, d01, d10, d11 = routed(window(ye, yo, j), gp)
                x00, x01, x10, x11 = window(xe, xo, j)
                dy_parts.append(jnp.sum(d00 + d01, axis=0, keepdims=True))
                dy_parts.append(jnp.sum(d10 + d11, axis=0, keepdims=True))
                dyx_parts.append(
                    jnp.sum(d00 * x00 + d01 * x01, axis=0, keepdims=True))
                dyx_parts.append(
                    jnp.sum(d10 * x10 + d11 * x11, axis=0, keepdims=True))
            sdy = sdy + jnp.concatenate(dy_parts, axis=1)
            sdyx = sdyx + jnp.concatenate(dyx_parts, axis=1)
            return sdy, sdyx

        zero = jnp.zeros((1, N), jnp.float32)
        sdy, sdyx = jax.lax.fori_loop(0, ntiles, tile, (zero, zero))
        sums_ref[0:1, :] += sdy
        sums_ref[1:2, :] += sdyx

    def bwd_dw_kernel(xp_ref, w2_ref, mul_ref, add_ref, mean_ref, rinv_ref,
                      inv_ref, c0_ref, c1_ref, g_ref, dw2_ref, a):
        @pl.when(first_step())
        def _():
            dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
            a[:, :, :] = jnp.zeros_like(a)

        mul = mul_ref[:, :].astype(cdtype)
        add = add_ref[:, :].astype(cdtype)

        def tile(ti, acc):
            build_a(xp_ref, a, ti)
            pe, pfe = conv_parity(a, w2_ref, 0)
            po, pfo = conv_parity(a, w2_ref, 1)
            ye = pe * mul + add
            yo = po * mul + add
            xe = (pfe - mean_ref[:, :]) * rinv_ref[:, :]
            xo = (pfo - mean_ref[:, :]) * rinv_ref[:, :]
            e_parts, o_parts = [], []
            for j in range(_TILE // 2):
                gp = g_ref[0, ti * (_TILE // 2) + j].astype(jnp.float32)
                d00, d01, d10, d11 = routed(window(ye, yo, j), gp)
                e_parts += [d00, d10]
                o_parts += [d01, d11]
            dye = jnp.concatenate(e_parts, axis=1)
            dyo = jnp.concatenate(o_parts, axis=1)
            dpe = inv_ref[:, :] * (dye - c0_ref[:, :] - xe * c1_ref[:, :])
            dpo = inv_ref[:, :] * (dyo - c0_ref[:, :] - xo * c1_ref[:, :])
            return acc + jax.lax.dot_general(
                a[0], dpe.astype(cdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                a[1], dpo.astype(cdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, ntiles, tile, jnp.zeros((K, N), jnp.float32))
        dw2_ref[:, :] += acc

    def run_stats(xp, w2):
        return pl.pallas_call(
            stats_kernel,
            grid=(xp.shape[0],),
            in_specs=[xp_spec, w2_spec],
            out_specs=acc_spec(2),
            out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )(xp, w2)

    def run_emit(xp, w2, mulv, addv):
        B = xp.shape[0]
        return pl.pallas_call(
            emit_kernel,
            grid=(B,),
            in_specs=[xp_spec, w2_spec, vec_spec, vec_spec],
            out_specs=img_spec,
            out_shape=jax.ShapeDtypeStruct((B, H // 2, Wh, co), cdtype),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )(xp, w2, mulv, addv)

    def run_bwd_sums(xp, w2, mulv, addv, meanv, rinvv, g):
        return pl.pallas_call(
            bwd_sums_kernel,
            grid=(xp.shape[0],),
            in_specs=[xp_spec, w2_spec, vec_spec, vec_spec, vec_spec,
                      vec_spec, img_spec],
            out_specs=acc_spec(2),
            out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )(xp, w2, mulv, addv, meanv, rinvv, g)

    def run_bwd_dw(xp, w2, mulv, addv, meanv, rinvv, invv, c0v, c1v, g):
        return pl.pallas_call(
            bwd_dw_kernel,
            grid=(xp.shape[0],),
            in_specs=[xp_spec, w2_spec, vec_spec, vec_spec, vec_spec,
                      vec_spec, vec_spec, vec_spec, vec_spec, img_spec],
            out_specs=acc_spec(K),
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )(xp, w2, mulv, addv, meanv, rinvv, invv, c0v, c1v, g)

    @jax.custom_vjp
    def fused(x, w, scale, bias):
        out, _ = _fwd(x, w, scale, bias)
        return out

    def _fwd(x, w, scale, bias):
        """Shared forward; returns ((pooled, mean, var), residuals)."""
        B = x.shape[0]
        n = B * H * W
        xp = _planarize(x, cdtype)
        w2 = _blockdiag_weights(w.astype(jnp.float32), cdtype)
        stats = run_stats(xp, w2)
        mean = _fold_groups(stats[0], co) / n
        var = _fold_groups(stats[1], co) / n - jnp.square(mean)
        inv = jax.lax.rsqrt(var + eps) * scale
        mul = inv.astype(cdtype)
        add = (bias - mean * inv).astype(cdtype)
        pooled = run_emit(xp, w2, _tile_vec(mul).astype(jnp.float32),
                          _tile_vec(add).astype(jnp.float32))
        xmark = jnp.zeros((0,), x.dtype)  # carries x's dtype for the dx aval
        res = (xp, w2, mul, add, mean, var, inv, jnp.float32(n), xmark)
        return (pooled, mean, var), res

    def _bwd(res, cts):
        gp = cts[0]  # mean/var cotangents: running-stat aux only, ignored
        xp, w2, mul, add, mean, var, inv, n, xmark = res
        gp = gp.astype(cdtype)
        mulv = _tile_vec(mul).astype(jnp.float32)
        addv = _tile_vec(add).astype(jnp.float32)
        meanv = _tile_vec(mean)
        rinvv = _tile_vec(jax.lax.rsqrt(var + eps))
        sums = run_bwd_sums(xp, w2, mulv, addv, meanv, rinvv, gp)
        sdy = _fold_groups(sums[0], co)
        sdyx = _fold_groups(sums[1], co)
        dscale = sdyx
        dbias = sdy
        invv = _tile_vec(inv)
        c0v = _tile_vec(sdy / n)
        c1v = _tile_vec(sdyx / n)
        dw2 = run_bwd_dw(xp, w2, mulv, addv, meanv, rinvv, invv, c0v, c1v, gp)
        d5 = dw2.reshape(3, ci, _GROUP, _TILE, co)
        dw = jnp.stack(
            [sum(d5[:, :, r + dy, r, :] for r in range(_TILE))
             for dy in range(3)], axis=0)  # [dy, dx, ci, co] == HWIO
        dx = jnp.zeros((gp.shape[0], H, W, ci), xmark.dtype)
        return dx, dw, dscale, dbias

    fused.defvjp(lambda x, w, s, b: _fwd(x, w, s, b), _bwd)
    return fused


def stem_pool_reference(x, w, scale, bias, eps, cdtype):
    """Pure-XLA mirror of ConvBnAct(co,3)+max_pool_2x2 in train mode.

    Used by tests as the numerical oracle; matches BatchNormMixed +
    nn.max_pool semantics (podtpu/models/layers.py).
    """
    xc = x.astype(cdtype)
    pre = jax.lax.conv_general_dilated(
        xc, w.astype(cdtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(cdtype)
    x32 = pre.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps) * scale
    mul = inv.astype(cdtype)
    add = (bias - mean * inv).astype(cdtype)
    z = jnp.maximum(pre * mul + add, 0)
    b, h, wd, c = z.shape
    zp = jnp.max(z.reshape(b, h // 2, 2, wd // 2, 2, c), axis=(2, 4))
    return zp, mean, var
