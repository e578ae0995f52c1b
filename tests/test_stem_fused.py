"""Fused Pallas stem (conv+BN+ReLU+pool) parity vs the XLA lowering.

The op must reproduce ConvBnAct(32,3)+max_pool_2x2 train-mode semantics
(podtpu/models/layers.py — itself locked to the reference's
models/layers/conv_block.py:5-21 + MaxPool2d(2,2)): forward values, batch
statistics, and the full train-mode BN backward (stat-gradient terms
included). Runs in Pallas interpret mode on CPU (tests/conftest.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.ops.pallas.stem_fused import make_fused_stem, stem_pool_reference

B, H, W, CI, CO = 2, 16, 24, 3, 32
EPS = 1e-5


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(B, H, W, CI)).astype(np.float32))
    w = jnp.asarray((r.normal(size=(3, 3, CI, CO)) * 0.2).astype(np.float32))
    scale = jnp.asarray(r.uniform(0.5, 1.5, CO).astype(np.float32))
    bias = jnp.asarray((r.normal(size=CO) * 0.1).astype(np.float32))
    return x, w, scale, bias


def _cotangent(shape, cdtype):
    t = np.sin(np.arange(np.prod(shape)).reshape(shape) * 0.1)
    return jnp.asarray(t.astype(np.float32)).astype(cdtype)


@pytest.mark.parametrize("cdtype", ["float32", "bfloat16"])
def test_forward_and_stats_match_xla(cdtype):
    x, w, scale, bias = _inputs()
    fused = make_fused_stem(H, W, CI, CO, cdtype, EPS)
    pooled, mean, var = jax.jit(fused)(x, w, scale, bias)
    rp, rm, rv = stem_pool_reference(x, w, scale, bias, EPS, jnp.dtype(cdtype))
    assert pooled.dtype == jnp.dtype(cdtype)
    tol = 1e-5 if cdtype == "float32" else 1e-6  # bf16 rounds identically
    np.testing.assert_allclose(
        np.asarray(pooled, np.float32), np.asarray(rp, np.float32), atol=tol
    )
    np.testing.assert_allclose(np.asarray(mean), np.asarray(rm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(rv), atol=1e-5)


def test_f32_gradients_match_autodiff():
    """In f32 (no rounding ties) the custom VJP must match XLA autodiff of
    the same math to float precision — this pins the BN stat-gradient
    terms, the relu mask, and the pool routing."""
    x, w, scale, bias = _inputs()
    fused = make_fused_stem(H, W, CI, CO, "float32", EPS)
    t = _cotangent((B, H // 2, W // 2, CO), jnp.float32)

    def lf(w_, s_, b_):
        return jnp.sum(fused(x, w_, s_, b_)[0] * t)

    def lr(w_, s_, b_):
        return jnp.sum(stem_pool_reference(x, w_, s_, b_, EPS, jnp.float32)[0] * t)

    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(w, scale, bias)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(w, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_bf16_gradient_direction():
    """bf16 rounding makes pool-window ties common, and tie routing is
    implementation-defined across lowerings (first-match here and in
    torch/select_and_scatter; jnp.max autodiff splits). Assert direction
    agreement rather than elementwise equality."""
    x, w, scale, bias = _inputs()
    fused = make_fused_stem(H, W, CI, CO, "bfloat16", EPS)
    t = _cotangent((B, H // 2, W // 2, CO), jnp.float32)

    def lf(w_, s_, b_):
        return jnp.sum(fused(x, w_, s_, b_)[0].astype(jnp.float32) * t)

    def lr(w_, s_, b_):
        p = stem_pool_reference(x, w_, s_, b_, EPS, jnp.bfloat16)[0]
        return jnp.sum(p.astype(jnp.float32) * t)

    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(w, scale, bias)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(w, scale, bias)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.995, cos


def test_no_input_gradient_needed():
    """The stem is the first layer: dx is never consumed; the VJP returns a
    (DCE-able) zero cotangent rather than computing one."""
    x, w, scale, bias = _inputs()
    fused = make_fused_stem(H, W, CI, CO, "float32", EPS)
    dx = jax.grad(lambda x_: jnp.sum(fused(x_, w, scale, bias)[0]))(x)
    assert not np.any(np.asarray(dx))


@pytest.mark.slow
class TestModuleIntegration:
    """Darknet19 with PODTPU_STEM=fused: identical param tree, matching
    forward/batch-stats, and the eval path untouched."""

    def _model_and_batch(self):
        from podtpu.models.darknet import Darknet19

        r = np.random.default_rng(1)
        x = jnp.asarray(r.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        # tap stage1 (one conv after the fused stem) so float-association
        # noise isn't amplified through 18 more BN layers
        model = Darknet19(out_indices=(1,), dtype=jnp.float32)
        return model, x

    def test_param_tree_identical_and_forward_close(self, monkeypatch):
        model, x = self._model_and_batch()
        monkeypatch.delenv("PODTPU_STEM", raising=False)
        v0 = model.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        y0, u0 = model.apply(v0, x, train=True, mutable=["batch_stats"])

        monkeypatch.setenv("PODTPU_STEM", "fused")
        v1 = model.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        y1, u1 = model.apply(v0, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y0[0]), np.asarray(y1[0]), rtol=1e-3, atol=1e-3
        )
        s0 = u0["batch_stats"]["stage0"]["conv0"]["bn"]
        s1 = u1["batch_stats"]["stage0"]["conv0"]["bn"]
        np.testing.assert_allclose(
            np.asarray(s0["mean"]), np.asarray(s1["mean"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s0["var"]), np.asarray(s1["var"]), atol=1e-5
        )

    def test_eval_path_never_fused(self, monkeypatch):
        """stem_fusable must reject eval mode (calibration/export/serving
        always see the stock modules)."""
        from podtpu.models.stem import stem_fusable

        model, x = self._model_and_batch()
        monkeypatch.setenv("PODTPU_STEM", "fused")
        assert stem_fusable(x, True, (5,))
        assert not stem_fusable(x, False, (5,))
        assert not stem_fusable(x, True, (0, 5))  # pre-pool tap consumer
        bad_h = jnp.zeros((2, 30, 32, 3))
        assert not stem_fusable(bad_h, True, (5,))
        monkeypatch.setenv("PODTPU_STEM", "xla")
        assert not stem_fusable(x, True, (5,))
