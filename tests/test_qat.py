"""Quantization-aware training: STE fake-quant in ConvBnAct train mode.

QAT extends the int8 serving story (podtpu/export/quantize.py): training
sees the same symmetric abs-max int8 grid the PTQ artifact will use, so
post-training quantization of a QAT model loses less accuracy. The scheme
must leave the param tree, eval path, and export machinery untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.models.layers import ConvBnAct, _fake_quant


def test_fake_quant_values_and_ste():
    x = jnp.asarray(np.linspace(-2.0, 2.0, 101, dtype=np.float32))
    q = _fake_quant(x)
    # on the int8 grid of scale absmax/127
    s = 2.0 / 127.0
    np.testing.assert_allclose(np.asarray(q) / s,
                               np.round(np.asarray(q) / s), atol=1e-5)
    assert float(jnp.max(jnp.abs(q - x))) <= s / 2 + 1e-6
    # straight-through: d/dx sum(fq(x)) == 1 everywhere (scale detached)
    g = jax.grad(lambda v: jnp.sum(_fake_quant(v)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_fake_quant_per_channel_axis():
    w = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 3, 4, 8)).astype(np.float32))
    q = _fake_quant(w, axis=(0, 1, 2))
    absmax = np.max(np.abs(np.asarray(w)), axis=(0, 1, 2))
    scales = absmax / 127.0
    ratio = np.asarray(q) / scales[None, None, None, :]
    np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-4)


class TestConvBnActQat:
    def _block_and_input(self, qat):
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(2, 8, 8, 3)).astype(np.float32))
        block = ConvBnAct(16, 3, qat=qat)
        v = block.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        return block, v, x

    def test_param_tree_unchanged(self):
        _, v0, _ = self._block_and_input(qat=False)
        _, v1, _ = self._block_and_input(qat=True)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))

    def test_train_forward_quantized_eval_untouched(self):
        block, v, x = self._block_and_input(qat=True)
        blockf, _, _ = self._block_and_input(qat=False)
        yq, _ = block.apply(v, x, train=True, mutable=["batch_stats"])
        yf, _ = blockf.apply(v, x, train=True, mutable=["batch_stats"])
        # fake-quant perturbs the forward, but only slightly
        d = float(jnp.max(jnp.abs(yq - yf)))
        assert 0 < d < 0.2, d
        # eval mode ignores qat entirely
        ye_q = block.apply(v, x, train=False)
        ye_f = blockf.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(ye_q), np.asarray(ye_f))

    def test_gradients_flow_through_ste(self):
        block, v, x = self._block_and_input(qat=True)

        def loss(params):
            y, _ = block.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(y))

        g = jax.grad(loss)(v["params"])
        gk = np.asarray(g["conv"]["kernel"])
        assert np.all(np.isfinite(gk)) and np.any(gk != 0)


def test_factory_cfg_flag_threads_attribute():
    """qat is threaded per-model (no process-global): two models with
    different settings coexist."""
    from podtpu.models import build_model

    cfg = dict(model="yolov4-tiny", num_classes=4, input_size=64,
               anchors=[[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
               qat=True)
    m_on = build_model(cfg)
    cfg2 = dict(cfg)
    cfg2["qat"] = False
    m_off = build_model(cfg2)
    assert m_on.qat is True and m_off.qat is False


@pytest.mark.slow
def test_qat_train_step_end_to_end():
    """Full jitted train step with qat: loss finite, params move, and the
    PTQ pipeline consumes the resulting model unchanged."""
    from podtpu.export.quantize import quantize_for_serving
    from podtpu.models import build_model
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    cfg = dict(model="yolov4-tiny", num_classes=4, input_size=64,
               in_channels=3, compute_dtype="float32",
               anchors=[[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
               optimizer="sgd", optimizer_options={"lr": 1e-3},
               scheduler="multi_step",
               scheduler_options={"milestones": [100], "gamma": 0.1},
               max_annots=8, qat=True)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, rng)
    step = make_train_step(cfg, donate=False)
    r = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(r.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)),
        "annot": jnp.asarray(
            np.concatenate([
                r.uniform(0.3, 0.6, (2, 8, 4)),
                r.integers(0, 4, (2, 8, 1)),
            ], axis=-1).astype(np.float32)),
    }
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0

    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    qvars = quantize_for_serving(model, variables, [batch["img"]])
    assert "quant" in qvars
