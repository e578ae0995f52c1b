"""Train state: params + BN statistics + optimizer state + step counter.

The functional analog of the reference's LightningModule-held state
(module/yolov3_detector.py:10-18 plus torch's implicit BN buffers and
optimizer state). Serialized wholesale by orbax for checkpoint/resume.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import core
from flax import struct
from flax.training import train_state

from podtpu.models import build_model
from podtpu.train.optim import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)
    # Optional EMA shadow of {params, batch_stats} (cfg ``ema``); ``None``
    # when disabled, so the pytree structure (and checkpoints) only carry
    # it when the feature is on.
    ema: Any = struct.field(pytree_node=True, default=None)


def ema_options(cfg: dict) -> dict | None:
    """Parse cfg ``ema`` into ``{decay, tau, eval}`` (``None`` = disabled).

    ``ema: true`` takes the YOLOv5 ModelEMA defaults (decay 0.9999 with the
    ``decay * (1 - exp(-updates / 2000))`` warm-up ramp); a mapping overrides
    ``decay``/``tau``/``eval``. ``eval: true`` (default) validates and
    selects ``best`` with the EMA weights — the behavior the reference's
    dormant ``strip_optimizer`` expects of checkpoints (utils/general.py:
    735-744 replaces ``model`` with the ``ema`` entry when present).
    """
    e = cfg.get("ema")
    if not e:
        return None
    if isinstance(e, (int, float)) and not isinstance(e, bool):
        # ``ema: 0.995`` reads naturally as the decay
        e = {"decay": float(e)}
    e = dict(e) if isinstance(e, dict) else {}
    return {
        "decay": float(e.get("decay", 0.9999)),
        "tau": float(e.get("tau", 2000.0)),
        "eval": bool(e.get("eval", True)),
    }


def create_train_state(cfg: dict, rng: jax.Array) -> TrainState:
    """Init the model named in ``cfg`` and wrap it with its optimizer.

    ``cfg['backbone_pretrained']`` may point at a weights ``.npz`` (e.g. from
    ``pretrain_darknet.py``); matching leaves — the ``backbone`` scope —
    are loaded, the rest keep their init (the reference's partial-load
    recipe: models/backbone/darknet.py:134-150, train_yolov4-tiny.py:32-34).
    """
    model = build_model(cfg)
    size = cfg["input_size"]
    dummy = jax.numpy.zeros((1, size, size, cfg.get("in_channels", 3)),
                            jax.numpy.float32)
    # jit the array-producing init: eager model.init dispatches each of the
    # model's ~70 convs as its own device call — ~130 s of round trips over
    # the remote-TPU tunnel vs seconds as one compiled program (measured,
    # RESULTS.md round-12). Values are identical (same RNG draws). Static
    # fields (apply_fn, tx) stay host-assembled — jitting the whole
    # constructor leaks tracers through them. Multi-process runs keep the
    # eager path: every process computes the same replicated init locally,
    # and a jitted program would commit outputs to local devices only.
    if jax.process_count() == 1:
        variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    else:
        variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    tx = build_optimizer(cfg, params)
    opt_state = (jax.jit(tx.init)(params) if jax.process_count() == 1
                 else tx.init(params))
    state = TrainState(
        step=0, apply_fn=model.apply, params=params, tx=tx,
        opt_state=opt_state, batch_stats=batch_stats,
    )
    pretrained = cfg.get("backbone_pretrained")
    if pretrained:
        from podtpu.export.weights import load_npz_weights

        state = load_npz_weights(state, pretrained, allow_partial=True)
    if ema_options(cfg) is not None:
        # the shadow starts from the state's CURRENT weights (after any
        # pretrained partial load); distinct buffers — params and shadow
        # are both donated by the train step, so they must not alias
        state = init_ema(state)
    return state


def init_ema(state: TrainState) -> TrainState:
    """(Re)seed the EMA shadow from the state's current weights."""
    return state.replace(ema=jax.tree_util.tree_map(
        jax.numpy.copy,
        {"params": state.params, "batch_stats": state.batch_stats}))


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
