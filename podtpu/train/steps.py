"""Jitted train/eval steps — the whole step is device-resident.

The reference's hot loop round-trips to CPU twice per step (target encoding
in a Python loop, per-image NMS syncs — SURVEY.md §3.1/§3.2). Here:

* ``make_train_step``: forward (bf16 convs on the MXU) + vectorized target
  encoding + loss + backward + optax update in ONE compiled program. Under a
  data mesh, inputs are sharded on batch and XLA emits the gradient psum
  over ICI.
* ``make_eval_step``: forward + loss + grid decode + padded NMS on device;
  only the [B, max_det, 6] survivors cross to the host for the (inherently
  dynamic) mAP bookkeeping.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from podtpu.losses import build_loss
from podtpu.ops.decode import decode_yolov1, decode_yolov2, decode_yolov3
from podtpu.ops.nms import batched_class_aware_nms
from podtpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    replicated_sharding,
)


def compiler_options(cfg: dict) -> dict | None:
    """XLA:TPU compiler options for the jitted steps.

    Sources (merged, env wins): a TPU-only measured default, the cfg
    ``xla_compiler_options`` mapping, then ``PODTPU_XLA_OPTS`` env as
    comma-separated ``flag=value`` pairs. These reach the TPU compiler
    per-program via ``jax.jit(compiler_options=...)`` (client-side
    XLA_FLAGS rejects tpu-only flags).

    Default: ``xla_tpu_scoped_vmem_limit_kib=32768`` — raising the fusion
    scoped-VMEM budget from 16 MB to 32 MB measured 984 vs 974 img/s on the
    batch-128 flagship step (v5e; 64 MB neutral, 96 MB -9%). Override via
    cfg or ``PODTPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=16384``.
    TPU-only flags are dropped on other backends (CPU tests).
    """
    import os

    on_tpu = jax.default_backend() == "tpu"
    opts = {"xla_tpu_scoped_vmem_limit_kib": 32768} if on_tpu else {}
    opts.update(cfg.get("xla_compiler_options") or {})
    for kv in os.environ.get("PODTPU_XLA_OPTS", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            opts[k.strip()] = v.strip()
    if not on_tpu:
        opts = {k: v for k, v in opts.items()
                if not k.startswith("xla_tpu")}
    return {k: str(v) for k, v in opts.items()} or None


def remat_policy(cfg: dict):
    """Fine-grained rematerialization policy for the train-step forward.

    Unlike the coarse ``remat_backbone`` (recompute whole stages, incl.
    their convs — measured dead end, RESULTS.md), these policies recompute
    only *elementwise* work (BN-apply/activation) in the backward, keyed on
    the ``checkpoint_name`` anchors in :class:`podtpu.models.layers.ConvBnAct`:

    * ``conv_out`` — save only pre-BN conv outputs (+ the [C]-sized BN batch
      stats); the post-activation tensors the default AD would also keep are
      recomputed from them (a bf16 multiply-add + act, fusable into the
      consuming gradient ops).
    * ``no_post_act`` — save everything the default would *except* the
      post-activation tensors (more conservative; pool/concat/head
      intermediates stay saved).

    Selected by env ``PODTPU_REMAT`` or cfg ``remat_policy``; default off
    (empty) = stock AD residual choice.
    """
    import os

    name = os.environ.get("PODTPU_REMAT", cfg.get("remat_policy") or "")
    if not name:
        return None
    if name == "conv_out":
        return jax.checkpoint_policies.save_only_these_names(
            "conv_out", "bn_stats")
    if name == "no_post_act":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "post_act")
    raise ValueError(f"unknown remat policy '{name}' "
                     "(expected conv_out | no_post_act)")


def _as_input(img: jnp.ndarray) -> jnp.ndarray:
    """Accept uint8 batches (host ships raw bytes; 4x less H2D) or
    pre-normalized floats."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img


def make_decoder(cfg: dict, multi_label: bool = False) -> Callable:
    """Config -> fn(raw head output(s)) -> [B, N, 6] candidates."""
    name = cfg["model"]
    num_classes = cfg["num_classes"]
    input_size = cfg["input_size"]
    if name == "yolov1":
        if multi_label:
            raise ValueError("multi_label needs per-box class scores; the "
                             "yolov1 head predicts one class set per cell")
        num_boxes = cfg["num_boxes"]
        return lambda preds: decode_yolov1(preds, num_classes, num_boxes, input_size)
    if name == "yolov2":
        anchors = cfg["scaled_anchors"]
        return lambda preds: decode_yolov2(preds, num_classes, anchors,
                                           input_size,
                                           multi_label=multi_label)
    if name in ("yolov3", "yolov4", "yolov4-tiny"):
        anchors = cfg["anchors"]
        return lambda preds: decode_yolov3(preds, num_classes, anchors,
                                           input_size,
                                           multi_label=multi_label)
    if name == "retinanet":
        if multi_label:
            raise ValueError("multi_label is a YOLO-head option; the "
                             "retinanet decoder is per-anchor single-label")
        from podtpu.ops.retina import decode_retinanet

        return lambda preds: decode_retinanet(preds, num_classes, input_size)
    raise ValueError(f"unknown model '{name}'")


def _decoder_and_nms(cfg: dict) -> tuple[Callable, Callable]:
    """The two halves of the deployment postprocess: raw preds -> [B, N, 6]
    candidates, and candidates -> padded NMS survivors."""
    nopts = cfg.get("nms_options") or {}
    decoder = make_decoder(cfg, multi_label=bool(nopts.get("multi_label")))
    conf_t = float(cfg.get("conf_threshold", 0.25))
    iou_t = float(cfg.get("nms_iou_threshold", 0.45))
    top_k = int(cfg.get("top_k_candidates", 512))
    max_det = int(cfg.get("max_detections", 100))
    merge = bool(nopts.get("merge"))
    agnostic = bool(nopts.get("agnostic"))
    classes = nopts.get("classes")
    classes = tuple(int(c) for c in classes) if classes else None
    # suppression backend (xla | xla_early | pallas); None defers to the
    # PODTPU_NMS_BACKEND env / the xla default — config wins so serving
    # exports bake the chosen backend into the artifact
    backend = nopts.get("backend")

    def nms(boxes):
        return batched_class_aware_nms(
            boxes, conf_t, iou_t, top_k=top_k, max_detections=max_det,
            backend=backend, agnostic=agnostic, merge=merge, classes=classes)

    return decoder, nms


def make_postprocess(cfg: dict) -> Callable:
    """Config -> fn(raw preds) -> (dets [B, max_det, 6], valid [B, max_det]).

    Decode + padded NMS — the deployment postprocess shared by the eval step
    and the serving exports (the reference's ``DecodeYoloVx`` unit,
    utils/yolov3_utils.py:62-90). cfg ``nms_options`` carries the dormant
    Ultralytics ``non_max_suppression`` variants (general.py:639-731):
    ``multi_label`` (one candidate per (anchor, class), conf = obj*cls),
    ``merge`` (weighted box fusion), ``agnostic`` (class-blind suppression),
    ``classes`` (keep-only filter).
    """
    decoder, nms = _decoder_and_nms(cfg)

    def postprocess(preds):
        return nms(decoder(preds))

    return postprocess


def tta_options(cfg: dict) -> dict | None:
    """cfg ``tta`` -> ``{"hflip": bool, "scales": tuple}`` (``None`` = off).

    Test-time augmentation for eval and serving: ``tta: true`` (or
    ``{hflip: true, scales: [0.83]}``) adds extra forwards — one on the
    horizontally flipped batch, one per extra scale (the batch resized
    into the top-left of a same-size gray canvas, YOLOv5 ``scale_img``
    style, so every branch keeps the SAME static shape) — mirrors/rescales
    the decoded candidates back, and feeds the merged set through the one
    NMS. One compiled program regardless (beyond the reference, which has
    no TTA surface)."""
    t = cfg.get("tta")
    if not t:
        return None
    t = dict(t) if isinstance(t, dict) else {}
    scales = tuple(float(s) for s in (t.get("scales") or ())
                   if float(s) != 1.0)
    if any(not 0.0 < s <= 1.0 for s in scales):
        raise ValueError(f"tta.scales must be in (0, 1]: same-canvas "
                         f"downscale branches (got {scales})")
    return {"hflip": bool(t.get("hflip", True)), "scales": scales}


def make_serve_fn(cfg: dict, apply_fn: Callable,
                  with_preds: bool = False) -> Callable:
    """The deployment graph: image batch -> (dets, valid).

    ``apply_fn(x) -> raw preds`` is the frozen-weights forward. Honors cfg
    ``tta`` (extra flipped forward, candidates merged pre-NMS) and all
    ``nms_options``. ``with_preds=True`` additionally returns the
    UN-augmented raw preds (the eval step computes its loss on them)."""
    decoder, nms = _decoder_and_nms(cfg)
    tta = tta_options(cfg)
    size = float(cfg["input_size"])

    def serve(x):
        preds = apply_fn(x)
        boxes = decoder(preds)
        if tta is not None:
            extra = []
            if tta["hflip"]:
                flipped = decoder(apply_fn(jnp.flip(x, axis=2)))
                # mirror the flipped-frame candidates back: cx -> W - cx
                flipped = flipped.at[..., 0].set(size - flipped[..., 0])
                extra.append(flipped)
            h, w = x.shape[1], x.shape[2]
            for s in tta["scales"]:
                # YOLOv5 scale_img: resize into the top-left of a same-size
                # gray canvas — every branch keeps the one static shape
                hs, ws = max(1, round(h * s)), max(1, round(w * s))
                small = jax.image.resize(
                    x, (x.shape[0], hs, ws, x.shape[3]), "bilinear")
                canvas = jnp.full_like(x, 0.447)
                canvas = canvas.at[:, :hs, :ws, :].set(small)
                cands = decoder(apply_fn(canvas))
                # candidates live in canvas pixels; the content occupies
                # [0, ws) x [0, hs) — rescale per axis by the EXACT ratio
                sx, sy = w / ws, h / hs
                cands = cands.at[..., 0].mul(sx).at[..., 2].mul(sx)
                cands = cands.at[..., 1].mul(sy).at[..., 3].mul(sy)
                extra.append(cands)
            if extra:
                boxes = jnp.concatenate([boxes] + extra, axis=1)
        dets, valid = nms(boxes)
        if with_preds:
            return preds, dets, valid
        return dets, valid

    return serve


def make_train_step(cfg: dict, mesh=None, donate: bool = True,
                    state_shardings=None, jit: bool = True):
    """Build the jitted ``(state, batch, rng) -> (state, metrics)`` step.

    ``jit=False`` returns the raw traceable function (no jit, shardings,
    donation, or compiler options applied) — for callers that embed the
    step inside a larger compiled program, e.g. the K-step ``lax.scan``
    dispatch amortizer in tools/bench_family.py (a nested jit cannot carry
    ``compiler_options``).

    ``state_shardings`` (a pytree of ``NamedSharding`` matching the
    TrainState, from :func:`podtpu.parallel.mesh.state_shardings`) selects
    the parameter layout under ``mesh``: ``None`` = replicated (pure DP);
    an FSDP tree keeps params/optimizer state/gradients sharded over the
    ``data`` axis at rest (GSPMD all-gathers per use, reduce-scatters the
    gradients). Batch images shard H over a ``space`` mesh axis when the
    mesh has one (spatial partitioning)."""
    loss_fn = build_loss(cfg)
    from podtpu.data.device_aug import make_device_augment, separable_affine
    from podtpu.train.optim import accum_steps
    from podtpu.train.state import ema_options

    device_aug = make_device_augment(cfg)
    device_geom = bool(cfg.get("device_geom", False))
    policy = remat_policy(cfg)
    skip_nonfinite = int(dict(cfg.get("optimizer_options", {}))
                         .get("skip_nonfinite", 0) or 0) > 0
    eopts = ema_options(cfg)
    ema_accum = accum_steps(cfg)

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if device_geom:
            # host shipped the un-warped letterboxed image + per-sample
            # (s, bx, by); the scale+translate affine runs here as two
            # batched MXU matmuls (boxes were transformed on host)
            img = separable_affine(_as_input(batch["img"]), batch["geom"])
            batch = {"img": img, "annot": batch["annot"]}
        if device_aug is not None:
            img = _as_input(batch["img"])
            img, annot = device_aug(jax.random.fold_in(step_rng, 1), img,
                                    batch["annot"])
            batch = {"img": img, "annot": annot}

        def forward(params, img):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )

        if policy is not None:
            forward = jax.checkpoint(forward, policy=policy)

        def objective(params):
            preds, updates = forward(params, _as_input(batch["img"]))
            loss = loss_fn(preds, batch["annot"])
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        new_stats = updates["batch_stats"]
        if skip_nonfinite:
            # the optimizer guard (optax.apply_if_finite) drops the param
            # update on a non-finite step; mirror it for the BN running
            # statistics, which would otherwise be poisoned permanently
            # (new = m*old + (1-m)*batch keeps a NaN forever)
            flat = (jax.tree_util.tree_leaves(grads)
                    + jax.tree_util.tree_leaves(new_stats))
            ok = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(x)) for x in flat]))
            new_stats = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                new_stats, state.batch_stats)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        if eopts is not None:
            # YOLOv5 ModelEMA update: d ramps from 0 toward ``decay`` over
            # ~tau optimizer updates (under gradient accumulation the
            # optimizer advances once per ``ema_accum`` micro-steps, so the
            # ramp counts those). The shadow tracks params AND the BN
            # running statistics — torch's ModelEMA decays every float in
            # the state_dict, buffers included.
            updates_n = (new_state.step // ema_accum).astype(jnp.float32)
            d = eopts["decay"] * (1.0 - jnp.exp(-updates_n / eopts["tau"]))
            if ema_accum > 1:
                # blend once per OPTIMIZER update, not per micro-step:
                # optax.MultiSteps applies the accumulated update on the
                # k-th micro-step (step % k == 0, 1-based); in between,
                # d=1 leaves the shadow untouched — k identical blends
                # would compound retention to decay**k
                d = jnp.where(new_state.step % ema_accum == 0, d, 1.0)
            src = {"params": new_state.params,
                   "batch_stats": new_state.batch_stats}
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema, src)
            new_state = new_state.replace(ema=new_ema)
        metrics = {"loss": loss}
        return new_state, metrics

    if not jit:
        return train_step

    opts = compiler_options(cfg)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                       compiler_options=opts)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    st = state_shardings if state_shardings is not None else repl
    batch_sh = {"img": image_sharding(mesh), "annot": data}
    if device_geom:
        batch_sh["geom"] = data
    return jax.jit(
        train_step,
        in_shardings=(st, batch_sh, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=opts,
    )


def make_multi_train_step(cfg: dict, mesh=None, donate: bool = True,
                          state_shardings=None):
    """K train steps in ONE dispatched program (cfg ``steps_per_dispatch``).

    A ``lax.scan`` of the train step over a [K, B, ...]-stacked batch group
    carries the donated state on device across all K optimizer updates, so
    per-dispatch overhead (host Python, tunnel latency, XLA launch) is paid
    once per K steps. MEASURED (interleaved A/B, v5e @416 batch 128):
    yolov4-tiny **+13.5%** (2822 vs 2486 img/s — its per-step dispatch gap
    was ~25%, tools/roofline_budget.py); yolov3 neutral (~10% gap;
    RESULTS.md dead-end ledger). Worth enabling for small/fast models or
    high-latency-attached hosts.

    Semantics are IDENTICAL to K sequential ``train_step`` calls on the
    same batches (the per-step RNG folds the step counter, which advances
    inside the scan). Returns metrics with a [K]-shaped ``loss``.
    """
    inner = make_train_step(cfg, mesh, jit=False)

    def multi_step(state, batches, rng):
        def body(st, b):
            st, m = inner(st, b, rng)
            return st, m["loss"]

        state, losses = jax.lax.scan(body, state, batches)
        return state, {"loss": losses}

    opts = compiler_options(cfg)
    donate_args = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi_step, donate_argnums=donate_args,
                       compiler_options=opts)

    from podtpu.parallel.mesh import stacked_sharding

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    st = state_shardings if state_shardings is not None else repl
    batch_sh = {"img": stacked_sharding(image_sharding(mesh)),
                "annot": stacked_sharding(data)}
    if bool(cfg.get("device_geom", False)):
        batch_sh["geom"] = stacked_sharding(data)
    return jax.jit(
        multi_step,
        in_shardings=(st, batch_sh, repl),
        out_shardings=(st, repl),
        donate_argnums=donate_args,
        compiler_options=opts,
    )


def make_stats_step(cfg: dict, mesh=None, momentum: float = 0.9,
                    state_shardings=None):
    """Forward-only BN-statistics step for SWA recalibration.

    Runs the model in train mode (mutable batch_stats) and inverts the EWMA
    update (``new = m*old + (1-m)*batch``) to recover THIS batch's raw
    mean/var, so the caller can average raw batch statistics cumulatively
    (torch.optim.swa_utils.update_bn semantics). ``momentum`` must match the
    model's BatchNorm momentum (torch default 0.1 == flax 0.9 — see
    podtpu/models/layers.py).
    """

    device_geom = bool(cfg.get("device_geom", False))

    def stats_step(state, batch, rng):
        img = _as_input(batch["img"])
        if device_geom:
            # recalibrate on the same warped distribution training sees
            from podtpu.data.device_aug import separable_affine

            img = separable_affine(img, batch["geom"])
        _, updates = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            updates["batch_stats"], state.batch_stats,
        )

    if mesh is None:
        return jax.jit(stats_step)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    st = state_shardings if state_shardings is not None else repl
    batch_sh = {"img": image_sharding(mesh), "annot": data}
    if device_geom:
        batch_sh["geom"] = data
    return jax.jit(
        stats_step,
        in_shardings=(st, batch_sh, repl),
        out_shardings=repl,
    )


def make_eval_step(cfg: dict, mesh=None, extra_variables: dict | None = None,
                   state_shardings=None):
    """Build the jitted eval step: loss + decoded, NMS'd detections.

    Returns ``(loss, detections [B, max_det, 6], valid [B, max_det])`` —
    detections in input-pixel cxcywh + conf + class, score-sorted.

    ``extra_variables`` merges additional collections into ``apply`` — e.g.
    the ``quant`` collection from :mod:`podtpu.export.quantize`, which flips
    every ConvBnAct to its int8 path (quantized evaluation / test.py
    --quantize int8). They are closed over, i.e. compiled in as constants.
    """
    loss_fn = build_loss(cfg)

    opts = compiler_options(cfg)

    def eval_step(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if extra_variables:
            variables.update(extra_variables)
        serve = make_serve_fn(
            cfg, lambda x: state.apply_fn(variables, x, train=False),
            with_preds=True)
        preds, dets, valid = serve(_as_input(batch["img"]))
        # loss always on the un-augmented forward (TTA affects detections)
        loss = loss_fn(preds, batch["annot"])
        return loss, dets, valid

    if mesh is None:
        return jax.jit(eval_step, compiler_options=opts)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    st = state_shardings if state_shardings is not None else repl
    return jax.jit(
        eval_step,
        in_shardings=(st, {"img": image_sharding(mesh), "annot": data}),
        out_shardings=(repl, data, data),
        compiler_options=opts,
    )


@jax.jit
def global_norm(tree) -> jnp.ndarray:
    """L2 norm over a pytree (debugging/monitoring helper)."""
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree))
    )
