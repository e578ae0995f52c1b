"""Model factory: config dict -> Flax module (utils/module_select.py analog)."""

from __future__ import annotations

import jax.numpy as jnp

from podtpu.models.yolov1 import YoloV1
from podtpu.models.yolov2 import YoloV2
from podtpu.models.yolov3 import YoloV3
from podtpu.models.yolov4_tiny import YoloV4Tiny

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def compute_dtype(cfg: dict):
    return _DTYPES[cfg.get("compute_dtype", "float32")]


def build_model(cfg: dict):
    """Instantiate the detector named by ``cfg['model']``.

    ``qat: true`` flips every ConvBnAct to fake-quantized train-mode
    forward (straight-through int8 QAT; see podtpu/models/layers.py) —
    threaded explicitly through the module tree, so models built with
    different qat settings coexist in one process.
    """
    name = cfg["model"]
    dtype = compute_dtype(cfg)
    qat = bool(cfg.get("qat", False))
    num_classes = cfg["num_classes"]
    if name == "yolov1":
        return YoloV1(num_classes=num_classes, num_boxes=cfg["num_boxes"],
                      dtype=dtype, qat=qat)
    if name == "yolov2":
        return YoloV2(
            num_classes=num_classes,
            num_anchors=len(cfg["scaled_anchors"]),
            dtype=dtype, qat=qat,
        )
    if name == "yolov3":
        return YoloV3(
            num_classes=num_classes, num_anchors=len(cfg["anchors"]),
            dtype=dtype, remat=bool(cfg.get("remat_backbone", False)),
            qat=qat,
        )
    if name == "yolov4-tiny":
        return YoloV4Tiny(
            num_classes=num_classes, num_anchors=len(cfg["anchors"]),
            dtype=dtype, qat=qat,
        )
    if name == "yolov4":
        from podtpu.models.yolov4 import YoloV4

        return YoloV4(
            num_classes=num_classes, num_anchors=len(cfg["anchors"]),
            dtype=dtype, qat=qat,
        )
    if name == "retinanet":
        from podtpu.models.retinanet import RetinaNet

        return RetinaNet(num_classes=num_classes, dtype=dtype, qat=qat)
    raise ValueError(f"unknown model '{name}'")
