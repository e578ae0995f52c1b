from podtpu.losses.focal import focal_loss  # noqa: F401
from podtpu.losses.yolov1 import yolov1_loss  # noqa: F401
from podtpu.losses.yolov2 import yolov2_loss, yolov2_loss_v2  # noqa: F401
from podtpu.losses.yolov3 import yolov3_loss, yolov3_loss_v2, yolov3_loss_v3  # noqa: F401


def build_loss(cfg: dict):
    """Config -> loss fn ``loss(preds, annots) -> scalar`` (active variants).

    Mirrors the reference's module wiring: YoloV2LossV2 for yolov2
    (module/yolov2_detector.py:14) and YoloV3LossV2 for yolov3 / yolov4-tiny
    (module/yolov3_detector.py:16, train_yolov4-tiny.py:38-41). Full yolov4
    joins the YoloV3LossV2 group (same three-head contract).
    """
    name = cfg["model"]
    if name == "yolov1":
        return lambda preds, annots: yolov1_loss(
            preds, annots, cfg["num_classes"], cfg["num_boxes"]
        )
    if name == "yolov2":
        return lambda preds, annots: yolov2_loss_v2(
            preds, annots, cfg["num_classes"], cfg["scaled_anchors"]
        )
    if name in ("yolov3", "yolov4", "yolov4-tiny"):
        return lambda preds, annots: yolov3_loss_v2(
            preds, annots, cfg["num_classes"], cfg["anchors"], cfg["input_size"]
        )
    if name == "retinanet":
        from podtpu.ops.retina import retinanet_loss

        return lambda preds, annots: retinanet_loss(
            preds, annots, cfg["num_classes"], cfg["input_size"]
        )
    raise ValueError(f"unknown model '{name}'")
