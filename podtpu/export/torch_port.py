"""Bidirectional torch <-> podtpu weight interop for the reference models.

The reference (myungsanglee/PyTorch-Object-Detection) stores weights as torch
``state_dict``s — either plain (``lightning2torch.py:52-63`` output) or inside
a Lightning ``.ckpt`` under ``state_dict`` with a ``model.`` prefix. This
module maps those names/layouts onto podtpu's flax variable trees (and back),
so that

* a checkpoint trained in the reference can be scored/fine-tuned in podtpu;
* a podtpu checkpoint can be exported for the reference's torch tooling;
* the parity tests can instantiate the *actual* reference ``nn.Module``s
  (shimming their ``torchinfo``/``torchvision`` imports), port the weights,
  and assert forward/loss equality live — the strongest VOC-parity proxy
  available without the dataset.

Name mapping (torch module path -> flax path), per model:

* darknet19 backbone inside a detector: ``backbone_features_module.<stage>.
  <seq>`` (``FeatureListNet`` of the 6 stage ``Sequential``s —
  models/backbone/darknet.py:15-43,89-94) -> ``backbone/stage<i>/conv<j>``
  where ``<j>`` counts convs only (maxpools hold a Sequential slot but no
  params).
* layout: torch conv ``[O,I,kh,kw]`` -> flax ``[kh,kw,I,O]``; BatchNorm
  ``weight/bias/running_mean/running_var`` -> ``scale/bias`` params and
  ``mean/var`` batch_stats; ``num_batches_tracked`` is dropped (and
  regenerated as 0 on the reverse trip).
* YOLOv1's ``Linear`` consumes an NCHW flatten; podtpu flattens NHWC, so the
  kernel is permuted through ``[out,C,H,W] -> [H,W,C,out]`` (and back).

No torch import is required here — tensors are accepted as anything numpy
can view (the callers detach/cpu torch tensors).
"""

from __future__ import annotations

import importlib
import sys
import types
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

REFERENCE_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# Mapping tables: (torch_prefix, flax_path, kind)
#   kind "convbn": Conv2dBnRelu/Conv2dBnAct/Conv2dBn block
#        "conv":   raw bias-free nn.Conv2d (prediction heads)
#        "linear": nn.Linear after an NCHW flatten (YOLOv1 fc)
# ---------------------------------------------------------------------------

# darknet.py:53-94 stage configs: conv-entry/'M' layout per Sequential.
_DARKNET_STAGES = (
    ("stem", (1,)),            # 1 conv
    ("layer1", (0, 1)),        # M, conv
    ("layer2", (0, 1, 1, 1)),  # M, conv, conv, conv
    ("layer3", (0, 1, 1, 1)),
    ("layer4", (0, 1, 1, 1, 1, 1)),
    ("layer5", (0, 1, 1, 1, 1, 1)),
)


def _darknet_entries(torch_prefix_fmt: str) -> List[Tuple[str, Tuple[str, ...], str]]:
    """Entries for the 6 darknet stages.

    ``torch_prefix_fmt`` receives (stage_index, stage_name) and returns the
    torch prefix of that stage's Sequential — numeric for ``FeatureListNet``
    (``backbone_features_module.2``), named for ``_Darknet19`` (``layer2``).
    """
    entries = []
    for i, (stage_name, slots) in enumerate(_DARKNET_STAGES):
        stage_prefix = torch_prefix_fmt.format(i=i, name=stage_name)
        conv_idx = 0
        for seq_idx, is_conv in enumerate(slots):
            if not is_conv:
                continue  # MaxPool2d slot
            entries.append(
                (f"{stage_prefix}.{seq_idx}",
                 ("backbone", f"stage{i}", f"conv{conv_idx}"), "convbn")
            )
            conv_idx += 1
    return entries


def _backbone_entries():
    return _darknet_entries("backbone_features_module.{i}")


def _yolov1_entries():
    e = _backbone_entries()
    for j in range(5):  # yolov1.py:23-33 five Conv2dBnRelu
        e.append((f"yolov1_head.{j}", (f"head{j}",), "convbn"))
    # Sequential slots 5/6 are Flatten/Dropout; 7 is the Linear (yolov1.py:34-38)
    e.append(("yolov1_head.7", ("fc",), "linear"))
    return e


def _yolov2_entries():
    e = _backbone_entries()
    e += [
        ("b4_layer.0", ("b4_layer",), "convbn"),        # yolov2.py:22-24
        ("b5_layer.0", ("b5_layer0",), "convbn"),       # yolov2.py:26-29
        ("b5_layer.1", ("b5_layer1",), "convbn"),
        ("yolov2_head.0", ("head_conv",), "convbn"),    # yolov2.py:31-34
        ("yolov2_head.1", ("head", "conv"), "conv"),
    ]
    return e


def _yolov3_entries():
    e = _backbone_entries()
    for k in (3, 4, 5):  # yolov3.py:23-39 squeeze/expand trios
        for j in range(3):
            e.append((f"c{k}_conv.{j}", (f"c{k}_conv", f"c{j}"), "convbn"))
    e += [
        ("c4_route.0", ("c4_route",), "convbn"),        # yolov3.py:41-51
        ("c5_route.0", ("c5_route",), "convbn"),
    ]
    for k in (3, 4, 5):  # yolov3.py:53-69 heads: expand conv + raw 1x1
        e.append((f"p{k}_head.0", (f"p{k}_head", "expand"), "convbn"))
        e.append((f"p{k}_head.1", (f"p{k}_head", "pred", "conv"), "conv"))
    return e


def _yolov4_tiny_entries():
    # yolov4_tiny.py:22-79
    e = [
        ("stem.0", ("stem",), "convbn"),
        ("layer1.0", ("layer1_0",), "convbn"),
        ("layer1.1", ("layer1_1",), "convbn"),
        ("layer2.1", ("layer2",), "convbn"),     # slot 0 is MaxPool2d
        ("layer3.1", ("layer3",), "convbn"),
        ("layer4.1", ("layer4_0",), "convbn"),
        ("layer4.2", ("layer4_1",), "convbn"),
        ("b4_conv", ("b4_conv",), "convbn"),
        ("b4_route.0", ("b4_route",), "convbn"),
        ("b5_route.0", ("b5_route",), "convbn"),
        ("p3_head.0", ("p3_expand",), "convbn"),
        ("p3_head.1", ("p3_pred", "conv"), "conv"),
        ("p4_head", ("p4_pred", "conv"), "conv"),  # direct Conv2d (yolov4_tiny.py:73)
        ("p5_head.0", ("p5_expand",), "convbn"),
        ("p5_head.1", ("p5_pred", "conv"), "conv"),
    ]
    for n, _ in ((1, 32), (2, 64), (3, 128)):  # conv_block.py:57-70
        for j in (1, 2, 3):
            e.append((f"tiny_block{n}.conv{j}", (f"tiny_block{n}", f"conv{j}"), "convbn"))
    return e


def _darknet19_classifier_entries():
    # Plain _Darknet19 with named stages + classifier head (darknet.py:89-102)
    e = _darknet_entries("{name}")
    e.append(("classifier.0", ("classifier",), "convbn"))
    return e


MODEL_ENTRIES = {
    "yolov1": _yolov1_entries,
    "yolov2": _yolov2_entries,
    "yolov3": _yolov3_entries,
    "yolov4-tiny": _yolov4_tiny_entries,
    "darknet19": _darknet19_classifier_entries,
}


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _set(tree: dict, path: Tuple[str, ...], leaf_name: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _get(tree: dict, path: Tuple[str, ...], leaf_name: str) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node[leaf_name])


def strip_lightning_prefix(state_dict: Dict) -> Dict:
    """``model.``-prefixed Lightning ckpt state_dict -> plain (lightning2torch.py:52-63)."""
    out = OrderedDict()
    for k, v in state_dict.items():
        out[k[len("model."):] if k.startswith("model.") else k] = v
    return out


def torch_to_podtpu(state_dict: Dict, model_name: str) -> Dict:
    """Reference torch ``state_dict`` -> podtpu ``{'params':…, 'batch_stats':…}``.

    Every mapped torch key must be present; any *unmapped* parameter key left
    over raises (so silent partial ports can't masquerade as full ones).
    """
    entries = MODEL_ENTRIES[model_name]()
    params: dict = {}
    stats: dict = {}
    consumed = set()

    def take(key: str) -> np.ndarray:
        if key not in state_dict:
            raise KeyError(f"{model_name}: torch key {key!r} missing")
        consumed.add(key)
        return _np(state_dict[key])

    for tp, fp, kind in entries:
        if kind == "convbn":
            w = take(f"{tp}.conv.weight").transpose(2, 3, 1, 0)
            _set(params, fp + ("conv",), "kernel", w)
            _set(params, fp + ("bn",), "scale", take(f"{tp}.bn.weight"))
            _set(params, fp + ("bn",), "bias", take(f"{tp}.bn.bias"))
            _set(stats, fp + ("bn",), "mean", take(f"{tp}.bn.running_mean"))
            _set(stats, fp + ("bn",), "var", take(f"{tp}.bn.running_var"))
            consumed.add(f"{tp}.bn.num_batches_tracked")
        elif kind == "conv":
            _set(params, fp, "kernel", take(f"{tp}.weight").transpose(2, 3, 1, 0))
        elif kind == "linear":
            w = take(f"{tp}.weight")  # [out, C*H*W] over an NCHW flatten
            out_f = w.shape[0]
            # YOLOv1's flatten input is [B,256,7,7] (yolov1.py:32-34)
            w = w.reshape(out_f, 256, 7, 7).transpose(2, 3, 1, 0).reshape(-1, out_f)
            _set(params, fp, "kernel", w)
            _set(params, fp, "bias", take(f"{tp}.bias"))
        else:  # pragma: no cover
            raise ValueError(kind)

    leftovers = [k for k in state_dict
                 if k not in consumed and not k.endswith("num_batches_tracked")]
    if leftovers:
        raise KeyError(f"{model_name}: unmapped torch keys: {leftovers[:8]}"
                       f"{'…' if len(leftovers) > 8 else ''}")
    return {"params": params, "batch_stats": stats}


def podtpu_to_torch(variables: Dict, model_name: str) -> "OrderedDict[str, np.ndarray]":
    """podtpu variables -> reference-layout state_dict (numpy values).

    The caller wraps values in torch tensors if a ``.pt`` file is wanted —
    keeping this module torch-free.
    """
    entries = MODEL_ENTRIES[model_name]()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()

    for tp, fp, kind in entries:
        if kind == "convbn":
            out[f"{tp}.conv.weight"] = _get(params, fp + ("conv",), "kernel").transpose(3, 2, 0, 1)
            out[f"{tp}.bn.weight"] = _get(params, fp + ("bn",), "scale")
            out[f"{tp}.bn.bias"] = _get(params, fp + ("bn",), "bias")
            out[f"{tp}.bn.running_mean"] = _get(stats, fp + ("bn",), "mean")
            out[f"{tp}.bn.running_var"] = _get(stats, fp + ("bn",), "var")
            out[f"{tp}.bn.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        elif kind == "conv":
            out[f"{tp}.weight"] = _get(params, fp, "kernel").transpose(3, 2, 0, 1)
        elif kind == "linear":
            k = _get(params, fp, "kernel")  # [H*W*C, out]
            out_f = k.shape[1]
            out[f"{tp}.weight"] = (
                k.reshape(7, 7, 256, out_f).transpose(3, 2, 0, 1).reshape(out_f, -1)
            )
            out[f"{tp}.bias"] = _get(params, fp, "bias")
    return out


# ---------------------------------------------------------------------------
# Reference-module import shims
# ---------------------------------------------------------------------------

def install_reference_shims():
    """Stub ``torchinfo`` and ``torchvision.ops`` so the reference's model and
    loss modules import on this box (both are absent by design; neither is on
    the loss/forward math path — torchinfo.summary is a pretty-printer,
    torchvision.ops.batched_nms is only called from the NMS eval path)."""
    if "torchinfo" not in sys.modules:
        ti = types.ModuleType("torchinfo")
        ti.summary = lambda *a, **k: None
        sys.modules["torchinfo"] = ti
    if "torchvision" not in sys.modules:
        import torch  # local: only needed when shims are requested

        def _nms(boxes, scores, iou_threshold):
            """Greedy NMS matching torchvision.ops.nms semantics (CPU torch)."""
            order = torch.argsort(scores, descending=True)
            keep = []
            while order.numel() > 0:
                i = order[0]
                keep.append(i.item())
                if order.numel() == 1:
                    break
                rest = order[1:]
                xy1 = torch.maximum(boxes[i, :2], boxes[rest, :2])
                xy2 = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
                inter = (xy2 - xy1).clamp(min=0).prod(dim=1)
                area_i = (boxes[i, 2:] - boxes[i, :2]).clamp(min=0).prod()
                area_r = (boxes[rest, 2:] - boxes[rest, :2]).clamp(min=0).prod(dim=1)
                iou = inter / (area_i + area_r - inter + 1e-16)
                order = rest[iou <= iou_threshold]
            return torch.as_tensor(keep, dtype=torch.long)

        def _batched_nms(boxes, scores, idxs, iou_threshold):
            if boxes.numel() == 0:
                return torch.empty((0,), dtype=torch.long)
            offsets = idxs.to(boxes) * (boxes.max() + 1)
            return _nms(boxes + offsets[:, None], scores, iou_threshold)

        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = _nms
        ops.batched_nms = _batched_nms
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if "pkg_resources" not in sys.modules:
        # removed from setuptools on this box; the reference's utils/general.py
        # imports it for version checks only (general.py:252-276)
        pr = types.ModuleType("pkg_resources")
        def _parse_version(v):
            # int-only tuples so tied prefixes compare ('1.9.0+cpu' vs
            # '1.9.0' must not compare str>=int); local suffixes (+cpu)
            # and non-numeric tails contribute their leading digits only
            import re

            parts = []
            for x in str(v).split("."):
                m = re.match(r"\d+", x)
                parts.append(int(m.group()) if m else 0)
            return tuple(parts)

        pr.parse_version = _parse_version
        pr.parse_requirements = lambda f: iter(())
        pr.require = lambda r: None
        sys.modules["pkg_resources"] = pr


def import_reference(module_name: str, root: str = REFERENCE_ROOT):
    """Import a module from the reference tree (e.g. ``models.detector.yolov3``)."""
    install_reference_shims()
    if root not in sys.path:
        sys.path.insert(0, root)
    return importlib.import_module(module_name)
