"""Shared config/batch construction for the two-process DP test, imported by
both the pytest parent and the spawned workers so the single-process
reference step runs on bit-identical inputs."""

import numpy as np

CFG = {
    "model": "yolov4-tiny",
    "num_classes": 3,
    "input_size": 96,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                [20, 24], [32, 28], [40, 44], [56, 52]],
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-3, "momentum": 0.9},
    "batch_size": 8,
    "max_annots": 8,
    # validate phase: permissive NMS so the random-weight model emits
    # detections to aggregate
    "conf_threshold": 0.05,
    "nms_iou_threshold": 0.45,
    "top_k_candidates": 32,
    "max_detections": 10,
}


def make_global_batch(ds, pad_annotations):
    """Deterministic global batch of 8 samples (fixed per-sample seeds)."""
    samples = [ds.get(i, 1000 + i) for i in range(8)]
    imgs = np.stack([s[0] for s in samples])
    annots = pad_annotations([s[1] for s in samples], CFG["max_annots"])
    return imgs, annots
