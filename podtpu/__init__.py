"""podtpu — a TPU-native object-detection framework (JAX / Flax / optax / orbax / Pallas).

A from-scratch re-design of the capabilities of the PyTorch reference
``myungsanglee/PyTorch-Object-Detection`` (YOLOv1/v2/v3/v4-tiny on Darknet-19 /
CSP-tiny backbones, YAML-config train/eval/inference CLIs, anchor-based target
assignment with CIoU losses, burn-in LR schedules, grid decode + class-aware
NMS, VOC-style mAP@.5, auto-anchor, checkpointing, export tooling), built
TPU-first:

* fixed static shapes everywhere (padded annotations, padded NMS) so XLA
  compiles one program;
* the whole train step — model, target encoding, loss — is device-resident
  (the reference encodes targets in a Python loop on CPU every step);
* data parallelism is a 1-D ``jax.sharding.Mesh`` with XLA collectives over
  ICI instead of DDP/NCCL process groups;
* NHWC layout and bf16 matmul/conv compute feeding the MXU.
"""

__version__ = "0.1.0"

from podtpu.config import get_configs, load_yaml_file  # noqa: F401
