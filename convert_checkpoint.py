"""Checkpoint converters (lightning2torch.py analog + torch interop).

* orbax train-state checkpoint -> flat weights-only ``.npz``
  (the ``strip_optimizer``/weights-export path);
* ``.npz`` -> fresh orbax checkpoint (restore-from-weights);
* ``--from-torch``: a reference torch ``.pt`` state_dict or Lightning
  ``.ckpt`` -> podtpu ``.npz`` (the reverse of lightning2torch.py:52-63 —
  makes reference-trained checkpoints directly scoreable in podtpu);
* ``--to-torch``: podtpu checkpoint -> reference-layout torch ``.pt``
  loadable with ``load_state_dict(strict=True)``.

    python convert_checkpoint.py --cfg ... --ckpt saved/.../checkpoints/best \
        --out pretrained_weights.npz
    python convert_checkpoint.py --cfg configs/yolov3_voc.yaml \
        --from-torch epoch=189.ckpt --out yolov3_voc.npz
    python convert_checkpoint.py --cfg configs/yolov3_voc.yaml \
        --ckpt saved/yolov3_voc/version_0/checkpoints/best --to-torch out.pt
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from podtpu.config import get_configs, setup_platform
from podtpu.export.weights import SEP, _flatten, save_npz_weights
from podtpu.train.state import create_train_state
from podtpu.train.trainer import CheckpointIO, restore_weights


def torch_file_to_npz(path: str, model_name: str, out: str) -> str:
    """Reference ``.pt``/Lightning ``.ckpt`` -> podtpu weights ``.npz``."""
    import torch

    from podtpu.export.torch_port import strip_lightning_prefix, torch_to_podtpu

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = strip_lightning_prefix(sd)
    variables = torch_to_podtpu(sd, model_name)
    arrays = {}
    arrays.update(_flatten(variables["params"], "params" + SEP))
    arrays.update(_flatten(variables["batch_stats"], "batch_stats" + SEP))
    np.savez(out, **arrays)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--from-torch", type=str, default=None,
                    help="reference torch .pt / lightning .ckpt to import")
    ap.add_argument("--to-torch", type=str, default=None,
                    help="write a reference-layout torch .pt to this path")
    ap.add_argument("--use-ema", action="store_true",
                    help="convert the checkpoint's EMA shadow weights — the "
                         "strip_optimizer `model = ema` step "
                         "(reference utils/general.py:735-744)")
    ap.add_argument("--out", type=str, default="pretrained_weights.npz")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)

    if args.from_torch:
        out = torch_file_to_npz(args.from_torch, cfg["model"], args.out)
        print(f"wrote podtpu weights npz to {out}")
        return

    if not args.ckpt:
        raise SystemExit("--ckpt required unless --from-torch is given")

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt.endswith(".npz"):
        if args.use_ema:
            raise SystemExit("--use-ema reads an orbax train-state "
                             "checkpoint (npz files are already weights-only)")
        from podtpu.export.weights import load_npz_weights

        state = load_npz_weights(state, args.ckpt, allow_partial=True)
    else:
        state = restore_weights(args.ckpt, state, use_ema=args.use_ema)

    if args.to_torch:
        import torch

        from podtpu.export.torch_port import podtpu_to_torch

        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
              for k, v in podtpu_to_torch(variables, cfg["model"]).items()}
        torch.save(sd, args.to_torch)
        print(f"wrote reference-layout torch state_dict to {args.to_torch}")
        return

    if args.ckpt.endswith(".npz"):
        if args.out.endswith(".npz"):
            raise SystemExit(
                "npz -> orbax conversion: --out is the orbax checkpoint "
                f"DIRECTORY and must not end in .npz (got '{args.out}')")
        io = CheckpointIO(args.out)
        io.save("converted", state)
        print(f"wrote orbax checkpoint to {args.out}/converted")
    else:
        save_npz_weights(state, args.out)
        print(f"wrote weights-only npz to {args.out}")


if __name__ == "__main__":
    main()
