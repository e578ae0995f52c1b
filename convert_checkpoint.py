"""Checkpoint converters (lightning2torch.py analog).

* orbax train-state checkpoint -> flat weights-only ``.npz``
  (the ``strip_optimizer``/weights-export path);
* ``.npz`` -> fresh orbax checkpoint (restore-from-weights).

    python convert_checkpoint.py --cfg ... --ckpt saved/.../checkpoints/best \
        --out pretrained_weights.npz
"""

from __future__ import annotations

import argparse

import jax

from podtpu.config import get_configs, setup_platform
from podtpu.export.weights import save_npz_weights
from podtpu.train.state import create_train_state
from podtpu.train.trainer import CheckpointIO, restore_weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", required=True, type=str)
    ap.add_argument("--out", type=str, default="pretrained_weights.npz")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt.endswith(".npz"):
        from podtpu.export.weights import load_npz_weights

        state = load_npz_weights(state, args.ckpt, allow_partial=True)
        io = CheckpointIO(args.out)
        io.save("converted", state)
        print(f"wrote orbax checkpoint to {args.out}/converted")
    else:
        state = restore_weights(args.ckpt, state)
        save_npz_weights(state, args.out)
        print(f"wrote weights-only npz to {args.out}")


if __name__ == "__main__":
    main()
