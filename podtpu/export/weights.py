"""Weights-only checkpoint conversion (lightning2torch.py:52-63 /
strip_optimizer analogs).

* ``save_npz_weights``: train state -> flat ``.npz`` of params + BN stats
  (no optimizer state) — the deployable artifact;
* ``load_npz_weights``: restore into a freshly-initialized state; with
  ``allow_partial=True`` it loads the intersection (the reference's
  ``load_state_dict(sd, strict=False)`` partial-transfer recipe,
  train_yolov4-tiny.py:32-34).
"""

from __future__ import annotations

import numpy as np

SEP = "::"


def _flatten(tree, prefix=""):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[prefix + key] = np.asarray(leaf)
    return out


def save_npz_weights(state, path: str) -> str:
    arrays = {}
    arrays.update(_flatten(state.params, "params" + SEP))
    arrays.update(_flatten(state.batch_stats, "batch_stats" + SEP))
    np.savez(path, **arrays)
    return path


def load_npz_weights(state, path: str, allow_partial: bool = False):
    import jax

    data = dict(np.load(path))

    def rebuild(tree, prefix):
        flat_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        treedef = jax.tree_util.tree_structure(tree)
        leaves = []
        missing = []
        for path, leaf in flat_paths:
            key = prefix + SEP.join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            if key in data:
                arr = data[key]
                if arr.shape != leaf.shape:
                    raise ValueError(
                        f"shape mismatch for {key}: ckpt {arr.shape} vs "
                        f"model {leaf.shape}"
                    )
                leaves.append(arr.astype(leaf.dtype))
            else:
                missing.append(key)
                leaves.append(np.asarray(leaf))
        if missing and not allow_partial:
            raise KeyError(f"missing weights: {missing[:5]}... "
                           f"({len(missing)} total); pass allow_partial=True")
        return jax.tree_util.tree_unflatten(treedef, leaves), missing

    params, miss_p = rebuild(state.params, "params" + SEP)
    stats, miss_s = rebuild(state.batch_stats, "batch_stats" + SEP)
    if allow_partial and (miss_p or miss_s):
        n_total = (len(jax.tree_util.tree_leaves(state.params))
                   + len(jax.tree_util.tree_leaves(state.batch_stats)))
        n_miss = len(miss_p) + len(miss_s)
        print(f"partial load: {n_total - n_miss}/{n_total} leaves loaded "
              f"from {path}, {n_miss} kept at init")
    state = state.replace(params=params, batch_stats=stats)
    if getattr(state, "ema", None) is not None:
        # an EMA-enabled state's shadow must not stay at the (random) init
        # the loaded weights just replaced — reseed it from them
        from podtpu.train.state import init_ema

        state = init_ema(state)
    return state
