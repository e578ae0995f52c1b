"""torchinfo-style parameter summary (the reference prints one per train
script, e.g. train_yolov3.py:43)."""

from __future__ import annotations

import jax


def summarize(params, batch_stats=None) -> str:
    """Tabulate parameters by top-level module with totals."""
    rows: dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        top = path[0].key if path else "<root>"
        rows[top] = rows.get(top, 0) + leaf.size
        total += leaf.size
    lines = ["=" * 52, f"{'Module':<36}{'Params':>16}", "-" * 52]
    for name, count in sorted(rows.items()):
        lines.append(f"{name:<36}{count:>16,}")
    lines.append("-" * 52)
    lines.append(f"{'Total trainable params':<36}{total:>16,}")
    if batch_stats is not None:
        bn = sum(x.size for x in jax.tree_util.tree_leaves(batch_stats))
        lines.append(f"{'BatchNorm running stats':<36}{bn:>16,}")
    lines.append("=" * 52)
    return "\n".join(lines)
