"""Console progress formatting.

Parity: reference show_train.jl — per-target initial/current train+val
metric rows on the progress display (:70-89) and the rich TrainResults show
(:32-68, implemented as ``TrainResults.__repr__``).
"""

from __future__ import annotations

from typing import Dict

__all__ = ["format_progress", "progress_table"]


def _fmt(v) -> str:
    try:
        return f"{float(v):.5g}"
    except (TypeError, ValueError):
        return str(v)


def progress_table(init_snapshot, snapshot) -> str:
    """Per-metric, per-target table of initial → current train/val losses."""
    lines = []
    header = f"  {'metric':<12} {'target':<12} {'train₀':>10} {'train':>10} {'val₀':>10} {'val':>10}"
    lines.append(header)
    lines.append("  " + "─" * (len(header) - 2))
    for metric, targets in snapshot.l_train.items():
        for target, val in targets.items():
            t0 = init_snapshot.l_train.get(metric, {}).get(target, float("nan"))
            v0 = init_snapshot.l_val.get(metric, {}).get(target, float("nan"))
            v = snapshot.l_val.get(metric, {}).get(target, float("nan"))
            lines.append(
                f"  {metric:<12} {target:<12} {_fmt(t0):>10} {_fmt(val):>10} "
                f"{_fmt(v0):>10} {_fmt(v):>10}"
            )
    return "\n".join(lines)


def format_progress(init_snapshot, snapshot, epoch: int, nepochs: int) -> str:
    return f"epoch {epoch}/{nepochs}\n" + progress_table(init_snapshot, snapshot)
