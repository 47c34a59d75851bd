"""Epoch snapshots and training history.

Parity: ``EpochSnapshot`` (reference src/training/initialization.jl:53-58),
``TrainingHistory`` (src/training/history.jl:1-9) and the ``WrappedTuples``
history access used for plotting (src/utils/wrap_tuples.jl).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

__all__ = ["EpochSnapshot", "TrainingHistory"]


@dataclasses.dataclass
class EpochSnapshot:
    """Per-epoch record: nested metric dicts + (optional) prediction dicts."""

    l_train: Dict[str, Dict[str, float]]
    l_val: Dict[str, Dict[str, float]]
    y_hat_train: Optional[Dict[str, Any]] = None
    y_hat_val: Optional[Dict[str, Any]] = None


def _agg_loss(
    metrics: Dict[str, Dict[str, float]], agg_name: str,
    metric: Optional[str] = None,
) -> float:
    """Aggregated scalar of the monitored metric (parity: extract_agg_loss,
    early_stopping.jl:46-48 — the first ``loss_types`` entry). The lookup
    must be BY NAME: metric dicts that round-tripped through a jitted
    program come back key-sorted, so the positionally-first entry is the
    alphabetically-first metric, not ``loss_types[0]``."""
    if metric is not None and metric in metrics:
        return float(metrics[metric][agg_name])
    first = next(iter(metrics.values()))
    return float(first[agg_name])


@dataclasses.dataclass
class TrainingHistory:
    """Epoch-indexed snapshots; index 0 is the initial (untrained) state."""

    snapshots: List[EpochSnapshot] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        pass

    def append(self, snapshot: EpochSnapshot) -> None:
        self.snapshots.append(snapshot)

    def __len__(self):
        return len(self.snapshots)

    def __getitem__(self, i):
        return self.snapshots[i]

    def train_losses(self) -> List[Dict[str, Dict[str, float]]]:
        return [s.l_train for s in self.snapshots]

    def val_losses(self) -> List[Dict[str, Dict[str, float]]]:
        return [s.l_val for s in self.snapshots]

    def series(self, metric: str, which: str = "val") -> Dict[str, List[float]]:
        """Per-target (and agg) loss trajectories for one metric name —
        the WrappedTuples dot-access analog for plotting."""
        out: Dict[str, List[float]] = {}
        for snap in self.snapshots:
            m = (snap.l_val if which == "val" else snap.l_train).get(metric, {})
            for k, v in m.items():
                out.setdefault(k, []).append(float(v))
        return out
