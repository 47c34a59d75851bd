"""Output path resolution.

Parity: reference ``TrainingPaths`` (src/config/TrainingPaths.jl:4-19) and
``get_output_path``/``resolve_paths`` (src/io/save.jl:111-132,
src/io/paths.jl:1-14) — default folder ``output_tmp/`` relative to the
working directory, overridable to any absolute/custom folder.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

__all__ = ["TrainingPaths", "resolve_paths"]


@dataclasses.dataclass(frozen=True)
class TrainingPaths:
    output_dir: str
    checkpoint_dir: str       # per-epoch params/state snapshots
    best_model: str           # best (params, state) file
    config_yaml: str          # run-config snapshot
    history_json: str         # per-epoch loss histories
    history_png: str          # final dashboard image
    history_mp4: str          # dashboard recording
    metrics_jsonl: str = ""   # live per-epoch JSONL metric stream


def resolve_paths(cfg, model_name: Optional[str] = None) -> TrainingPaths:
    name = model_name or getattr(cfg, "model_name", "hybrid_model")
    folder = getattr(cfg, "output_folder", None) or os.path.join(
        os.getcwd(), "output_tmp"
    )
    base = os.path.join(folder, name)
    os.makedirs(os.path.join(base, "checkpoints"), exist_ok=True)
    return TrainingPaths(
        output_dir=base,
        checkpoint_dir=os.path.join(base, "checkpoints"),
        best_model=os.path.join(base, f"best_{name}.pkl"),
        config_yaml=os.path.join(base, f"config_{name}.yaml"),
        history_json=os.path.join(base, f"history_{name}.json"),
        history_png=os.path.join(base, f"history_{name}.png"),
        history_mp4=os.path.join(base, f"history_{name}.mp4"),
        metrics_jsonl=os.path.join(base, f"metrics_{name}.jsonl"),
    )
