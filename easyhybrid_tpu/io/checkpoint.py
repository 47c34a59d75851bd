"""Checkpointing: per-epoch params/state snapshots, best model, histories.

Parity: the reference's JLD2 checkpoint writers/readers and training save
hooks (reference: src/io/save.jl:3-96, src/io/checkpoints.jl:1-37) —
per-epoch groups of (ps, st) + tracked physical params + losses, a separate
best-model file, and a final predictions/observations dump.

Formats: pytrees (nested dicts of numpy arrays) written per epoch under
``<run>/checkpoints/epoch_NNNN.{pkl,orbax}``; losses in ``history_*.json``;
config snapshot via :mod:`..config.yaml_io`.

* ``"pickle"`` (default) — one file per epoch; keeps arbitrary pytrees
  (params, optax states) without a schema, mirroring JLD2's role.
* ``"orbax"`` (``TrainConfig.checkpoint_format="orbax"``) — the TPU-native
  answer for large multi-chip states: tensorstore-backed directories with
  integrity metadata, async-safe layout, and sharded-array support; reads
  back through the same :func:`load_pytree`/:func:`load_group` API.
"""

from __future__ import annotations

import json
import os
import pickle
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from .paths import TrainingPaths, resolve_paths

__all__ = [
    "save_pytree",
    "load_pytree",
    "load_checkpoint",
    "load_group",
    "get_all_groups",
    "CheckpointWriter",
    "resolve_paths",
]


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)


def _orbax_checkpointer():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "checkpoint_format='orbax' needs the optional dependency "
            "orbax-checkpoint (pip install easyhybrid-tpu[orbax])"
        ) from e

    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any, format: str = "pickle") -> None:
    """Write a pytree checkpoint. ``format="orbax"`` (or a path ending in
    ``.orbax``) uses an orbax/tensorstore directory instead of pickle."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if format == "orbax" or path.endswith(".orbax"):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        _orbax_checkpointer().save(os.path.abspath(path), _to_numpy(tree))
        return
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(tree), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path: str) -> Any:
    """Read a checkpoint written by :func:`save_pytree` (either format —
    orbax checkpoints are directories, pickles are files)."""
    if os.path.isdir(path):
        return _orbax_checkpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)


_EPOCH_RE = re.compile(r"epoch_(\d+)\.(pkl|orbax)$")


def _epoch_files(ckpt_dir: str) -> List[str]:
    """Epoch checkpoint filenames sorted numerically by epoch (not
    lexicographically — %04d padding breaks past epoch 9999), skipping any
    stray non-checkpoint files."""
    found = []
    for fname in os.listdir(ckpt_dir):
        m = _EPOCH_RE.match(fname)
        if m:
            found.append((int(m.group(1)), fname))
    return [fname for _, fname in sorted(found)]


def _is_orbax_dir(path: str) -> bool:
    return path.endswith(".orbax") or os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA")
    )


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint file or, given a run directory, its best model."""
    if os.path.isdir(path) and not _is_orbax_dir(path):
        for candidate in sorted(os.listdir(path)):
            if candidate.startswith("best_") and (
                candidate.endswith(".pkl") or candidate.endswith(".orbax")
            ):
                return load_pytree(os.path.join(path, candidate))
        ckpt_dir = os.path.join(path, "checkpoints")
        if os.path.isdir(ckpt_dir):
            epochs = _epoch_files(ckpt_dir)
            if epochs:
                return load_pytree(os.path.join(ckpt_dir, epochs[-1]))
        raise FileNotFoundError(f"no checkpoint found under {path}")
    return load_pytree(path)


def load_group(run_dir: str, group: str = "params") -> List[Any]:
    """Epoch-sorted collection of one field across all epoch checkpoints
    (parity: ``load_group``, save.jl:66-77)."""
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    out = []
    for fname in _epoch_files(ckpt_dir):
        ck = load_pytree(os.path.join(ckpt_dir, fname))
        out.append(ck.get(group))
    return out


def get_all_groups(run_dir: str) -> List[str]:
    """Keys stored per epoch (parity: ``get_all_groups``, save.jl:79-96)."""
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    for fname in _epoch_files(ckpt_dir):
        return sorted(load_pytree(os.path.join(ckpt_dir, fname)).keys())
    return []


class CheckpointWriter:
    """Training save hooks (parity: save_initial_state!/save_epoch!/
    save_final!, src/io/checkpoints.jl:1-37)."""

    def __init__(self, paths: TrainingPaths, model, cfg, data_cfg=None):
        self.paths = paths
        self.model = model
        self.cfg = cfg
        self.data_cfg = data_cfg
        self.format = getattr(cfg, "checkpoint_format", "pickle") or "pickle"
        self._ext = ".orbax" if self.format == "orbax" else ".pkl"
        self._history: List[Dict[str, Any]] = []

    def _tracked(self, params, state) -> Dict[str, float]:
        """Tracked physical parameters per epoch (save.jl:20-30 analog)."""
        tracked = {}
        for name in getattr(self.cfg, "tracked_params", ()) or ():
            if name in params.get("globals", {}):
                from ..params import scale_param

                lo = self.model.parameters.lower_of(name)
                up = self.model.parameters.upper_of(name)
                tracked[name] = float(
                    np.asarray(scale_param(params["globals"][name], lo, up))[0]
                )
            elif name in state.get("fixed", {}):
                tracked[name] = float(np.asarray(state["fixed"][name])[0])
        return tracked

    def save_initial(self, params, state) -> None:
        self.save_epoch(params, state, None, 0)
        try:
            from ..config.yaml_io import save_hybrid_config

            save_hybrid_config(
                self.paths.config_yaml, self.model, self.cfg, self.data_cfg
            )
        except Exception as e:  # config snapshot is best-effort
            import logging

            logging.getLogger("easyhybrid_tpu").warning(
                "could not write config snapshot: %s", e
            )

    def save_epoch(self, params, state, snapshot, epoch: int) -> None:
        record = {
            "params": _to_numpy(params),
            "state": _to_numpy(state),
            "epoch": epoch,
            "physical_params": self._tracked(params, state),
        }
        if snapshot is not None:
            record["training_loss"] = snapshot.l_train
            record["validation_loss"] = snapshot.l_val
            self._history.append(
                {
                    "epoch": epoch,
                    "training_loss": snapshot.l_train,
                    "validation_loss": snapshot.l_val,
                    "physical_params": record["physical_params"],
                }
            )
        save_pytree(
            os.path.join(
                self.paths.checkpoint_dir, f"epoch_{epoch:04d}{self._ext}"
            ),
            record,
            format=self.format,
        )
        with open(self.paths.history_json, "w") as f:
            json.dump(self._history, f)

    def save_final(self, results) -> None:
        best_path = self.paths.best_model
        if self.format == "orbax":
            best_path = os.path.splitext(best_path)[0] + ".orbax"
        save_pytree(
            best_path,
            {
                "params": results.params,
                "state": results.state,
                "best_epoch": results.best_epoch,
                "best_loss": results.best_loss,
                "predictions": {
                    "train": {
                        c: np.asarray(results.train_pred[c])
                        for c in results.train_pred.columns
                    },
                    "val": {
                        c: np.asarray(results.val_pred[c])
                        for c in results.val_pred.columns
                    },
                },
                "observations": {
                    "train": {
                        c: np.asarray(results.train_obs[c])
                        for c in results.train_obs.columns
                    },
                    "val": {
                        c: np.asarray(results.val_obs[c])
                        for c in results.val_obs.columns
                    },
                },
            },
            format=self.format,
        )
