"""Training / data configuration records and results.

Parity: reference ``TrainConfig`` (src/config/TrainingConfig.jl:9-160,
24 fields), ``validate_config`` (:162-185), ``TrainResults`` (:190-223) and
``DataConfig`` (src/config/DataConfig.jl:7-59). Device knobs (``gdev``/
``cdev``) are replaced by JAX platform/sharding options; the autodiff-backend
knob is gone (jax.grad end-to-end); an optional ``donate`` / ``jit`` toggle
pair exposes XLA-level controls instead.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

from ..losses.metrics import check_training_loss

__all__ = ["TrainConfig", "DataConfig", "TrainResults", "validate_config"]


@dataclasses.dataclass
class TrainConfig:
    """Knobs for :func:`easyhybrid_tpu.train`.

    ``optimizer`` accepts an optax ``GradientTransformation``, a name string
    (``"adam"``, ``"adamw"``, ``"rmsprop"``, ``"sgd"``, ``"lbfgs"``, …), a
    ``(name, lr)`` tuple, or a dict mapping top-level param branches to any
    of those (per-branch optimizers via ``optax.multi_transform`` — parity
    with the reference's per-branch rules, train.jl:74-93).
    """

    nepochs: int = 200
    batchsize: Optional[int] = 64
    optimizer: Any = ("adam", 0.01)
    # optional prebuilt optimizer state to resume from (parity with the
    # reference's prebuilt-state-tree opt form, TrainingConfig.jl:16-42);
    # must match the resolved optimizer's state structure
    opt_state: Any = None
    # patience counts EVAL SNAPSHOTS without improvement, not raw epochs:
    # with eval_every=N the effective epoch patience is patience*N
    # (tested: tests/test_train.py::test_patience_counts_snapshots)
    patience: Optional[int] = None
    training_loss: Any = "mse"
    loss_types: Sequence[Any] = ("mse", "r2")
    extra_loss: Optional[Callable] = None
    agg: Union[str, Callable] = "sum"
    train_from: Any = None          # (params, state) | TrainResults | ckpt path
    random_seed: int = 161803
    model_name: str = "hybrid_model"
    return_model: str = "best"      # "best" | "final"
    keep_history: bool = False      # keep per-epoch prediction snapshots
    save_training: bool = False
    monitor_names: Sequence[str] = ()
    tracked_params: Sequence[str] = ()
    output_folder: Optional[str] = None
    plotting: bool = False
    show_progress: bool = True
    yscale: str = "log"
    # True = full sample reshuffle per epoch (reference DataLoader parity);
    # "batches" = permute batch order only (~20% faster epochs on small
    # models, fixed sample-to-batch assignment); False = chronological.
    shuffle_each_epoch: Any = True
    # record gradient diagnostics: per-snapshot global/per-branch grad norms
    # (TrainResults.grad_history) + the final full-batch grads pytree
    # (TrainResults.final_grads). Parity: return_gradients
    # (TrainingConfig.jl:9-160).
    return_gradients: bool = False
    # second-order / Optimization.jl-path knobs (train_optimization.jl)
    full_batch: bool = False
    promote_f64: bool = False
    # force the second-order (linesearch) driver for an arbitrary prebuilt
    # optax solver instance (named solvers like "lbfgs" route automatically)
    second_order: bool = False
    # eval_every: evaluate/early-stop every N epochs. On the optax path N>1
    # fuses N re-shuffled epochs into ONE compiled program (faster per epoch;
    # trailing nepochs % N epochs are skipped).
    eval_every: int = 1
    inner_maxiters: int = 10
    # TPU-native knobs
    jit: bool = True
    multi_device: bool = False      # shard batches over the mesh data axis
    mesh: Any = None                # optional jax.sharding.Mesh
    checkpoint_every: int = 1
    # checkpoint_format: "pickle" (one file per epoch, JLD2-role default) or
    # "orbax" (tensorstore-backed directories — integrity metadata and
    # sharded-array support for large multi-chip states)
    checkpoint_format: str = "pickle"
    # use_pallas: "auto" (fused whole-epoch Pallas kernel on TPU when the
    # model/loss/optimizer qualify — see ops/fused_epoch.py), True to force
    # (interpret-mode off-TPU), False to always use the XLA scan epoch.
    use_pallas: Any = "auto"
    # remat: jax.checkpoint the fused forward (recompute activations in the
    # backward pass) — trades FLOPs for HBM on very large NNs/windows
    remat: bool = False

    def replace(self, **kwargs) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)


@dataclasses.dataclass
class DataConfig:
    """Data handling knobs (parity: src/config/DataConfig.jl:7-59)."""

    shuffleobs: bool = False
    split_by_id: Union[None, str, Sequence] = None
    split_data_at: float = 0.8
    folds: Union[None, str, Sequence] = None
    val_fold: Optional[int] = None
    sequence_length: Optional[int] = None
    sequence_kwargs: Optional[dict] = None   # input/output_window, shift, lead_time
    input_batchnorm: bool = False

    def replace(self, **kwargs) -> "DataConfig":
        return dataclasses.replace(self, **kwargs)


def validate_config(cfg: TrainConfig) -> None:
    """Sanity checks (parity: validate_config, TrainingConfig.jl:162-185)."""
    if cfg.nepochs < 0:
        raise ValueError("nepochs must be >= 0")
    if cfg.batchsize is not None and cfg.batchsize <= 0:
        raise ValueError("batchsize must be positive (or None for full batch)")
    if cfg.patience is not None and cfg.patience <= 0:
        raise ValueError("patience must be positive (or None to disable)")
    if not (cfg.return_model in ("best", "final")):
        raise ValueError("return_model must be 'best' or 'final'")
    # any spec form: best_direction resolves LossSpec wrappers by name,
    # so SymbolicLoss("r2") is rejected like the bare string
    check_training_loss(cfg.training_loss)
    if not cfg.loss_types:
        raise ValueError("loss_types must not be empty")


@dataclasses.dataclass
class TrainResults:
    """Training outcome record (parity: TrainResults, TrainingConfig.jl:190-223).

    ``train_history``/``val_history`` are lists of nested metric dicts
    (one per epoch, epoch 0 = initial state); ``*_obs``/``*_pred`` are
    DataFrames of observations and final-model predictions; ``*_diffs``
    expose non-target model outputs (learned physical parameters)."""

    train_history: Any = None
    val_history: Any = None
    train_obs: Any = None
    train_pred: Any = None
    val_obs: Any = None
    val_pred: Any = None
    train_diffs: Any = None
    val_diffs: Any = None
    params: Any = None
    state: Any = None
    best_epoch: int = 0
    best_loss: float = float("nan")
    history: Any = None            # TrainingHistory (epoch snapshots)
    paths: Any = None              # TrainingPaths when save_training=true
    tracked: Any = None            # tracked physical-param trajectories
    monitored: Any = None          # monitored per-sample param quantiles
    opt_state: Any = None          # final optimizer state (resume via
                                   # TrainConfig.opt_state + train_from)
    grad_history: Any = None       # per-snapshot grad norms when
                                   # return_gradients (global + per branch)
    metrics_stream: Any = None     # path of the JSONL metric stream when
                                   # save_training or plotting
    epoch_path: Any = None         # training engine that ran the epochs:
                                   # "fused_pallas" | "fused_pallas_multisite"
                                   # | "xla_scan" | "second_order"
    loop_mode: Any = None          # "deferred" (zero-readback) | "eager"
    engine_reason: Any = None      # WHY that engine/loop was selected (the
                                   # disqualifying config flag when a faster
                                   # path was skipped) — one short string
    final_grads: Any = None        # final full-train-batch grads pytree
                                   # when return_gradients

    @property
    def ps_st(self) -> Tuple[Any, Any]:
        return self.params, self.state

    def history_frame(self):
        """Per-epoch metric table: one row per epoch, columns
        ``{split}_{metric}_{target}`` (epoch 0 = untrained model)."""
        import pandas as pd

        rows = []
        for epoch, (tr, va) in enumerate(zip(self.train_history, self.val_history)):
            row = {"epoch": epoch}
            for split, metrics in (("train", tr), ("val", va)):
                for metric, targets in metrics.items():
                    for target, value in targets.items():
                        row[f"{split}_{metric}_{target}"] = float(value)
            rows.append(row)
        return pd.DataFrame(rows)

    def __repr__(self):
        n_ep = len(self.train_history) - 1 if self.train_history else 0
        return (
            "TrainResults(\n"
            f"  epochs trained = {n_ep}\n"
            f"  best epoch     = {self.best_epoch}\n"
            f"  best val loss  = {self.best_loss}\n"
            f"  fields: train_history, val_history, train_obs, train_pred,\n"
            f"          val_obs, val_pred, train_diffs, val_diffs, params,\n"
            f"          state, history, paths\n"
            ")"
        )
