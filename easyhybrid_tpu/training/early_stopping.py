"""Early stopping + best-model tracking.

Parity: reference ``EarlyStopping`` (src/training/early_stopping.jl:1-70) —
direction-aware comparison on the aggregated scalar of the FIRST entry of
``loss_types``, patience counter, best params/state snapshot kept on host.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from ..losses.metrics import is_better
from ..losses.specs import agg_name as _spec_agg_name
from ..losses.specs import loss_name
from ..utils.host import to_host as _to_host
from .history import EpochSnapshot, TrainingHistory, _agg_loss

__all__ = ["EarlyStopping"]

log = logging.getLogger("easyhybrid_tpu")




class EarlyStopping:
    def __init__(self, init_snapshot: EpochSnapshot, params, state, cfg):
        # the SAME derivation compute_loss uses for the dict key — a
        # divergent fallback ("sum" vs "agg", no lstrip) was a KeyError
        # for underscore-named callable aggs
        self.agg_name = _spec_agg_name(cfg.agg)
        self.metric = loss_name(
            cfg.loss_types[0] if cfg.loss_types else cfg.training_loss
        )
        self.best_loss = _agg_loss(init_snapshot.l_val, self.agg_name, self.metric)
        self.best_params = _to_host(params)
        self.best_state = _to_host(state)
        self.best_epoch = 0
        self.counter = 0
        self.patience = cfg.patience
        self.done = False

    def update(
        self,
        history: TrainingHistory,
        snapshot: EpochSnapshot,
        params,
        state,
        epoch: int,
        keep_history: bool,
    ) -> None:
        """Track the best model and patience. Scalar metric snapshots are
        always appended (cheap — a deliberate, documented improvement over
        the reference, which drops the loss trajectory unless
        ``keep_history``; see docs/api.md "keep_history semantics");
        prediction arrays ride along only when ``keep_history`` (parity:
        early_stopping.jl:16-42). When ``keep_history`` is False the
        snapshot is stripped to its scalar metric dicts before appending so
        long runs with plotting/monitoring enabled don't accumulate
        O(nepochs × dataset) prediction arrays on host."""
        current = _agg_loss(snapshot.l_val, self.agg_name, self.metric)
        if keep_history:
            history.append(snapshot)
        else:
            history.append(EpochSnapshot(snapshot.l_train, snapshot.l_val))
        if is_better(current, self.best_loss, self.metric):
            self.best_loss = current
            self.best_params = _to_host(params)
            self.best_state = _to_host(state)
            self.best_epoch = epoch
            self.counter = 0
        else:
            self.counter += 1
        if self.patience is not None and self.counter >= self.patience:
            log.warning(
                "Early stopping at epoch %d, best validation loss wrt %s: "
                "%.6g at epoch %d",
                epoch,
                self.metric,
                self.best_loss,
                self.best_epoch,
            )
            self.done = True

    def best_or_final(self, params, state, return_model: str):
        """Parity: ``best_or_final`` (early_stopping.jl:51-70)."""
        if return_model == "best":
            log.info(
                "Returning best model from epoch %d with validation loss %.6g",
                self.best_epoch,
                self.best_loss,
            )
            return self.best_params, self.best_state
        log.info(
            "Returning final model; best validation loss was %.6g at epoch %d",
            self.best_loss,
            self.best_epoch,
        )
        return _to_host(params), _to_host(state)
