"""Second-order / linesearch-solver training driver.

Parity: the reference's Optimization.jl path (reference:
src/training/train_optimization.jl — ``_train_optimization`` :33-119,
full-batch solve + eval/early-stop callback every ``eval_every`` iterations
:66-80/:195-220, and the Le et al. 2011 repeated-minibatch scheme
``_run_minibatch!`` :148-193). The reference routes ANY non-Optimisers
solver here with leftover kwargs forwarded to ``solve`` (train.jl:148-157);
the analog: any registered solver name (``"lbfgs"``, ``"gd_linesearch"``),
or an arbitrary prebuilt optax transform via ``second_order=True``, with
leftover ``train`` kwargs forwarded to the solver constructor. Steps are
jit-compiled; linesearch solvers reuse value/grad from solver state.

TPU note: solvers run in float32 by default; ``promote_f64`` enables x64
(useful on the CPU backend for strict parity — TPUs prefer f32).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.train_config import DataConfig, TrainConfig, TrainResults
from ..data.loaders import batch_iterator
from ..data.split import merged_sequence_kwargs, split_data
from ..losses.specs import LoggingLoss
from .early_stopping import EarlyStopping
from .epoch import make_evaluator, make_loss_fn
from .history import EpochSnapshot, TrainingHistory
from .train import (
    _extract_diffs,
    _full_batch,
    _host_metrics,
    _obs_pred_frames,
    _outputs_to_host,
)

__all__ = ["train_second_order", "train_lbfgs"]

log = logging.getLogger("easyhybrid_tpu")


def train_second_order(
    model,
    data,
    cfg: TrainConfig,
    dcfg: DataConfig,
    *,
    maxiters: Optional[int] = None,
    **solve_kwargs,
) -> TrainResults:
    """Train with a linesearch-style solver. ``solve_kwargs`` (the leftover
    ``train`` kwargs) are forwarded to the solver constructor — the
    ``solve(...)`` kwarg-forwarding analog (train_optimization.jl:33-119).

    ``promote_f64`` is scoped to THIS solve (parity: the reference's
    promote_f64 is per-solve, train_optimization.jl): the global x64 flag is
    restored on exit, so subsequent ``train()`` calls stay in float32."""
    if not cfg.promote_f64:
        return _train_second_order(
            model, data, cfg, dcfg, maxiters=maxiters, **solve_kwargs
        )
    prev = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    try:
        return _train_second_order(
            model, data, cfg, dcfg, maxiters=maxiters, **solve_kwargs
        )
    finally:
        jax.config.update("jax_enable_x64", prev)


def _train_second_order(
    model,
    data,
    cfg: TrainConfig,
    dcfg: DataConfig,
    *,
    maxiters: Optional[int] = None,
    **solve_kwargs,
) -> TrainResults:
    from .optimizers import resolve_second_order

    key = jax.random.PRNGKey(cfg.random_seed)
    key, init_key = jax.random.split(key)

    sequence_kwargs = merged_sequence_kwargs(dcfg)
    train_data, val_data = split_data(
        data,
        model,
        split_by_id=dcfg.split_by_id,
        folds=dcfg.folds,
        val_fold=dcfg.val_fold,
        shuffleobs=dcfg.shuffleobs,
        split_data_at=dcfg.split_data_at,
        sequence_kwargs=sequence_kwargs,
        seed=cfg.random_seed,
    )
    if val_data.n_samples == 0:
        # same guard as the optax path — _full_batch on an empty split
        # would otherwise die with a bare ZeroDivisionError
        raise ValueError(
            "validation split is empty; lower split_data_at (< 1.0) or pass "
            "a pre-split (train, val) tuple"
        )
    train_eval_batch = _full_batch(train_data)
    val_eval_batch = _full_batch(val_data)

    from .train import _get_ps_st, _jit_init, fit_input_norm

    # warm start + static input-norm fitting mirror the optax path
    # (train.py) exactly — train_from was silently ignored here before,
    # re-optimizing from a fresh init, and input_batchnorm="static"
    # models solved with unfitted identity stats
    warm = _get_ps_st(cfg.train_from)
    if warm is not None:
        params, state = jax.tree.map(jnp.asarray, warm)
    else:
        try:
            params, state = _jit_init(model, init_key)
        except (TypeError, ValueError):
            # unhashable custom model (jax raises ValueError for
            # non-hashable static args, older versions TypeError):
            # eager fallback
            params, state = model.init(init_key)
    state = fit_input_norm(model, state, train_data)
    if cfg.promote_f64:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)

    logging_loss = LoggingLoss(
        loss_types=tuple(cfg.loss_types),
        training_loss=cfg.training_loss,
        extra_loss=cfg.extra_loss,
        agg=cfg.agg,
    )
    loss_with_state = make_loss_fn(model, logging_loss)

    # any registered name / (name, args) / prebuilt transform; leftover
    # train kwargs become solver-constructor kwargs. A plain CALLABLE that
    # is not an optax transform is an ARBITRARY USER SOLVER — the
    # reference routes any non-Optimisers algorithm object into
    # Optimization.jl's solve() (train.jl:148-157, train_optimization.jl);
    # the analog protocol here is ``solver(objective, params,
    # **solve_kwargs) -> params`` (or ``(params, info)``), where
    # ``objective(params) -> scalar loss`` is jax-differentiable, so
    # jax.value_and_grad / jax.hessian / scipy bridges all work inside it.
    custom_solver = callable(cfg.optimizer) and not isinstance(
        cfg.optimizer, optax.GradientTransformation
    )
    if custom_solver:
        solver = cfg.optimizer
        if maxiters is not None:
            solve_kwargs = {**solve_kwargs, "maxiters": maxiters}
        optimizer = None
        opt_state = None
        reuse_value_grad = False
    else:
        optimizer = optax.with_extra_args_support(
            resolve_second_order(cfg.optimizer, **solve_kwargs)
        )
        opt_state = optimizer.init(params)

        # linesearch solvers carry (value, grad) in their state, saving
        # one fwd+bwd per step; plain transforms fall back to
        # value_and_grad
        def _state_has(field):
            import optax.tree_utils as otu

            try:
                return otu.tree_get(opt_state, field) is not None
            except KeyError:
                return False

        reuse_value_grad = _state_has("value") and _state_has("grad")

    def solve_once(p, batch):
        """One whole solver call on one problem (custom-solver path)."""

        def scalar_loss(pp):
            loss, _ = loss_with_state(pp, state, batch)
            return loss

        out = solver(scalar_loss, p, **solve_kwargs)
        if isinstance(out, tuple):
            out = out[0]
        ref_leaves = jax.tree.leaves(p)
        new_leaves = jax.tree.leaves(out)
        if (
            jax.tree.structure(out) != jax.tree.structure(p)
            or len(new_leaves) != len(ref_leaves)
            or any(
                jnp.shape(a) != jnp.shape(b)
                for a, b in zip(new_leaves, ref_leaves)
            )
        ):
            raise ValueError(
                "custom solver must return params with the same tree "
                "structure/shapes it was given (or a (params, info) tuple)"
            )
        return jax.tree.map(
            lambda a, b: jnp.asarray(a, jnp.asarray(b).dtype), out, p
        )

    evaluator = make_evaluator(model, logging_loss, jit=cfg.jit)

    def snapshot_of(p, s) -> EpochSnapshot:
        return EpochSnapshot(
            _host_metrics(evaluator(p, s, train_eval_batch)),
            _host_metrics(evaluator(p, s, val_eval_batch)),
        )

    from .train import _grad_norms, _make_grad_probe

    grad_probe = (
        _make_grad_probe(model, logging_loss, jit=cfg.jit)
        if cfg.return_gradients
        else None
    )
    grad_history: list = []

    init_snapshot = snapshot_of(params, state)
    history = TrainingHistory([init_snapshot])
    stopper = EarlyStopping(init_snapshot, params, state, cfg)
    if grad_probe is not None:
        grad_history.append(_grad_norms(grad_probe(params, state, train_eval_batch)))

    def step_fn(p, o, batch):
        def scalar_loss(pp):
            loss, _ = loss_with_state(pp, state, batch)
            return loss

        if reuse_value_grad:
            value, grad = optax.value_and_grad_from_state(scalar_loss)(p, state=o)
        else:
            value, grad = jax.value_and_grad(scalar_loss)(p)
        updates, o = optimizer.update(
            grad, o, p, value=value, grad=grad, value_fn=scalar_loss
        )
        p = optax.apply_updates(p, updates)
        return p, o, value

    # batch is a traced argument: ONE compilation per batch shape, not one
    # jit cache per minibatch closure
    step_fn = jax.jit(step_fn) if cfg.jit else step_fn

    def make_step(batch):
        return lambda p, o: step_fn(p, o, batch)

    t0 = time.perf_counter()

    if cfg.full_batch and custom_solver:
        # the reference's solve() shape: ONE whole-problem solver call on
        # the full training split, snapshot after (iteration budgets /
        # callbacks are the solver's own business)
        params = solve_once(params, train_eval_batch)
        snapshot = snapshot_of(params, state)
        stopper.update(history, snapshot, params, state, 1, cfg.keep_history)
        if grad_probe is not None:
            grad_history.append(
                _grad_norms(grad_probe(params, state, train_eval_batch))
            )
        if cfg.show_progress:
            log.info(
                "custom solver done  best val=%.6g  (%.1fs)",
                stopper.best_loss, time.perf_counter() - t0,
            )
    elif cfg.full_batch:
        # one problem over the full training split; evaluate every
        # eval_every iterations (parity: train_optimization.jl:66-80)
        step = make_step(train_eval_batch)
        iters = int(maxiters or cfg.nepochs)
        eval_every = max(1, int(cfg.eval_every))  # clamp like the optax path
        epoch = 0
        for it in range(1, iters + 1):
            params, opt_state, value = step(params, opt_state)
            if it % eval_every == 0 or it == iters:
                epoch += 1
                snapshot = snapshot_of(params, state)
                stopper.update(
                    history, snapshot, params, state, epoch, cfg.keep_history
                )
                if grad_probe is not None:
                    grad_history.append(_grad_norms(grad_probe(params, state, train_eval_batch)))
                if cfg.show_progress:
                    log.info(
                        "lbfgs iter %4d/%d  loss=%.6g  best val=%.6g  (%.1fs)",
                        it,
                        iters,
                        float(value),
                        stopper.best_loss,
                        time.perf_counter() - t0,
                    )
                if stopper.done:
                    break
    else:
        # repeated-minibatch scheme: inner_maxiters L-BFGS iterations per
        # fixed minibatch (parity: _run_minibatch!, :148-193)
        batchsize = cfg.batchsize or train_data.n_samples
        for epoch in range(1, cfg.nepochs + 1):
            for (x, forcing), y in batch_iterator(
                train_data,
                batchsize,
                shuffle=cfg.shuffle_each_epoch,
                seed=cfg.random_seed + epoch,
            ):
                mask = {k: np.isfinite(v).astype(np.float32) for k, v in y.items()}
                y_safe = {k: np.nan_to_num(v) for k, v in y.items()}
                batch = (
                    (jax.tree.map(jnp.asarray, x), jax.tree.map(jnp.asarray, forcing)),
                    (
                        {k: jnp.asarray(v) for k, v in y_safe.items()},
                        {k: jnp.asarray(v) for k, v in mask.items()},
                    ),
                )
                if custom_solver:
                    # Le-et-al minibatch scheme with a user solver: one
                    # whole solve per fixed minibatch
                    params = solve_once(params, batch)
                else:
                    step = make_step(batch)
                    fresh_opt_state = optimizer.init(params)
                    for _ in range(cfg.inner_maxiters):
                        params, fresh_opt_state, value = step(
                            params, fresh_opt_state
                        )
            snapshot = snapshot_of(params, state)
            stopper.update(history, snapshot, params, state, epoch, cfg.keep_history)
            if grad_probe is not None:
                grad_history.append(_grad_norms(grad_probe(params, state, train_eval_batch)))
            if cfg.show_progress:
                log.info(
                    "lbfgs epoch %4d/%d  best val=%.6g  (%.1fs)",
                    epoch,
                    cfg.nepochs,
                    stopper.best_loss,
                    time.perf_counter() - t0,
                )
            if stopper.done:
                break

    best_params, best_state = stopper.best_or_final(params, state, cfg.return_model)
    best_params = jax.tree.map(jnp.asarray, best_params)
    best_state = jax.tree.map(jnp.asarray, best_state)

    final_eval = make_evaluator(model, logging_loss, jit=cfg.jit, with_outputs=True)
    _, out_tr = final_eval(best_params, best_state, train_eval_batch)
    _, out_va = final_eval(best_params, best_state, val_eval_batch)
    out_tr = _outputs_to_host(out_tr, train_data.n_samples)
    out_va = _outputs_to_host(out_va, val_data.n_samples)
    targets = tuple(model.targets)
    train_obs, train_pred = _obs_pred_frames(train_data, out_tr, targets)
    val_obs, val_pred = _obs_pred_frames(val_data, out_va, targets)

    return TrainResults(
        train_history=history.train_losses(),
        val_history=history.val_losses(),
        train_obs=train_obs,
        train_pred=train_pred,
        val_obs=val_obs,
        val_pred=val_pred,
        train_diffs=_extract_diffs(out_tr, targets, train_data.n_samples),
        val_diffs=_extract_diffs(out_va, targets, val_data.n_samples),
        params=jax.device_get(best_params),
        state=jax.device_get(best_state),
        best_epoch=stopper.best_epoch,
        best_loss=stopper.best_loss,
        history=history,
        grad_history=grad_history or None,
        final_grads=(
            jax.device_get(grad_probe(best_params, best_state, train_eval_batch))
            if grad_probe is not None
            else None
        ),
        epoch_path="second_order",
        loop_mode="eager",
        engine_reason=(
            "second_order: custom solver callable — whole-problem "
            "solve() calls (reference train.jl:148-157 routing)"
            if custom_solver
            else "second_order: second-order optimizer requested "
            "(linesearch solvers run the eager full/minibatch driver)"
        ),
    )


#: backward-compatible alias (the driver was L-BFGS-only in round 1)
train_lbfgs = train_second_order
