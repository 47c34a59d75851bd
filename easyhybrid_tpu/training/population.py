"""Population training: K sweep/ensemble members in ONE compiled program.

TPU-native counterpart of the reference's sequential hyperparameter loops
(tune.jl:27-44 and the user-side Hyperopt tutorials): instead of K
separate ``train()`` calls, the whole population trains as one
``jax.vmap``-batched program — per-member parameters, optimizer state, and
injected optimizer hyperparameters (``optax.inject_hyperparams``), with
the epoch tensors SHARED across members (one device copy). On a TPU this
turns a hyperparameter sweep or a seed ensemble into extra MXU batch
dimension rather than extra wall-clock: for the small hybrid models this
framework targets, a 16-member population costs roughly one member's
dispatch.

Design notes (why vmap, not a Python loop):

* every member executes the same static program → ONE compile, K× data
  parallelism the compiler can tile;
* member hyperparameters ride the optimizer STATE (inject_hyperparams),
  so the same compiled update works for every member;
* early stopping is replaced by on-device best-epoch tracking per member
  (the population runs a fixed epoch budget — members cannot exit a
  vmapped program early, but the best params/epoch per member are
  captured exactly);
* model-STRUCTURE hyperparams (hidden_layers, activation) change shapes
  and cannot be vmapped — sweep those with ``tune``/``random_search``,
  which this composes with.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import build_epoch_tensors
from ..data.split import split_data
from ..losses.metrics import MAXIMIZE_METRICS, best_direction
from ..losses.specs import LoggingLoss, loss_name
from .epoch import can_skip_empty_guard, make_dual_evaluator, make_train_epoch
from .optimizers import OPTIMIZERS

__all__ = ["population_train", "PopulationResults"]

log = logging.getLogger("easyhybrid_tpu")


@dataclasses.dataclass
class PopulationResults:
    """Stacked results of a vmapped population run. Leading axis of every
    array/tree leaf is the member axis (K)."""

    hyper: Dict[str, np.ndarray]          #: per-member injected hyperparams
    seeds: np.ndarray                     #: per-member init seeds
    params: Any                           #: FINAL params, stacked (K, ...)
    best_params: Any                      #: best-val params, stacked
    state: Any                            #: final model state, stacked
    best_losses: np.ndarray               #: best monitored val value (K,)
    best_epochs: np.ndarray               #: epoch index of the best (K,)
    train_history: Dict[str, np.ndarray]  #: metric -> (n_evals, K)
    val_history: Dict[str, np.ndarray]    #: metric -> (n_evals, K)
    epochs: np.ndarray                    #: epoch index per history row
    best_member: int                      #: argbest of best_losses
    monitor: str                          #: metric best_losses tracks
    epoch_path: str = "population_vmap"

    def member_params(self, i: int, *, best: bool = True):
        """Unstack member ``i``'s (best) parameter tree — shaped exactly
        like a single-model ``train()`` result, so ``model.apply`` and the
        checkpoint writers accept it directly."""
        tree = self.best_params if best else self.params
        return jax.tree.map(lambda a: a[i], tree)


def _member_count(hyper: Mapping[str, Sequence], seeds) -> int:
    sizes = {len(np.atleast_1d(np.asarray(v))) for v in hyper.values()}
    if seeds is not None:
        sizes.add(len(np.atleast_1d(np.asarray(seeds))))
    sizes.discard(1)
    if len(sizes) > 1:
        raise ValueError(
            f"population member counts disagree: {sorted(sizes)} "
            "(every hyper array and `seeds` must have the same length, "
            "or length 1 to broadcast)"
        )
    return sizes.pop() if sizes else 1


def population_train(
    model,
    data,
    *,
    hyper: Optional[Mapping[str, Sequence[float]]] = None,
    seeds: Optional[Sequence[int]] = None,
    optimizer: str = "adam",
    static_hyper: Optional[Mapping[str, Any]] = None,
    nepochs: int = 100,
    batchsize: int = 32,
    eval_every: int = 1,
    training_loss: Any = "mse",
    loss_types: Optional[Sequence[Any]] = None,
    agg: Any = "sum",
    shuffle_each_epoch: bool = True,
    seed: int = 42,
    split_data_at: float = 0.8,
    split_by_id=None,
    folds=None,
    val_fold: Optional[int] = None,
    shuffleobs: bool = False,
    sequence_kwargs: Optional[dict] = None,
    data_seed: Optional[int] = None,
    mesh=None,
) -> PopulationResults:
    """Train a population of K members of ``model`` in ONE program.

    ``hyper`` maps optax constructor kwargs to per-member value arrays
    (e.g. ``{"learning_rate": [1e-3, 3e-3, 1e-2]}``); every named kwarg is
    injected via ``optax.inject_hyperparams`` so members share one compiled
    update. ``seeds`` gives per-member init seeds (a seed ensemble);
    omitted, every member starts from the same ``seed`` init. ``optimizer``
    is a name from ``OPTIMIZERS`` (a fresh-state first-order rule —
    elementwise or not, each member's state is whole). ``static_hyper``
    passes non-swept constructor kwargs; with neither ``hyper`` nor
    ``static_hyper`` the library-default lr (0.01, as in ``train()``)
    applies. Epoch budget matches ``train()``'s eval grid: exactly
    ``(nepochs // eval_every) * eval_every`` epochs run — never more.

    ``mesh`` (a 1-D ``jax.sharding.Mesh``) shards the MEMBER axis across
    devices — members are embarrassingly parallel (shared read-only data,
    zero inter-member collectives), so a K-member population on D chips is
    K/D members per chip: population size scales linearly with the slice.
    K must be divisible by the mesh size.

    Returns :class:`PopulationResults` with per-member best-epoch tracking
    done ON DEVICE — one dispatch, one final fetch.

    Reference counterpart: the Hyperopt/folds tutorials drive ``train()``
    once per configuration (docs tutorials; tune.jl:27-44); there is no
    batched-population analog — this is TPU-native surplus.
    """
    hyper = dict(hyper or {})
    static_hyper = dict(static_hyper or {})
    if optimizer not in OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; known: {sorted(OPTIMIZERS)}"
        )
    if loss_name(training_loss) in MAXIMIZE_METRICS:
        raise ValueError(
            f"training_loss {training_loss!r} is a maximize-direction "
            "metric; pick a minimize-direction loss"
        )
    K = _member_count(hyper, seeds)
    hyper_arr = {
        k: np.broadcast_to(
            np.asarray(v, np.float32).reshape(-1), (K,)
        ).copy()
        for k, v in hyper.items()
    }
    seeds_arr = (
        np.broadcast_to(np.asarray(seeds, np.int64).reshape(-1), (K,)).copy()
        if seeds is not None
        else np.full((K,), int(seed), np.int64)
    )

    lt = tuple(loss_types) if loss_types else (training_loss,)
    logging_loss = LoggingLoss(
        training_loss=training_loss, loss_types=lt, agg=agg
    )
    monitor = loss_name(lt[0])
    sign = -1.0 if best_direction(monitor) == "max" else 1.0
    # the key compute_loss files the aggregated scalar under — reuse the
    # LoggingLoss's own derivation (callable agg names, lstrip, fallbacks)
    agg_key = logging_loss.agg_name

    def _scalars(metrics: Mapping[str, Mapping[str, Any]]):
        """metrics[loss_name][target|agg] → {loss_name: aggregated scalar}
        (the same scalar train()'s history/early stopping track)."""
        return {k: v[agg_key] for k, v in metrics.items()}

    # ---- data: ONE device copy shared by every member ---------------------
    train_data, val_data = split_data(
        data, model, split_data_at=split_data_at,
        split_by_id=split_by_id, folds=folds, val_fold=val_fold,
        shuffleobs=shuffleobs,
        sequence_kwargs=sequence_kwargs, seed=data_seed,
    )
    from .train import _full_batch, fit_input_norm

    host_tensors = build_epoch_tensors(train_data, batchsize)
    skip_guard = can_skip_empty_guard(host_tensors)
    tensors, tr_batch, va_batch = jax.device_put(
        (host_tensors, _full_batch(train_data), _full_batch(val_data))
    )

    # ---- per-member params / shared fitted state --------------------------
    init_keys = jnp.stack(
        [jax.random.PRNGKey(int(s)) for s in seeds_arr]
    )
    pop_params = jax.jit(jax.vmap(lambda k: model.init(k)[0]))(init_keys)
    _, state0 = model.init(jax.random.PRNGKey(int(seeds_arr[0])))
    state0 = fit_input_norm(model, state0, train_data)
    pop_state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), state0
    )

    # ---- one optimizer, per-member hyperparams in the STATE ---------------
    import optax

    if hyper_arr:
        opt = optax.inject_hyperparams(OPTIMIZERS[optimizer])(
            **{k: float(v[0]) for k, v in hyper_arr.items()}, **static_hyper
        )
    else:
        # seed-only ensembles: the library default lr (resolve_optimizer's
        # _DEFAULT_LR), same as train(model, df, optimizer="adam")
        from .optimizers import _DEFAULT_LR

        opt = (
            OPTIMIZERS[optimizer](**static_hyper)
            if static_hyper
            else OPTIMIZERS[optimizer](_DEFAULT_LR)
        )
    pop_opt_state = jax.jit(jax.vmap(opt.init))(pop_params)
    if hyper_arr:
        pop_opt_state = pop_opt_state._replace(
            hyperparams={
                **pop_opt_state.hyperparams,
                **{k: jnp.asarray(v) for k, v in hyper_arr.items()},
            }
        )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        n_dev = int(np.prod(list(mesh.shape.values())))
        if K % n_dev:
            raise ValueError(
                f"population size {K} not divisible by mesh size {n_dev}"
            )
        member_sh = NamedSharding(mesh, _P(mesh.axis_names[0]))
        repl_sh = NamedSharding(mesh, _P())

        def _member_put(tree):
            return jax.tree.map(
                lambda a: jax.device_put(a, member_sh), tree
            )

        pop_params = _member_put(pop_params)
        pop_state = _member_put(pop_state)
        pop_opt_state = _member_put(pop_opt_state)
        tensors, tr_batch, va_batch = jax.device_put(
            (tensors, tr_batch, va_batch), repl_sh
        )

    epoch_fn = make_train_epoch(
        model, logging_loss, opt, shuffle=shuffle_each_epoch, jit=False,
        epochs_per_call=eval_every, skip_empty_guard=skip_guard,
    )
    vepoch = jax.vmap(epoch_fn, in_axes=(0, 0, 0, None, 0))
    eval_fn = make_dual_evaluator(model, logging_loss, jit=False)
    veval = jax.vmap(eval_fn, in_axes=(0, 0, None, None))

    # floor, matching train()'s eval grid range(eval_every, nepochs+1, ...):
    # a 10-epoch budget at eval_every=3 trains 9 epochs, never 12
    n_evals = int(nepochs) // int(eval_every)
    if n_evals < 1:
        raise ValueError(
            f"nepochs={nepochs} < eval_every={eval_every}: no eval block "
            "fits the budget (train() would run zero evaluated epochs too)"
        )

    def run(pop_params, pop_opt_state, pop_state, key):
        (m_tr0, _), (m_va0, _) = veval(
            pop_params, pop_state, tr_batch, va_batch
        )
        best_score = sign * _scalars(m_va0)[monitor]
        carry0 = (
            pop_params, pop_opt_state, pop_state,
            best_score, pop_params, jnp.zeros((K,), jnp.int32),
        )
        step_keys = jax.random.split(key, n_evals * K).reshape(n_evals, K, -1)

        def step(carry, inp):
            i, ks = inp
            p, o, s, best_sc, best_p, best_ep = carry
            p, o, s, _ = vepoch(p, o, s, tensors, ks)
            (m_tr, _), (m_va, _) = veval(p, s, tr_batch, va_batch)
            m_tr, m_va = _scalars(m_tr), _scalars(m_va)
            score = sign * m_va[monitor]
            better = score < best_sc
            best_sc = jnp.where(better, score, best_sc)
            best_ep = jnp.where(better, (i + 1) * eval_every, best_ep)
            best_p = jax.tree.map(
                lambda bp, np_: jnp.where(
                    better.reshape((K,) + (1,) * (np_.ndim - 1)), np_, bp
                ),
                best_p, p,
            )
            return (p, o, s, best_sc, best_p, best_ep), (m_tr, m_va)

        carry, (h_tr, h_va) = jax.lax.scan(
            step, carry0, (jnp.arange(n_evals, dtype=jnp.int32), step_keys)
        )
        p, o, s, best_sc, best_p, best_ep = carry
        return p, s, best_sc, best_p, best_ep, h_tr, h_va

    p, s, best_sc, best_p, best_ep, h_tr, h_va = jax.jit(run)(
        pop_params, pop_opt_state, pop_state, jax.random.PRNGKey(int(seed))
    )

    best_losses = np.asarray(jax.device_get(sign * best_sc))
    h_tr = {k: np.asarray(v) for k, v in jax.device_get(h_tr).items()}
    h_va = {k: np.asarray(v) for k, v in jax.device_get(h_va).items()}
    best_i = int(
        np.argmax(best_losses) if sign < 0 else np.argmin(best_losses)
    )
    log.info(
        "population: %d members, %d epochs (eval every %d); best member %d "
        "(%s) with val %s=%.6g at epoch %d",
        K, n_evals * eval_every, eval_every, best_i,
        {k: float(v[best_i]) for k, v in hyper_arr.items()},
        monitor, best_losses[best_i],
        int(np.asarray(best_ep)[best_i]),
    )
    return PopulationResults(
        hyper=hyper_arr,
        seeds=seeds_arr,
        params=jax.device_get(p),
        best_params=jax.device_get(best_p),
        state=jax.device_get(s),
        best_losses=best_losses,
        best_epochs=np.asarray(jax.device_get(best_ep)),
        train_history=h_tr,
        val_history=h_va,
        epochs=np.arange(1, n_evals + 1) * int(eval_every),
        best_member=best_i,
        monitor=monitor,
    )
