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

__all__ = ["population_train", "population_cross_validate", "PopulationResults"]

log = logging.getLogger("easyhybrid_tpu")

# per-process vmapped-self-check verdicts, keyed like the exactness-gate
# disk cache (see _select_fused_engine)
_SELFCHECK_VERDICTS: Dict[Any, bool] = {}


def _fused_backend_blocked() -> Optional[str]:
    """Shared env/backend gate for the fused population engines (the same
    contract as train(): ``EASYHYBRID_PALLAS=1`` skips the backend gate but
    NOT the exactness gates; ``=0`` disables). Returns the fallback reason,
    or None when the gate passes."""
    import os

    env = os.environ.get("EASYHYBRID_PALLAS")
    if env == "0":
        return "EASYHYBRID_PALLAS=0"
    if jax.default_backend() != "tpu" and env != "1":
        return (
            f"backend is {jax.default_backend()!r}, not tpu "
            "(EASYHYBRID_PALLAS=1 overrides)"
        )
    return None


def _memoized_selfcheck(model, gate_params, spec, logging_loss, gate_tensors,
                        *, eval_every, shuffle, extra, run) -> bool:
    """Per-process memoization of a vmapped-kernel self-check verdict,
    keyed like the exactness-gate disk cache plus ``extra`` (the vmap
    layout / sweep extremes) — repeat population calls (tune loops) skip
    the extra launches."""
    from ..ops.fused_epoch import _gate_cache_key

    try:
        sc_key = (
            _gate_cache_key(
                model, gate_params, spec, logging_loss, gate_tensors,
                epochs_per_call=eval_every, shuffle=shuffle,
            ),
            extra,
        )
    except Exception:
        sc_key = None
    verdict = _SELFCHECK_VERDICTS.get(sc_key) if sc_key is not None else None
    if verdict is None:
        verdict = run()
        if sc_key is not None:
            _SELFCHECK_VERDICTS[sc_key] = verdict
    return verdict


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
    engine_reason: Optional[str] = None   #: why that engine was selected

    def member_params(self, i: int, *, best: bool = True):
        """Unstack member ``i``'s (best) parameter tree — shaped exactly
        like a single-model ``train()`` result, so ``model.apply`` and the
        checkpoint writers accept it directly."""
        tree = self.best_params if best else self.params
        return jax.tree.map(lambda a: a[i], tree)

    def param_spread(self, model=None, *, best: bool = True):
        """Across-member mean ± std of every GLOBAL parameter — physical-
        parameter uncertainty from a seed/hyper ensemble. With ``model``
        given, values are reported in PHYSICAL units (the bounded
        ``scale_param`` transform applied per parameter); otherwise raw.
        Returns ``{name: (mean, std)}``."""
        tree = self.best_params if best else self.params
        out = {}
        for name, raw in tree.get("globals", {}).items():
            vals = np.asarray(raw, np.float32).reshape(len(self.seeds), -1)
            if model is not None:
                from ..params import scale_param

                lo = model.parameters.lower_of(name)
                up = model.parameters.upper_of(name)
                vals = np.asarray(scale_param(vals, lo, up))
            out[name] = (vals.mean(axis=0).squeeze(), vals.std(axis=0).squeeze())
        return out


def _monitor_setup(training_loss, loss_types, agg):
    """Shared loss/monitor plumbing: the LoggingLoss, the monitored metric
    name, its direction sign, and the metrics→aggregated-scalar extractor
    (keyed by the LoggingLoss's OWN agg_name derivation — callable aggs,
    lstrip, fallbacks — the same scalar train()'s history tracks)."""
    if loss_name(training_loss) in MAXIMIZE_METRICS:
        raise ValueError(
            f"training_loss {training_loss!r} is a maximize-direction "
            "metric; pick a minimize-direction loss"
        )
    lt = tuple(loss_types) if loss_types else (training_loss,)
    logging_loss = LoggingLoss(
        training_loss=training_loss, loss_types=lt, agg=agg
    )
    monitor = loss_name(lt[0])
    sign = -1.0 if best_direction(monitor) == "max" else 1.0
    agg_key = logging_loss.agg_name

    def scalars(metrics: Mapping[str, Mapping[str, Any]]):
        return {k: v[agg_key] for k, v in metrics.items()}

    return logging_loss, monitor, sign, scalars


def _shard_members(mesh, K: int, trees, what: str):
    """device_put every tree's leaves with the leading MEMBER axis sharded
    over the mesh's FIRST axis (other mesh axes replicate — on a 2-D
    members×data mesh that replication across the data axis is what makes
    XLA psum per-member gradients over it); K must divide evenly by the
    member-axis size."""
    from jax.sharding import NamedSharding, PartitionSpec as _P

    n_member = int(mesh.shape[mesh.axis_names[0]])
    if K % n_member:
        raise ValueError(
            f"{what} {K} not divisible by member-axis size {n_member}"
        )
    member_sh = NamedSharding(mesh, _P(mesh.axis_names[0]))
    return tuple(
        jax.tree.map(lambda a: jax.device_put(a, member_sh), t)
        for t in trees
    )


def _shard_map_members(vmapped_epoch, mesh, tensors, *, data_on_members):
    """Wrap the vmapped FUSED epoch in ``shard_map`` over the mesh's first
    (member/fold) axis: each device runs the Pallas kernel for its local
    member block with ZERO collectives — members are embarrassingly
    parallel, shared data replicates (``data_on_members=False``) and
    per-fold data shards along with the fold axis (``True``). The XLA
    engine needs no wrapper (the SPMD partitioner shards a plain vmapped
    program on its own), but a ``pallas_call`` is opaque to the
    partitioner, so the member assignment must be explicit."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    m = mesh.axis_names[0]
    pm, pr = P(m), P()
    t_spec = jax.tree.map(lambda _: pm if data_on_members else pr, tensors)
    # n_samples is a leaf scalar shared by every member — never sharded
    t_spec = t_spec._replace(n_samples=pr)
    return shard_map(
        vmapped_epoch, mesh=mesh,
        in_specs=(pm, pm, pm, t_spec, pm),
        out_specs=(pm, pm, pm, pm),
        check_vma=False,
    )


def _select_fused_engine(model, spec, logging_loss, host_tensors,
                         gate_params, gate_state, gate_tensors, *,
                         eval_every, shuffle, t_axes=None, what=""):
    """Shared fused-engine gate for BOTH population entry points. Mirrors
    train()'s env contract (``EASYHYBRID_PALLAS=1`` skips the backend gate
    but NOT the exactness gate — enabling interpret-mode runs off-TPU;
    ``=0`` disables), runs the standard runtime exactness check, then
    additionally SELF-CHECKS the VMAPPED kernel: the production program
    carries an extra batching grid dim the element gate never compiles,
    and this toolchain's failure mode is silent (fused_epoch docstring).
    Returns ``(epoch_fn, opt_state_init, reason)``; the first two are None
    on fallback and ``reason`` says why (recorded in
    ``PopulationResults.engine_reason``)."""
    blocked = _fused_backend_blocked()
    if blocked is not None:
        return None, None, blocked
    from ..ops.fused_epoch import (
        fused_exactness_check,
        init_fused_opt_state,
        make_fused_epoch,
        supports_fused_epoch,
    )
    from ..ops.fused_multisite import (
        make_fused_multisite_epoch,
        supports_fused_multisite,
    )

    # multisite populations (round 4): seed ensembles of a
    # MultiSiteHybridModel vmap the dedicated multisite kernel. CV stays
    # XLA — folds re-index the surviving sites, breaking the kernel's
    # identity chunk→packed-row mapping.
    is_ms = t_axes is None and supports_fused_multisite(
        model, spec, logging_loss, host_tensors, shuffle=shuffle
    )
    if not (
        supports_fused_epoch(model, spec, logging_loss, host_tensors)
        or is_ms
    ):
        return None, None, (
            "model/optimizer/loss outside the fused-kernel envelope"
        )
    ok = fused_exactness_check(
        model, gate_params, gate_state, spec, logging_loss, gate_tensors,
        epochs_per_call=eval_every, shuffle=shuffle,
    )[0]
    if not ok:
        return None, None, "runtime exactness gate failed"
    make_engine = make_fused_multisite_epoch if is_ms else make_fused_epoch
    epoch_fn = make_engine(
        model, gate_state, spec, logging_loss,
        shuffle=shuffle, epochs_per_call=eval_every,
    )
    verdict = _memoized_selfcheck(
        model, gate_params, spec, logging_loss, gate_tensors,
        eval_every=eval_every, shuffle=shuffle, extra=t_axes is not None,
        run=lambda: _vmapped_kernel_selfcheck(
            epoch_fn, spec, gate_params, gate_state, gate_tensors, t_axes
        ),
    )
    if not verdict:
        log.warning(
            "population%s: vmapped fused kernel failed the self-check; "
            "falling back to the XLA engine", what,
        )
        return None, None, "vmapped-kernel self-check failed"
    log.info("population%s: fused Pallas epoch engine (gates passed)", what)
    return epoch_fn, (lambda p: init_fused_opt_state(p, spec)), (
        ("multisite kernel: " if is_ms else "")
        + "exactness gate + vmapped self-check passed"
    )


def _vmapped_kernel_selfcheck(epoch_fn, spec, params, state, tensors,
                              t_axes) -> bool:
    """Run the PRODUCTION vmapped program once with two IDENTICAL members
    on a 2-batch data slice: the members must match each other EXACTLY
    (same data, same program — any divergence is a batching-grid
    miscompile) and the unvmapped kernel closely. The verdict is memoized
    per process per configuration by the caller (``_select_fused_engine``
    keys it like the exactness-gate cache); not disk-cached — the
    exactness gate's cache already bounds the expensive part."""
    from ..data.loaders import EpochTensors
    from ..ops.fused_epoch import init_fused_opt_state

    try:
        nb = min(2, int(tensors.weight.shape[0]))
        sub = EpochTensors(
            x=jax.tree.map(lambda a: a[:nb], tensors.x),
            forcing={k: v[:nb] for k, v in tensors.forcing.items()},
            y={k: v[:nb] for k, v in tensors.y.items()},
            mask={k: v[:nb] for k, v in tensors.mask.items()},
            weight=tensors.weight[:nb],
            n_samples=tensors.n_samples,
        )

        def dup(t):
            return jax.tree.map(
                lambda a: jnp.stack([jnp.asarray(a), jnp.asarray(a)]), t
            )

        if t_axes is None:
            in_axes = (0, 0, 0, None, 0)
            data = sub
        else:
            in_axes = (0, 0, 0, t_axes, 0)
            data = EpochTensors(
                x=dup(sub.x), forcing=dup(sub.forcing), y=dup(sub.y),
                mask=dup(sub.mask), weight=dup(sub.weight),
                n_samples=sub.n_samples,
            )
        vf = jax.vmap(epoch_fn, in_axes=in_axes)
        key = jax.random.PRNGKey(0)
        ks = jnp.stack([key, key])
        p2, _, _, l2 = vf(
            dup(params), dup(init_fused_opt_state(params, spec)),
            dup(state), data, ks,
        )
        copy = lambda t: jax.tree.map(lambda a: jnp.array(a), t)  # noqa: E731
        p1, _, _, l1 = epoch_fn(
            copy(params), init_fused_opt_state(params, spec), copy(state),
            sub, key,
        )
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
            a = np.asarray(a)
            if not np.array_equal(a[0], a[1]):
                return False  # identical members diverged: miscompile
            if not np.allclose(a[0], np.asarray(b), atol=1e-5):
                return False
        l2 = np.asarray(l2)
        return bool(
            np.array_equal(l2[0], l2[1])
            and np.allclose(l2[0], float(l1), rtol=1e-4)
        )
    except Exception as e:  # build/launch failure → XLA fallback
        log.info(
            "vmapped fused self-check raised %s: %s", type(e).__name__, e
        )
        return False


def _select_fused_sweep_engine(
    model, optimizer: str, hyper_arr, static_hyper, logging_loss,
    host_tensors, gate_params, gate_state, gate_tensors, *,
    eval_every, shuffle,
):
    """Fused-engine gate for hyperparameter SWEEPS: the kernel streams the
    per-member optimizer scalars as a traced operand
    (``make_fused_epoch(traced_hyper=...)``), so a lr sweep runs the fused
    Pallas engine instead of the XLA inject_hyperparams path.

    Gating (the family's failure mode is silent — fused_epoch docstring):

    1. every member's spec must parse into the kernel envelope (catches
       e.g. a radam threshold member the kernel refuses);
    2. the standard runtime exactness gate runs for the TWO EXTREME member
       configurations (first/last in sweep order) against the XLA path —
       disk-cached like train()'s gate;
    3. a sweep self-check runs the PRODUCTION vmapped traced-hyper program
       with [first, last, first-duplicate] members: the duplicate must be
       bit-identical to member 0 (batching-grid integrity) and both
       distinct members must match their gated STATIC kernels closely.

    Returns ``(traced_fn, hyper_names, opt_state_init, reason)`` or
    ``(None, None, None, reason)``."""
    blocked = _fused_backend_blocked()
    if blocked is not None:
        return None, None, None, blocked
    from ..ops.fused_epoch import (
        fused_exactness_check,
        init_fused_opt_state,
        make_fused_epoch,
        parse_opt_spec,
        supports_fused_epoch,
    )

    K = len(next(iter(hyper_arr.values())))
    hyper_names = tuple(sorted(hyper_arr))

    def member_spec(i: int):
        return (
            optimizer,
            {**static_hyper,
             **{k: float(hyper_arr[k][i]) for k in hyper_names}},
        )

    specs = [member_spec(i) for i in range(K)]
    if any(parse_opt_spec(s) is None for s in specs):
        return None, None, None, (
            "a sweep member's hyperparameters fall outside the fused "
            "kernel envelope"
        )
    if not supports_fused_epoch(model, specs[0], logging_loss, host_tensors):
        return None, None, None, (
            "model/optimizer/loss outside the fused-kernel envelope"
        )
    # the two EXTREME member configs gate against the XLA path (disk-cached)
    for s in {0, K - 1}:
        ok = fused_exactness_check(
            model, gate_params, gate_state, specs[s], logging_loss,
            gate_tensors, epochs_per_call=eval_every, shuffle=shuffle,
        )[0]
        if not ok:
            return None, None, None, (
                f"runtime exactness gate failed for sweep member {s}"
            )
    try:
        traced_fn = make_fused_epoch(
            model, gate_state, specs[0], logging_loss,
            shuffle=shuffle, epochs_per_call=eval_every,
            traced_hyper=hyper_names,
        )
    except ValueError as e:
        return None, None, None, f"traced-hyper kernel build refused: {e}"
    verdict = _memoized_selfcheck(
        model, gate_params, specs[0], logging_loss, gate_tensors,
        eval_every=eval_every, shuffle=shuffle,
        extra=("sweep", hyper_names, str(specs[K - 1])),
        run=lambda: _sweep_kernel_selfcheck(
            traced_fn, model, gate_state, logging_loss,
            [specs[0], specs[K - 1]], hyper_names,
            gate_params, gate_tensors,
            eval_every=eval_every, shuffle=shuffle,
        ),
    )
    if not verdict:
        log.warning(
            "population sweep: traced-hyper fused kernel failed the "
            "self-check; falling back to the XLA engine"
        )
        return None, None, None, "sweep-kernel self-check failed"
    log.info(
        "population sweep: fused Pallas epoch engine with streamed "
        "per-member hyperparameters (gates passed)"
    )
    return traced_fn, hyper_names, (
        lambda p: init_fused_opt_state(p, specs[0])
    ), "sweep exactness gates + traced-hyper self-check passed"


def _sweep_kernel_selfcheck(
    traced_fn, model, state, logging_loss, extreme_specs, hyper_names,
    params, tensors, *, eval_every, shuffle,
) -> bool:
    """Run the production vmapped traced-hyper program with members
    [extreme0, extreme1, extreme0-duplicate] on a 2-batch slice: the
    duplicate must equal member 0 BITWISE, and both distinct members must
    match their static fused kernels (which the exactness gate just
    vouched for) to float tolerance."""
    from ..data.loaders import EpochTensors
    from ..ops.fused_epoch import init_fused_opt_state, make_fused_epoch

    try:
        nb = min(2, int(tensors.weight.shape[0]))
        sub = EpochTensors(
            x=jax.tree.map(lambda a: a[:nb], tensors.x),
            forcing={k: v[:nb] for k, v in tensors.forcing.items()},
            y={k: v[:nb] for k, v in tensors.y.items()},
            mask={k: v[:nb] for k, v in tensors.mask.items()},
            weight=tensors.weight[:nb],
            n_samples=tensors.n_samples,
        )
        key = jax.random.PRNGKey(0)
        vals = [
            [float(s[1][k]) for k in hyper_names] for s in extreme_specs
        ]
        hyper_mat = jnp.asarray([vals[0], vals[1], vals[0]], jnp.float32)

        def stack3(t):
            return jax.tree.map(
                lambda a: jnp.stack([jnp.asarray(a)] * 3), t
            )

        # the key is BATCHED (in_axes=0) exactly like the production sweep
        # (vepoch wraps the hyper into the opt state, leaving the key at
        # member axis 0): the self-check must lower the same batched
        # program, or a batched-key miscompile would slip past it
        vf = jax.vmap(traced_fn, in_axes=(0, 0, 0, None, 0, 0))
        ks = jnp.stack([key, key, key])
        opt0 = init_fused_opt_state(params, extreme_specs[0])
        pv, _, _, lv = vf(
            stack3(params), stack3(opt0), stack3(state), sub, ks, hyper_mat
        )
        lv = np.asarray(lv)
        for a in jax.tree.leaves(pv):
            a = np.asarray(a)
            if not np.array_equal(a[0], a[2]):
                return False  # duplicate members diverged: miscompile
        if not np.array_equal(lv[0], lv[2]):
            return False
        for i, spec in enumerate(extreme_specs):
            static = make_fused_epoch(
                model, state, spec, logging_loss,
                shuffle=shuffle, epochs_per_call=eval_every,
            )
            p1, _, _, l1 = static(
                jax.tree.map(jnp.array, params),
                init_fused_opt_state(params, spec),
                jax.tree.map(jnp.array, state), sub, key,
            )
            for a, b in zip(jax.tree.leaves(pv), jax.tree.leaves(p1)):
                if not np.allclose(
                    np.asarray(a)[i], np.asarray(b), atol=1e-5
                ):
                    return False
            if not np.allclose(lv[i], float(l1), rtol=1e-4):
                return False
        return True
    except Exception as e:  # build/launch failure → XLA fallback
        log.info(
            "sweep fused self-check raised %s: %s", type(e).__name__, e
        )
        return False


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

    ``mesh`` shards the MEMBER axis across the mesh's FIRST axis — members
    are embarrassingly parallel (shared read-only data, zero inter-member
    collectives), so population size scales linearly with the slice; K
    must be divisible by the member-axis size. A 1-D mesh composes with
    the fused Pallas engines: the vmapped kernel runs under ``shard_map``
    over the member axis (a ``pallas_call`` is opaque to the SPMD
    partitioner, so the member assignment is explicit). A 2-D mesh (e.g.
    ``Mesh(devs.reshape(M, D), ("members", "data"))``) ADDITIONALLY shards
    each member's in-batch sample axis over the second axis, with member
    params replicated across it so XLA inserts the per-member gradient
    ``psum`` automatically (``batchsize`` must divide by the data-axis
    size; eval batches are zero-mask padded to it) — that path runs the
    XLA engine (the psum must precede each update, which in-kernel
    updates cannot express).

    Returns :class:`PopulationResults` with per-member best-epoch tracking
    done ON DEVICE — one dispatch, one final fetch.

    Reference counterpart: the Hyperopt/folds tutorials drive ``train()``
    once per configuration (docs tutorials; tune.jl:27-44); there is no
    batched-population analog — this is TPU-native surplus.
    """
    # same persistent-cache policy as train(): each call builds fresh jit
    # closures (new cache keys), so without the HLO-level cache a repeat
    # population pays full recompilation — measured 7.9 s of a 9.9 s
    # repeat call on CPU (tune loops call this repeatedly)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    hyper = dict(hyper or {})
    static_hyper = dict(static_hyper or {})
    if optimizer not in OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; known: {sorted(OPTIMIZERS)}"
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

    logging_loss, monitor, sign, _scalars = _monitor_setup(
        training_loss, loss_types, agg
    )

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
    # eval batches stay on HOST until the final sharding is known (the 2-D
    # mesh path pads them with the numpy pad helper — padding device arrays
    # would force a device→host→device round trip of both full splits)
    host_tr, host_va = _full_batch(train_data), _full_batch(val_data)
    tensors = jax.device_put(host_tensors)

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

    # ---- engine selection: the fused Pallas epoch serves the whole
    # population. Seed ensembles (one shared optimizer config) bake the
    # hyperparams statically into the kernel; hyperparameter SWEEPS stream
    # the per-member scalars as a traced operand tile
    # (make_fused_epoch(traced_hyper=...), round 4). Both run jax.vmap of
    # the kernel, gated + self-checked (_select_fused_engine /
    # _select_fused_sweep_engine); anything outside the envelope falls
    # back to the XLA engine with inject_hyperparams.
    from .optimizers import _DEFAULT_LR

    single_config = all(
        np.unique(v).size == 1 for v in hyper_arr.values()
    )
    merged_hyper = {
        **static_hyper, **{k: float(v[0]) for k, v in hyper_arr.items()}
    }
    fused_spec = (
        (optimizer, merged_hyper) if merged_hyper
        else (optimizer, _DEFAULT_LR)
    )
    fused_epoch_fn = fused_opt_init = None
    sweep_hyper_names = None
    if mesh is not None and len(mesh.axis_names) > 1:
        # in-member data parallelism needs the gradient psum BEFORE each
        # optimizer update, which the fused kernel's in-kernel updates
        # cannot express — only the XLA engine composes with a 2-D mesh
        engine_reason = (
            "2-D mesh population runs the sharded XLA engine (in-member "
            "data parallelism needs a gradient psum before the update)"
        )
    elif not single_config:
        # hyperparameter SWEEP: per-member optimizer scalars stream into
        # the fused kernel as a traced operand tile (round-4; previously
        # sweeps always fell back to the XLA inject_hyperparams engine)
        (fused_epoch_fn, sweep_hyper_names, fused_opt_init,
         engine_reason) = _select_fused_sweep_engine(
            model, optimizer, hyper_arr, static_hyper, logging_loss,
            host_tensors,
            jax.tree.map(lambda a: a[0], pop_params), state0, tensors,
            eval_every=eval_every, shuffle=shuffle_each_epoch,
        )
    else:
        fused_epoch_fn, fused_opt_init, engine_reason = _select_fused_engine(
            model, fused_spec, logging_loss, host_tensors,
            jax.tree.map(lambda a: a[0], pop_params), state0, tensors,
            eval_every=eval_every, shuffle=shuffle_each_epoch,
        )
    use_fused = fused_epoch_fn is not None
    if use_fused and mesh is not None:
        engine_reason += "; shard_map over the member axis"
    if not use_fused:
        log.info("population engine: XLA (vmap) — %s", engine_reason)

    # ---- one optimizer, per-member hyperparams in the STATE ---------------
    import optax

    if use_fused and sweep_hyper_names is not None:
        # traced-hyper fused sweep: the per-member scalar vector rides the
        # OPT STATE (like inject_hyperparams does on the XLA path), so the
        # shared population loop vmaps it with in_axes=0 unchanged
        opt = None
        hyper_mat = jnp.asarray(
            np.stack([hyper_arr[k] for k in sweep_hyper_names], axis=1),
            jnp.float32,
        )  # (K, n_hyper)
        traced_fn = fused_epoch_fn

        def _sweep_epoch_fn(p, o, s, t, k):
            p, o2, s2, l = traced_fn(p, o["state"], s, t, k, o["hyper"])
            return p, {"state": o2, "hyper": o["hyper"]}, s2, l

        fused_epoch_fn = _sweep_epoch_fn
        pop_opt_state = {
            "state": jax.jit(jax.vmap(fused_opt_init))(pop_params),
            "hyper": hyper_mat,
        }
    elif use_fused:
        opt = None
        pop_opt_state = jax.jit(jax.vmap(fused_opt_init))(pop_params)
    elif hyper_arr:
        opt = optax.inject_hyperparams(OPTIMIZERS[optimizer])(
            **{k: float(v[0]) for k, v in hyper_arr.items()}, **static_hyper
        )
    else:
        # seed-only ensembles: the library default lr (resolve_optimizer's
        # _DEFAULT_LR), same as train(model, df, optimizer="adam")
        opt = (
            OPTIMIZERS[optimizer](**static_hyper)
            if static_hyper
            else OPTIMIZERS[optimizer](_DEFAULT_LR)
        )
    if opt is not None:
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

        pop_params, pop_state, pop_opt_state = _shard_members(
            mesh, K, (pop_params, pop_state, pop_opt_state),
            "population size",
        )
        if len(mesh.axis_names) > 1:
            # 2-D composed parallelism (the scaling-book pattern): axis 0
            # shards MEMBERS (embarrassingly parallel), axis 1 shards the
            # in-batch SAMPLE axis within each member — params stay
            # replicated across the data axis, so XLA inserts the
            # per-member gradient psum over it automatically. Member
            # trees above already carry P(member_axis) with every other
            # axis replicated, which is exactly right here too.
            from ..data.loaders import EpochTensors as _ET

            data_ax = mesh.axis_names[1]
            n_data = int(mesh.shape[data_ax])
            if batchsize % n_data:
                raise ValueError(
                    f"batchsize {batchsize} not divisible by the data-axis "
                    f"size {n_data} of mesh {dict(mesh.shape)}"
                )
            # eval batches must also split evenly over the data axis:
            # zero-mask pad to the next multiple (exact no-op rows) — on
            # HOST, before the one device_put below
            def _ceil_rows(batch_tree):
                n = int(np.asarray(jax.tree.leaves(batch_tree)[0]).shape[0])
                return _pad_batch_rows(
                    batch_tree, -(-n // n_data) * n_data
                )

            tr_batch = jax.device_put(
                _ceil_rows(host_tr), NamedSharding(mesh, _P(data_ax))
            )
            va_batch = jax.device_put(
                _ceil_rows(host_va), NamedSharding(mesh, _P(data_ax))
            )
            batch_sh = NamedSharding(mesh, _P(None, data_ax))
            arrays = jax.device_put(
                (tensors.x, tensors.forcing, tensors.y, tensors.mask,
                 tensors.weight),
                batch_sh,
            )  # (num_batches, batch, ...) → batch axis sharded; the
            # static int n_samples cannot take a rank-2 spec
            tensors = _ET(*arrays, n_samples=tensors.n_samples)
        else:
            # 1-D: the data is SHARED across members — replicate it
            tensors, tr_batch, va_batch = jax.device_put(
                (tensors, host_tr, host_va), NamedSharding(mesh, _P())
            )
    else:
        tr_batch, va_batch = jax.device_put((host_tr, host_va))

    if use_fused:
        epoch_fn = fused_epoch_fn
    else:
        epoch_fn = make_train_epoch(
            model, logging_loss, opt, shuffle=shuffle_each_epoch, jit=False,
            epochs_per_call=eval_every, skip_empty_guard=skip_guard,
        )
    vepoch = jax.vmap(epoch_fn, in_axes=(0, 0, 0, None, 0))
    if use_fused and mesh is not None:
        vepoch = _shard_map_members(
            vepoch, mesh, tensors, data_on_members=False
        )
    eval_fn = make_dual_evaluator(model, logging_loss, jit=False)
    veval = jax.vmap(eval_fn, in_axes=(0, 0, None, None))

    p, s, best_sc, best_p, best_ep, h_tr, h_va = _run_population(
        vepoch, veval, _scalars, monitor, sign, K,
        nepochs=nepochs, eval_every=eval_every, seed=seed,
        pop_params=pop_params, pop_opt_state=pop_opt_state,
        pop_state=pop_state, tensors=tensors,
        tr_batch=tr_batch, va_batch=va_batch,
        # pure hyper sweep (uniform seeds): members must see IDENTICAL
        # data order so the sweep comparison is not confounded by
        # shuffle noise (reference tune loops train each config with the
        # same seed); seed ensembles keep per-member shuffle streams
        shared_shuffle=(seeds is None),
    )
    return _assemble_results(
        hyper_arr, seeds_arr, monitor, sign, eval_every,
        p, s, best_sc, best_p, best_ep, h_tr, h_va,
        epoch_path=(
            "population_vmap_fused" if use_fused else "population_vmap"
        ),
        engine_reason=engine_reason,
    )


def _run_population(
    vepoch, veval, scalars_fn, monitor, sign, K, *,
    nepochs, eval_every, seed,
    pop_params, pop_opt_state, pop_state, tensors, tr_batch, va_batch,
    shared_shuffle: bool = False,
):
    """The shared one-program population loop: scan over eval blocks, each
    block = vmapped epoch(s) + vmapped dual eval + on-device best-member
    tracking. ``tensors``/``tr_batch``/``va_batch`` may be shared across
    members (vepoch/veval built with ``in_axes=None`` for them) or carry a
    leading member axis (``in_axes=0`` — the CV case).

    ``shared_shuffle=True`` gives every member the SAME shuffle key per
    eval block (identical data order): in a pure hyperparameter sweep the
    members must differ ONLY by hyperparameter, not by batch order —
    matching the reference's sequential tune loop, where every config
    trains with the same seed. Seed ensembles keep per-member keys."""
    # floor, matching train()'s eval grid range(eval_every, nepochs+1, ...):
    # a 10-epoch budget at eval_every=3 trains 9 epochs, never 12
    n_evals = int(nepochs) // int(eval_every)
    if n_evals < 1:
        raise ValueError(
            f"nepochs={nepochs} < eval_every={eval_every}: no eval block "
            "fits the budget (train() would run zero evaluated epochs too)"
        )

    def run(pop_params, pop_opt_state, pop_state, tensors,
            tr_batch, va_batch, key):
        (m_tr0, _), (m_va0, _) = veval(
            pop_params, pop_state, tr_batch, va_batch
        )
        best_score = sign * scalars_fn(m_va0)[monitor]
        carry0 = (
            pop_params, pop_opt_state, pop_state,
            best_score, pop_params, jnp.zeros((K,), jnp.int32),
        )
        if shared_shuffle:
            blk = jax.random.split(key, n_evals)
            step_keys = jnp.broadcast_to(
                blk[:, None, :], (n_evals, K, blk.shape[-1])
            )
        else:
            step_keys = jax.random.split(key, n_evals * K).reshape(
                n_evals, K, -1
            )

        def step(carry, inp):
            i, ks = inp
            p, o, s, best_sc, best_p, best_ep = carry
            p, o, s, _ = vepoch(p, o, s, tensors, ks)
            (m_tr, _), (m_va, _) = veval(p, s, tr_batch, va_batch)
            m_tr, m_va = scalars_fn(m_tr), scalars_fn(m_va)
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

    return jax.jit(run)(
        pop_params, pop_opt_state, pop_state, tensors, tr_batch, va_batch,
        jax.random.PRNGKey(int(seed)),
    )


def _assemble_results(
    hyper_arr, seeds_arr, monitor, sign, eval_every,
    p, s, best_sc, best_p, best_ep, h_tr, h_va,
    epoch_path: str = "population_vmap",
    engine_reason: Optional[str] = None,
) -> PopulationResults:
    best_losses = np.asarray(jax.device_get(sign * best_sc))
    h_tr = {k: np.asarray(v) for k, v in jax.device_get(h_tr).items()}
    h_va = {k: np.asarray(v) for k, v in jax.device_get(h_va).items()}
    n_evals = next(iter(h_va.values())).shape[0]
    best_i = int(
        np.argmax(best_losses) if sign < 0 else np.argmin(best_losses)
    )
    log.info(
        "population: %d members, %d epochs (eval every %d); best member %d "
        "(%s) with val %s=%.6g at epoch %d",
        len(best_losses), n_evals * eval_every, eval_every, best_i,
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
        epoch_path=epoch_path,
        engine_reason=engine_reason,
    )


def _pad_epoch_tensors(t, nb: int, n_samples: int):
    """Pad an EpochTensors' batch axis to ``nb`` with all-zero batches
    (zero weight + zero masks → exact no-ops through the masked pipeline,
    the same semantics as the standard partial-batch padding)."""
    from ..data.loaders import EpochTensors, pad_axis0

    def pad(a):
        return pad_axis0(a, nb)

    return EpochTensors(
        x=jax.tree.map(pad, t.x),
        forcing={k: pad(v) for k, v in t.forcing.items()},
        y={k: pad(v) for k, v in t.y.items()},
        mask={k: pad(v) for k, v in t.mask.items()},
        weight=pad(t.weight),
        n_samples=n_samples,
    )


def _pad_batch_rows(batch, n: int):
    """Pad a ((x, forcing), (y, mask)) eval batch to ``n`` rows with
    zero-mask rows (metrics unaffected)."""
    from ..data.loaders import pad_axis0

    return jax.tree.map(lambda a: pad_axis0(a, n), batch)


def population_cross_validate(
    model,
    data,
    *,
    k: int = 5,
    optimizer: Any = ("adam", 0.01),
    nepochs: int = 100,
    batchsize: int = 32,
    eval_every: int = 1,
    training_loss: Any = "mse",
    loss_types: Optional[Sequence[Any]] = None,
    agg: Any = "sum",
    shuffle_each_epoch: bool = True,
    shuffle_folds: bool = True,
    seed: int = 42,
    sequence_kwargs: Optional[dict] = None,
    data_seed: Optional[int] = None,
    mesh=None,
) -> PopulationResults:
    """K-fold cross-validation as ONE compiled program: member i = fold
    i+1, each with its OWN stacked train tensors / eval batches (folds of
    unequal size are zero-mask padded to common shapes — exact no-ops
    through the masked pipeline), its own fitted input-norm state, and the
    same init. Replaces ``cross_validate``'s k sequential ``train()``
    calls with one dispatch + one fetch; on a TPU the folds ride the
    member axis like a sweep does, so CV costs roughly one fold's
    wall-clock.

    ``optimizer`` is any spec ``resolve_optimizer`` accepts (tuple/str/
    per-branch dict/prebuilt transform) — all folds share it. ``mesh``
    shards the FOLD axis across the mesh's first axis (k divisible by the
    member-axis size). Fusable configs run the fused Pallas epoch kernel
    (the per-fold data vmaps along with the fold axis; gated + vmapped
    self-check, see ``_select_fused_engine``) — including under a 1-D
    mesh, where the vmapped kernel runs in ``shard_map`` with the fold
    data sharded along the fold axis.

    Returns :class:`PopulationResults` with ``seeds`` holding the fold
    index per member and ``best_losses`` the per-fold best monitored
    validation value — ``list(pop.best_losses)`` is the CV score vector
    (the reference folds tutorial's output). Reference counterpart:
    docs/literate/tutorials/folds.jl drives train() once per fold.
    """
    from ..data.prepare import prepare_data
    from ..utils.cache import enable_compilation_cache
    from ..utils.folds import make_folds
    from .optimizers import resolve_optimizer
    from .train import _full_batch, fit_input_norm

    enable_compilation_cache()  # see population_train
    K = int(k)
    if K < 2:
        raise ValueError(
            f"population_cross_validate needs k >= 2, got k={K} "
            "(k=1 would leave a fold's train split empty)"
        )
    logging_loss, monitor, sign, _scalars = _monitor_setup(
        training_loss, loss_types, agg
    )

    # prepare (and window) ONCE, then fold over the PREPARED samples — a
    # single host-side ingestion instead of K, and fold counts that match
    # the windowed sample count (per-row fold ids would mismatch after
    # sequence windowing). With sequence_kwargs, folds partition WINDOWS:
    # adjacent windows overlap in raw rows, so neighboring-fold leakage at
    # window boundaries is inherent to windowed CV — same caveat as
    # shuffling windowed samples into a validation split.
    from ..data.xarray_io import is_xarray_like, xarray_to_dataframe

    if is_xarray_like(data):
        data = xarray_to_dataframe(data)
    prepared = prepare_data(
        model, data, drop_missing_rows=(sequence_kwargs is None)
    )
    if sequence_kwargs is not None:
        from ..data.sequences import filter_sequences, split_into_sequences

        defaults = dict(
            input_window=10, output_window=1, output_shift=1, lead_time=1
        )
        prepared = filter_sequences(
            split_into_sequences(prepared, **{**defaults, **sequence_kwargs})
        )
    n = prepared.n_samples
    fold_ids = make_folds(
        range(n), k=K, shuffle=shuffle_folds, seed=data_seed or 0
    )
    splits = [
        (
            prepared.take(np.nonzero(fold_ids != i)[0]),
            prepared.take(np.nonzero(fold_ids == i)[0]),
        )
        for i in range(1, K + 1)
    ]
    fold_tensors = [
        build_epoch_tensors(tr, batchsize) for tr, _ in splits
    ]
    nb = max(t.weight.shape[0] for t in fold_tensors)
    ns = max(t.n_samples for t in fold_tensors)
    # padding may introduce fully-empty batches → the guard must stay on
    # unless every fold proves it AND no batch padding was needed
    skip_guard = all(
        can_skip_empty_guard(t) and t.weight.shape[0] == nb
        for t in fold_tensors
    )
    fold_tensors = [_pad_epoch_tensors(t, nb, ns) for t in fold_tensors]
    tensors = jax.tree.map(lambda *ls: np.stack(ls), *fold_tensors)
    from ..data.loaders import EpochTensors

    tensors = EpochTensors(
        x=tensors.x, forcing=tensors.forcing, y=tensors.y,
        mask=tensors.mask, weight=tensors.weight, n_samples=ns,
    )

    tr_full = [_full_batch(tr) for tr, _ in splits]
    va_full = [_full_batch(va) for _, va in splits]
    n_tr = max(np.asarray(b[0][0] if not isinstance(b[0][0], Mapping)
                          else next(iter(b[0][0].values()))).shape[0]
               for b in tr_full)
    n_va = max(np.asarray(b[0][0] if not isinstance(b[0][0], Mapping)
                          else next(iter(b[0][0].values()))).shape[0]
               for b in va_full)
    tr_batch = jax.tree.map(
        lambda *ls: np.stack(ls), *[_pad_batch_rows(b, n_tr) for b in tr_full]
    )
    va_batch = jax.tree.map(
        lambda *ls: np.stack(ls), *[_pad_batch_rows(b, n_va) for b in va_full]
    )
    tensors, tr_batch, va_batch = jax.device_put(
        (tensors, tr_batch, va_batch)
    )

    # same init every fold (cross_validate semantics: one model, k folds);
    # per-fold input-norm state fitted on that fold's OWN train split
    params0, state_init = model.init(jax.random.PRNGKey(int(seed)))
    pop_params = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (K,) + jnp.shape(a)),
        params0,
    )
    fold_states = [
        fit_input_norm(model, state_init, tr) for tr, _ in splits
    ]
    pop_state = jax.tree.map(
        lambda *ls: jnp.stack([jnp.asarray(x) for x in ls]), *fold_states
    )

    # engine: the fused Pallas epoch vmaps over per-fold DATA too (the
    # data arrays become leading-axis operands → extra grid dim; the
    # vmapped self-check inside _select_fused_engine validates exactly
    # that program). Gate data = a device-side slice of the already-
    # uploaded stack (no second host→device transfer of fold 0).
    t_axes = EpochTensors(
        x=0, forcing=0, y=0, mask=0, weight=0, n_samples=None
    )
    fold0_dev = EpochTensors(
        x=jax.tree.map(lambda a: a[0], tensors.x),
        forcing={k: v[0] for k, v in tensors.forcing.items()},
        y={k: v[0] for k, v in tensors.y.items()},
        mask={k: v[0] for k, v in tensors.mask.items()},
        weight=tensors.weight[0],
        n_samples=ns,
    )
    fused_epoch_fn = fused_opt_init = None
    if mesh is not None and len(mesh.axis_names) > 1:
        engine_reason = (
            "2-D mesh CV runs the sharded XLA engine (in-fold data "
            "parallelism needs a gradient psum before the update)"
        )
    else:
        fused_epoch_fn, fused_opt_init, engine_reason = _select_fused_engine(
            model, optimizer, logging_loss, fold_tensors[0],
            params0, fold_states[0], fold0_dev,
            eval_every=eval_every, shuffle=shuffle_each_epoch,
            t_axes=t_axes, what=" CV",
        )
    use_fused = fused_epoch_fn is not None
    if use_fused and mesh is not None:
        engine_reason += "; shard_map over the fold axis"
    if not use_fused:
        log.info("population CV engine: XLA (vmap) — %s", engine_reason)

    if use_fused:
        opt = None
        pop_opt_state = jax.jit(jax.vmap(fused_opt_init))(pop_params)
    else:
        opt = resolve_optimizer(optimizer, params0)
        pop_opt_state = jax.jit(jax.vmap(opt.init))(pop_params)

    if mesh is not None:
        # per-fold data rides the member axis here, so it shards too
        (pop_params, pop_state, pop_opt_state, tr_batch, va_batch,
         t_arrays) = _shard_members(
            mesh, K,
            (pop_params, pop_state, pop_opt_state, tr_batch, va_batch,
             (tensors.x, tensors.forcing, tensors.y, tensors.mask,
              tensors.weight)),
            "fold count",
        )
        tensors = EpochTensors(
            x=t_arrays[0], forcing=t_arrays[1], y=t_arrays[2],
            mask=t_arrays[3], weight=t_arrays[4], n_samples=ns,
        )

    if use_fused:
        epoch_fn = fused_epoch_fn
    else:
        epoch_fn = make_train_epoch(
            model, logging_loss, opt, shuffle=shuffle_each_epoch, jit=False,
            epochs_per_call=eval_every, skip_empty_guard=skip_guard,
        )
    # t_axes (defined above): every array field carries the fold axis,
    # but the static n_samples scalar is shared (rank 0 — not mappable)
    vepoch = jax.vmap(epoch_fn, in_axes=(0, 0, 0, t_axes, 0))
    if use_fused and mesh is not None:
        # per-fold data rides the fold axis, so its arrays shard with it
        vepoch = _shard_map_members(
            vepoch, mesh, tensors, data_on_members=True
        )
    eval_fn = make_dual_evaluator(model, logging_loss, jit=False)
    veval = jax.vmap(eval_fn, in_axes=(0, 0, 0, 0))

    p, s, best_sc, best_p, best_ep, h_tr, h_va = _run_population(
        vepoch, veval, _scalars, monitor, sign, K,
        nepochs=nepochs, eval_every=eval_every, seed=seed,
        pop_params=pop_params, pop_opt_state=pop_opt_state,
        pop_state=pop_state, tensors=tensors,
        tr_batch=tr_batch, va_batch=va_batch,
    )
    return _assemble_results(
        {}, np.arange(1, K + 1, dtype=np.int64), monitor, sign, eval_every,
        p, s, best_sc, best_p, best_ep, h_tr, h_va,
        epoch_path=(
            "population_vmap_cv_fused" if use_fused
            else "population_vmap_cv"
        ),
        engine_reason=engine_reason,
    )
