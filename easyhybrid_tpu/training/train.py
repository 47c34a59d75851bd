"""The ``train`` public API: config overlay, jitted epoch loop, results.

Parity with the reference's training driver (reference:
src/training/train.jl — public ``train`` :211-237, kwargs→configs :272-345,
``_train`` orchestration :95-136) re-architected for TPU:

* the whole training split is resident on device as padded epoch tensors;
* one jitted ``lax.scan`` program runs the epoch (see epoch.py);
* evaluation is a second jitted program; only scalar metrics cross to host
  per epoch; predictions transfer once at the end (or per epoch only when
  ``keep_history``/``plotting`` ask for them);
* early stopping, history, checkpointing and progress live on host, as in
  the reference.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.train_config import DataConfig, TrainConfig, TrainResults, validate_config
from ..data.loaders import build_epoch_tensors
from ..data.prepare import HybridData
from ..data.split import merged_sequence_kwargs, split_data
from ..losses.specs import LoggingLoss
from ..utils.host import start_fetch as _start_fetch
from .early_stopping import EarlyStopping
from .epoch import make_dual_evaluator, make_train_epoch
from .history import EpochSnapshot, TrainingHistory
from .optimizers import is_second_order, resolve_optimizer

__all__ = ["train"]

log = logging.getLogger("easyhybrid_tpu")

#: kwarg renames kept for reference-API familiarity
#: (parity: rename_deprecated_kwargs, train.jl:328-345)
_RENAMED_KWARGS = {
    "opt": "optimizer",
    "hybrid_name": "model_name",
    "file_name": "model_name",
    "loss_fn": "training_loss",
}

_TRAIN_FIELDS = {f.name for f in dataclasses.fields(TrainConfig)}
_DATA_FIELDS = {f.name for f in dataclasses.fields(DataConfig)}


#: params above this size skip the optax.flatten fast path: flatten ravels
#: + concatenates + splits the WHOLE tree every step, which is pure HBM
#: traffic the update math doesn't need. Measured on-chip (1× v5e,
#: 2026-08-19, tools/probe_b1024_ceiling.py, b1024 tower / 1.2M params):
#: bare adam step 51.8% MFU unflattened vs 44.0% flattened (~15% tax).
#: Small hybrid models (the quick-start class) measure FASTER flattened
#: (one flat update vector instead of ~2 ops per pytree leaf), which is
#: why the fast path exists — the threshold sits safely between the two
#: measured regimes.
_FLATTEN_MAX_PARAMS = 65536


def _flatten_safe(spec, params=None) -> bool:
    """Whether the ``optax.flatten`` fast path preserves the optimizer's
    semantics AND pays off. Flatten concatenates every leaf into ONE
    vector, which only commutes with ELEMENTWISE update rules — lamb's
    per-leaf trust ratio silently becomes one global norm (found
    2026-08-17; optax.flatten(lamb) and lamb genuinely disagree), and
    noisy_sgd's tree.random_like draws one flat-vector noise leaf instead
    of per-leaf subkey draws — a DIFFERENT realized stream. Prebuilt
    transforms can't be proven elementwise, so they are not flattened
    either. With ``params`` given, trees above
    :data:`_FLATTEN_MAX_PARAMS` also skip it (flatten's per-step
    ravel/concat traffic measurably beats its dispatch savings there —
    see the constant's measurement note); for elementwise rules the
    decision is perf-only, never numerics."""
    from ..ops.fused_epoch import _NOISE_OPTS, _WHOLELEAF_OPTS

    if isinstance(spec, str):
        name = spec.lower()
    elif isinstance(spec, tuple) and spec and isinstance(spec[0], str):
        name = spec[0].lower()
    else:
        return False  # Mapping (label tree) or prebuilt transform
    if name in _WHOLELEAF_OPTS or name in _NOISE_OPTS:
        return False
    if params is not None:
        n = sum(int(np.prod(jnp.shape(l))) for l in jax.tree.leaves(params))
        if n > _FLATTEN_MAX_PARAMS:
            return False
    return True


def kwargs_to_configs(
    kwargs: Dict[str, Any],
    train_cfg: Optional[TrainConfig],
    data_cfg: Optional[DataConfig],
) -> Tuple[TrainConfig, DataConfig, Dict[str, Any]]:
    """Overlay flat kwargs onto typed configs; leftover kwargs returned for
    the second-order solver (parity: train.jl:272-314)."""
    train_cfg = train_cfg or TrainConfig()
    data_cfg = data_cfg or DataConfig()
    leftovers: Dict[str, Any] = {}
    renamed = {}
    for k, v in kwargs.items():
        if k in _RENAMED_KWARGS:
            log.warning(
                "keyword %r is deprecated; use %r", k, _RENAMED_KWARGS[k]
            )
            k = _RENAMED_KWARGS[k]
        renamed[k] = v
    for k, v in renamed.items():
        if k in _TRAIN_FIELDS:
            train_cfg = train_cfg.replace(**{k: v})
        elif k in _DATA_FIELDS:
            # incl. sequence_kwargs, normalized later by
            # merged_sequence_kwargs
            data_cfg = data_cfg.replace(**{k: v})
        else:
            leftovers[k] = v
    return train_cfg, data_cfg, leftovers


def fit_input_norm(model, state, train_data: HybridData):
    """Pre-fit 'static' input-normalization stats from the training split.

    Models built with ``input_batchnorm="static"`` normalize with frozen
    dataset statistics (functionally the converged behavior of the
    reference's InputBatchNorm, NNModels.jl:89-105) — computed here once and
    written into the state pytree."""

    def stats(x):
        x = np.asarray(x, np.float32)
        flat = x.reshape(-1, x.shape[-1])
        return {
            "mean": jnp.asarray(flat.mean(0)),
            "var": jnp.asarray(np.maximum(flat.var(0), 1e-12)),
        }

    new_state = dict(state)
    nn = getattr(model, "nn", None)
    if nn is not None and getattr(nn, "input_batchnorm", False) == "static":
        new_state["nn"] = {**state.get("nn", {}), "norm": stats(train_data.x)}
    nns = getattr(model, "nns", None)
    if nns:
        branch_states = dict(state.get("nns", {}))
        for name, branch_nn in nns:
            if getattr(branch_nn, "input_batchnorm", False) == "static":
                branch_states[name] = {
                    **branch_states.get(name, {}),
                    "norm": stats(train_data.x[name]),
                }
        new_state["nns"] = branch_states
    return new_state


@functools.partial(jax.jit, static_argnums=0)
def _jit_init(model, key):
    """Model init as ONE compiled program. Eager init dispatches dozens of
    tiny ops (PRNG splits, glorot inits, seeding); on a remote/tunneled TPU
    each eager op costs a round trip, dominating cold start. Models are
    frozen dataclasses, so they are valid static args and the executable is
    shared across train() calls."""
    return model.init(key)


def _get_ps_st(train_from):
    """Warm-start source → (params, state) (parity: get_ps_st,
    train.jl:376-382)."""
    if train_from is None:
        return None
    if isinstance(train_from, TrainResults):
        return train_from.params, train_from.state
    if isinstance(train_from, tuple) and len(train_from) == 2:
        return train_from
    if isinstance(train_from, str):
        from ..io.checkpoint import load_checkpoint

        ckpt = load_checkpoint(train_from)
        return ckpt["params"], ckpt["state"]
    raise TypeError(f"cannot warm-start from {type(train_from).__name__}")


def _full_batch(
    data: HybridData, pad_multiple: int = 1
) -> Tuple[Any, Tuple[Dict, Dict]]:
    """Full-split eval batch ((x, forcing), (y, mask)) with NaN masks;
    padded up to a multiple of ``pad_multiple`` samples (for even sharding).
    Padding rows carry zero masks so metrics are unaffected."""
    n = data.n_samples
    batch = -(-n // pad_multiple) * pad_multiple if pad_multiple > 1 else None
    tensors = build_epoch_tensors(data, batch)
    x = jax.tree.map(lambda a: a[0], tensors.x)
    forcing = {k: v[0] for k, v in tensors.forcing.items()}
    y = {k: v[0] for k, v in tensors.y.items()}
    mask = {k: v[0] for k, v in tensors.mask.items()}
    return ((x, forcing), (y, mask))


def _trim(arr, n: int):
    arr = np.asarray(arr)
    if arr.ndim >= 1 and arr.shape[0] >= n:
        return arr[:n]
    return arr



def _host_metrics(metrics) -> Dict[str, Dict[str, float]]:
    _start_fetch(metrics)
    return jax.tree.map(lambda v: float(v), jax.device_get(metrics))


def _outputs_to_host(outputs, n: int):
    _start_fetch(outputs)
    out = {}
    for k, v in outputs.items():
        if isinstance(v, Mapping):
            out[k] = {kk: _trim(jax.device_get(vv), n) for kk, vv in v.items()}
        else:
            out[k] = _trim(jax.device_get(v), n)
    return out


def _obs_pred_frames(data: HybridData, outputs, targets):
    """Observation and prediction DataFrames (parity: build_results,
    early_stopping.jl:73-100). Multi-dimensional targets (sequence windows,
    multi-site) flatten to long format with ``sample``/``step`` index columns
    (the reference's 3-D toDataFrame analog, utils/tools.jl:170-282)."""
    import pandas as pd

    n = data.n_samples
    shapes = [np.asarray(data.y[t]).shape for t in targets]
    multi_dim = any(len(s) > 1 for s in shapes)

    def flat_obs(t):
        return np.asarray(data.y[t], np.float32).ravel()

    def flat_pred(t):
        arr = np.asarray(_trim(outputs[t], n), np.float32)
        y_shape = np.asarray(data.y[t]).shape
        if arr.ndim >= 2 and len(y_shape) >= 2 and arr.shape[1] != y_shape[1]:
            arr = arr[:, -y_shape[1] :]  # trailing-window alignment
        return arr.ravel()

    if not multi_dim:
        obs = pd.DataFrame({t: flat_obs(t) for t in targets})
        pred = pd.DataFrame(
            {f"{t}_pred": flat_pred(t) for t in targets if t in outputs}
        )
        return obs, pred

    # group targets by shape — heterogeneous targets (e.g. a windowed
    # (N, T) target next to a per-sample (N,) one) cannot share one ravel
    # index; each group gets its own long frame, outer-merged on the
    # index columns (per-sample values broadcast across a window's steps)
    def group_frames(ts, shape):
        idx = np.indices(shape).reshape(len(shape), -1)
        index_cols = {"sample": idx[0]}
        if len(shape) > 1:
            index_cols["step"] = idx[1]
        o = pd.DataFrame({**index_cols, **{t: flat_obs(t) for t in ts}})
        p = pd.DataFrame(
            {
                **index_cols,
                **{f"{t}_pred": flat_pred(t) for t in ts if t in outputs},
            }
        )
        return o, p

    by_shape: Dict[tuple, list] = {}
    for t, s in zip(targets, shapes):
        by_shape.setdefault(tuple(s), []).append(t)
    obs = pred = None
    for s, ts in by_shape.items():
        o, p = group_frames(ts, s)
        if obs is None:
            obs, pred = o, p
            continue
        keys = [c for c in ("sample", "step") if c in obs and c in o]
        obs = obs.merge(o, on=keys, how="outer")
        pred = pred.merge(p, on=keys, how="outer")
    return obs, pred


def _make_grad_probe(model, logging_loss, jit: bool = True):
    """Full-train-batch gradient probe for ``return_gradients`` diagnostics
    (parity: the return_gradients TrainConfig field, TrainingConfig.jl:9-160
    — here as per-snapshot grad norms + the final grads pytree, the useful
    form for diagnosing hybrid-physics gradient pathologies).

    The batch is an explicit argument, NOT a closure capture: the probe is
    traced inside the deferred loop's single whole-run program, where a
    captured device array would embed as a program constant (bigger
    executable + value-dependent compile-cache key → full recompile on any
    data change)."""
    from .epoch import make_loss_fn

    loss_fn = make_loss_fn(model, logging_loss)

    def probe(params, state, batch):
        return jax.grad(lambda p: loss_fn(p, state, batch)[0])(params)

    return jax.jit(probe) if jit else probe


def _grad_norms(grads) -> Dict[str, float]:
    """Global + per-top-level-branch gradient L2 norms."""
    import optax

    norms = {"global": float(jax.device_get(optax.global_norm(grads)))}
    if isinstance(grads, Mapping):
        for k, v in grads.items():
            norms[k] = float(jax.device_get(optax.global_norm(v)))
    return norms


def _extract_diffs(outputs, targets, n: int):
    """Non-target outputs (learned physical params etc.); parity:
    extract_diffs (early_stopping.jl:102-111)."""
    diffs = {}
    for k, v in outputs.items():
        if k in targets:
            continue
        diffs[k] = v
    return diffs or None


def train(
    model,
    data,
    *,
    train_cfg: Optional[TrainConfig] = None,
    data_cfg: Optional[DataConfig] = None,
    **kwargs,
) -> TrainResults:
    """Train a hybrid model. Accepts typed configs, flat kwargs, or both
    (kwargs override config fields) — parity: train (train.jl:211-237).
    """
    cfg, dcfg, leftovers = kwargs_to_configs(kwargs, train_cfg, data_cfg)
    validate_config(cfg)

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if is_second_order(cfg.optimizer) or cfg.second_order:
        from .lbfgs import train_second_order

        return train_second_order(model, data, cfg, dcfg, **leftovers)
    if leftovers:
        log.warning(
            "Unknown kwargs ignored on the optax path: %s", ", ".join(leftovers)
        )

    key = jax.random.PRNGKey(cfg.random_seed)
    key, init_key = jax.random.split(key)

    # ---- data ----
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
        raise ValueError(
            "validation split is empty; lower split_data_at (< 1.0) or pass "
            "a pre-split (train, val) tuple"
        )

    batchsize = cfg.batchsize
    mesh = None
    if cfg.multi_device:
        from ..parallel.mesh import make_mesh

        mesh = cfg.mesh or make_mesh()
        n_dev = mesh.devices.size
        if batchsize is None:
            batchsize = train_data.n_samples
        # sample axis must split evenly over the mesh
        batchsize = max(n_dev, (batchsize // n_dev) * n_dev)

    pad_mult = mesh.devices.size if mesh is not None else 1
    train_tensors = build_epoch_tensors(train_data, batchsize)
    # guard provability is decided while the tensors are still HOST numpy:
    # post-sharding it would be a device→host readback (costly on a
    # tunneled TPU, and readbacks degrade async dispatch — docs/tpu_notes.md)
    from .epoch import can_skip_empty_guard

    skip_empty_guard = can_skip_empty_guard(train_tensors)
    train_eval_batch = _full_batch(train_data, pad_mult)
    val_eval_batch = _full_batch(val_data, pad_mult)

    if mesh is not None:
        from ..parallel.mesh import shard_batch, shard_epoch_tensors

        train_tensors = shard_epoch_tensors(train_tensors, mesh)
        train_eval_batch = shard_batch(train_eval_batch, mesh)
        val_eval_batch = shard_batch(val_eval_batch, mesh)
    else:
        # pin the epoch tensors and eval batches on device ONCE: passing
        # host numpy into the jitted programs re-uploads the whole dataset
        # on EVERY call (seconds per epoch over a tunneled TPU)
        train_tensors, train_eval_batch, val_eval_batch = jax.device_put(
            (train_tensors, train_eval_batch, val_eval_batch)
        )

    # ---- model/optimizer state ----
    warm = _get_ps_st(cfg.train_from)
    if warm is not None:
        params, state = jax.tree.map(jnp.asarray, warm)
    else:
        try:
            params, state = _jit_init(model, init_key)
        except (TypeError, ValueError):
            # unhashable custom model (jax raises ValueError for non-hashable
            # static args, older versions TypeError): eager fallback
            params, state = model.init(init_key)
    state = fit_input_norm(model, state, train_data)

    logging_loss = LoggingLoss(
        loss_types=tuple(cfg.loss_types),
        training_loss=cfg.training_loss,
        extra_loss=cfg.extra_loss,
        agg=cfg.agg,
    )

    # ---- fused Pallas fast path (TPU): whole epoch as one kernel ----
    # Round 1's kernel failure mode was a SILENT Mosaic miscompile, so
    # "auto" (the default) only enables the kernel after a runtime
    # gradient-exactness check against the XLA scan epoch on the actual
    # model and data (ops/fused_epoch.py::fused_exactness_check).
    # use_pallas=True / EASYHYBRID_PALLAS=1 skips the backend gate but NOT
    # the exactness gate; EASYHYBRID_PALLAS=0 / use_pallas=False disables.
    import os

    use_pallas = cfg.use_pallas
    if use_pallas != "auto" and use_pallas is not None and not (
        use_pallas is True or use_pallas is False
    ):
        # normalize stray truthy/falsy values (e.g. 1, "on") so the gate
        # block below always runs and is_multisite_fused is always bound
        # — identity checks, because 1 == True would dodge an `in` test
        # and then fail the `is True` force check below
        use_pallas = bool(use_pallas)
    if os.environ.get("EASYHYBRID_PALLAS") == "1" and use_pallas in ("auto", None):
        use_pallas = True
    if os.environ.get("EASYHYBRID_PALLAS") == "0":
        use_pallas = False
    eval_every = max(1, int(cfg.eval_every))

    # why the epoch engine was (not) the fused kernel — surfaced to users
    # via one info line + TrainResults.engine_reason (VERDICT r3 item 8)
    engine_reason = None
    if use_pallas in ("auto", None, True):
        from ..ops.fused_epoch import fused_exactness_check, supports_fused_epoch
        from ..ops.fused_multisite import supports_fused_multisite

        forced = use_pallas is True
        is_multisite_fused = supports_fused_multisite(
            model, cfg.optimizer, logging_loss, train_tensors,
            shuffle=cfg.shuffle_each_epoch,
        )
        if not (forced or jax.default_backend() == "tpu"):
            engine_reason = (
                f"backend is {jax.default_backend()!r}, not tpu "
                "(use_pallas=True or EASYHYBRID_PALLAS=1 overrides)"
            )
        elif cfg.multi_device:
            engine_reason = "multi_device=True (fused kernel is single-chip)"
        elif not cfg.jit:
            engine_reason = "jit=False"
        elif cfg.opt_state is not None:
            engine_reason = (
                "prebuilt opt_state (the fused kernel carries its own)"
            )
        elif cfg.shuffle_each_epoch not in (True, False, "batches"):
            engine_reason = (
                f"shuffle_each_epoch={cfg.shuffle_each_epoch!r} outside the "
                "fused envelope"
            )
        elif not (
            supports_fused_epoch(
                model, cfg.optimizer, logging_loss, train_tensors
            )
            or is_multisite_fused
        ):
            if supports_fused_multisite(
                model, cfg.optimizer, logging_loss, train_tensors,
                shuffle=False,
            ):
                # only the shuffle MODE disqualified the multisite kernel
                # (round 5 fused True/False/"batches"; an exotic mode like
                # "per_shard" still falls back): name the flag
                engine_reason = (
                    "minibatched multisite with shuffle_each_epoch="
                    f"{cfg.shuffle_each_epoch!r}: the fused multisite "
                    "kernel supports shuffle_each_epoch in "
                    "(True, False, 'batches')"
                )
            else:
                engine_reason = (
                    "model/optimizer/loss outside the fused-kernel envelope "
                    "(supports_fused_epoch)"
                )
        candidate = engine_reason is None
        if candidate:
            ok, gdiff = fused_exactness_check(
                model, params, state, cfg.optimizer, logging_loss,
                train_tensors, epochs_per_call=eval_every,
                shuffle=cfg.shuffle_each_epoch,
            )
            if ok:
                use_pallas = True
                engine_reason = (
                    f"exactness gate passed (max grad diff {gdiff:.2e})"
                )
                log.info(
                    "fused Pallas epoch kernel enabled (exactness gate: "
                    "max grad diff %.2e)", gdiff,
                )
            else:
                engine_reason = (
                    f"runtime exactness gate FAILED (max grad diff {gdiff:.2e})"
                )
                if forced:
                    log.warning(
                        "use_pallas was requested but the runtime exactness "
                        "gate FAILED (max grad diff %.2e) — falling back to "
                        "the XLA scan epoch to avoid silently wrong "
                        "training", gdiff,
                    )
                use_pallas = False
        else:
            if forced:
                log.warning(
                    "use_pallas=True but this configuration is outside the "
                    "fused kernel envelope — using the XLA scan epoch"
                )
            use_pallas = False
    else:
        engine_reason = (
            "use_pallas disabled (use_pallas=False or EASYHYBRID_PALLAS=0)"
        )

    def build_fused_epoch():
        from ..ops.fused_epoch import _fused_builder, init_fused_opt_state

        opt_state = init_fused_opt_state(params, cfg.optimizer)
        fused_fn = _fused_builder(model)(
            model,
            state,
            cfg.optimizer,
            logging_loss,
            shuffle=cfg.shuffle_each_epoch,
            epochs_per_call=eval_every,
        )
        return fused_fn, opt_state

    def build_xla_epoch():
        nonlocal params, state
        optimizer = resolve_optimizer(cfg.optimizer, params)
        if _flatten_safe(cfg.optimizer, params):
            # one flat update vector per step instead of ~2 ops per pytree
            # leaf — measurably faster for small hybrid models on TPU;
            # incompatible with per-branch label trees (dict specs) and a
            # measured LOSS above _FLATTEN_MAX_PARAMS (ravel traffic).
            import optax

            optimizer = optax.flatten(optimizer)
        opt_state = (
            cfg.opt_state if cfg.opt_state is not None else optimizer.init(params)
        )
        if mesh is not None:
            from ..parallel.mesh import replicate

            params = replicate(params, mesh)
            state = replicate(state, mesh)
            opt_state = replicate(opt_state, mesh)

        shuffle = cfg.shuffle_each_epoch
        if mesh is not None and shuffle is True:
            # a global permutation over the sharded sample axis is an
            # all-to-all over ICI every epoch; default to the collective-free
            # shard-local shuffle under multi_device (same in-shard quality)
            shuffle = "per_shard"
            log.info("multi_device: using shard-local shuffle (per_shard)")

        epoch_fn = make_train_epoch(
            model,
            logging_loss,
            optimizer,
            shuffle=shuffle,
            jit=cfg.jit,
            epochs_per_call=eval_every,
            skip_empty_guard=skip_empty_guard,
            remat=cfg.remat,
            mesh=mesh,
        )
        return epoch_fn, opt_state

    if use_pallas:
        epoch_fn, opt_state = build_fused_epoch()
        epoch_path = (
            "fused_pallas_multisite" if is_multisite_fused else "fused_pallas"
        )
    else:
        epoch_fn, opt_state = build_xla_epoch()
        epoch_path = "xla_scan"
    want_outputs = bool(cfg.keep_history or cfg.plotting or cfg.monitor_names)
    # ONE compiled eval program for both splits, with outputs; outputs stay
    # on device unless a snapshot actually wants them, and the final
    # prediction pass reuses the same executable (no extra compile)
    evaluator = make_dual_evaluator(model, logging_loss, jit=cfg.jit)

    def snapshot_dispatch(params, state):
        """Enqueue the eval program and start the device→host copies —
        non-blocking, so the next epoch can be dispatched while the metric
        scalars travel back."""
        (m_tr, out_tr), (m_va, out_va) = evaluator(
            params, state, train_eval_batch, val_eval_batch
        )
        _start_fetch((m_tr, m_va))
        if want_outputs:
            _start_fetch((out_tr, out_va))
        return m_tr, out_tr, m_va, out_va

    def snapshot_collect(dispatched) -> EpochSnapshot:
        m_tr, out_tr, m_va, out_va = dispatched
        if want_outputs:
            return EpochSnapshot(
                _host_metrics(m_tr),
                _host_metrics(m_va),
                _outputs_to_host(out_tr, train_data.n_samples),
                _outputs_to_host(out_va, val_data.n_samples),
            )
        return EpochSnapshot(_host_metrics(m_tr), _host_metrics(m_va))

    def snapshot_of(params, state) -> EpochSnapshot:
        return snapshot_collect(snapshot_dispatch(params, state))

    def monitored_quantiles(snapshot) -> Dict[str, Dict[str, float]]:
        """q25/q50/q75 of monitored per-sample physical parameters from the
        val predictions (parity: the reference dashboard's monitored-param
        quantile trajectories, plotrecipes.jl:51-134)."""
        out = {}
        if not cfg.monitor_names or snapshot.y_hat_val is None:
            return out
        params_out = snapshot.y_hat_val.get("parameters", {})
        for name in cfg.monitor_names:
            if name in params_out:
                arr = np.asarray(params_out[name]).ravel()
                if arr.size >= 1:
                    q25, q50, q75 = np.nanpercentile(arr, [25, 50, 75])
                    out[name] = {"q25": float(q25), "q50": float(q50), "q75": float(q75)}
        return out

    def tracked_values(params, state):
        """Physical values of tracked parameters (globals scaled into their
        bounds; fixed read from state)."""
        out = {}
        pc = getattr(model, "parameters", None)
        for name in cfg.tracked_params or ():
            if name in params.get("globals", {}):
                from ..params import scale_param

                lo, up = pc.lower_of(name), pc.upper_of(name)
                v = scale_param(params["globals"][name], lo, up)
                out[name] = float(np.asarray(jax.device_get(v)).ravel()[0])
            elif name in state.get("fixed", {}):
                out[name] = float(np.asarray(jax.device_get(state["fixed"][name]))[0])
            elif name in params:  # legacy models: raw scalar params
                out[name] = float(np.asarray(jax.device_get(params[name])).ravel()[0])
        return out

    grad_probe = (
        _make_grad_probe(model, logging_loss, jit=cfg.jit)
        if cfg.return_gradients
        else None
    )

    def _make_tracked_fn():
        """Device-side tracked-parameter extraction (no readback): returns a
        jitted fn params,state -> {name: 0-d array} or None."""
        names = tuple(cfg.tracked_params or ())
        if not names:
            return None
        pc = getattr(model, "parameters", None)
        from ..params import scale_param

        def fn(p, s):
            out = {}
            for name in names:
                if name in p.get("globals", {}):
                    lo, up = pc.lower_of(name), pc.upper_of(name)
                    out[name] = scale_param(p["globals"][name], lo, up).ravel()[0]
                elif name in s.get("fixed", {}):
                    out[name] = jnp.asarray(s["fixed"][name]).ravel()[0]
                elif name in p:  # legacy models: raw scalar params
                    out[name] = jnp.asarray(p[name]).ravel()[0]
            return out

        return jax.jit(fn)

    from .deferred import defer_blockers, run_deferred_loop

    paths = writer = stream = live = None
    monitored: Dict[str, list] = {}
    grad_history: list = []
    blockers = defer_blockers(
        cfg, n_samples=train_data.n_samples + val_data.n_samples
    )
    deferred = not blockers
    loop_reason = (
        "zero-readback" if deferred
        else "eager loop forced by " + ", ".join(blockers)
    )
    engine_reason = f"{epoch_path}: {engine_reason}; {loop_reason}"
    if deferred:
        log.info("epoch engine: %s (deferred loop)", epoch_path)
    else:
        # one user-visible line naming the disqualifying flags: the eager
        # loop pays the ~25x readback dispatch regime on the target rig
        log.info(
            "epoch engine: %s (eager loop — %s need mid-run host values; "
            "unset for the zero-readback fast path)",
            epoch_path, ", ".join(blockers),
        )
    if deferred:
        # zero-readback dispatch with on-device early stopping: any
        # device->host readback permanently degrades this deployment's async
        # dispatch ~25x (docs/tpu_notes.md), so when nothing needs mid-run
        # values the whole run goes out without a single fetch. Monitored
        # quantiles + grad norms ride the on-device history row;
        # save_training files are written post-hoc from the fetch.
        if cfg.save_training and cfg.checkpoint_every > 1:
            log.warning(
                "deferred loop: checkpoint_every=%d mid-run checkpoints are "
                "not written (the run is one program; only initial/best/"
                "final files are produced). Set show_progress=True or "
                "plotting=True to force the eager per-epoch loop if you "
                "need them.", cfg.checkpoint_every,
            )
        # initial params/state for the post-hoc save_initial: DEVICE copy
        # now (params are donated into the run program), host fetch only
        # after the run's own final fetch — a device_get here would be a
        # pre-dispatch readback, exactly what this loop exists to avoid
        init_dev = (
            jax.jit(lambda t: jax.tree.map(jnp.copy, t))((params, state))
            if cfg.save_training
            else None
        )
        (
            params, opt_state, state, history, stopper, tracked, monitored,
            grad_history,
        ) = run_deferred_loop(
            cfg=cfg,
            model=model,
            params=params,
            opt_state=opt_state,
            state=state,
            epoch_fn=epoch_fn,
            evaluator=evaluator,
            train_tensors=train_tensors,
            train_eval_batch=train_eval_batch,
            val_eval_batch=val_eval_batch,
            key=key,
            eval_every=eval_every,
            tracked_fn=_make_tracked_fn(),
            grad_probe=grad_probe,
            n_val_samples=val_data.n_samples,
            n_train_samples=train_data.n_samples,
        )
        if cfg.save_training:
            from ..io.checkpoint import CheckpointWriter, resolve_paths
            from ..plotting.live import MetricStream

            paths = resolve_paths(cfg)
            writer = CheckpointWriter(paths, model, cfg, dcfg)
            writer.save_initial(*jax.device_get(init_dev))
            stream = MetricStream(paths.metrics_jsonl)
            stream.write_meta(epoch_path=epoch_path, loop_mode="deferred")
            for i, snap in enumerate(history.snapshots):
                stream.write(
                    i * eval_every,
                    snap,
                    {k: v[i] for k, v in tracked.items() if i < len(v)},
                    {k: v[i] for k, v in monitored.items() if i < len(v)},
                )
            # best-epoch checkpoint; per-checkpoint_every MID-RUN files are
            # not reconstructable from a single-program run (a mid-run crash
            # loses the one program either way — see deferred.py docstring)
            best_i = stopper.best_epoch // eval_every
            if 0 <= best_i < len(history.snapshots):
                writer.save_epoch(
                    stopper.best_params, stopper.best_state,
                    history.snapshots[best_i], stopper.best_epoch,
                )
    else:
        # ---- initial snapshot / history / stopper / io ----
        init_snapshot = snapshot_of(params, state)
        if grad_probe is not None:
            grad_history.append(_grad_norms(grad_probe(params, state, train_eval_batch)))
        stored_init = (
            init_snapshot
            if cfg.keep_history
            else EpochSnapshot(init_snapshot.l_train, init_snapshot.l_val)
        )
        history = TrainingHistory([stored_init])
        stopper = EarlyStopping(init_snapshot, params, state, cfg)
        tracked: Dict[str, list] = {}
        for k, v in tracked_values(params, state).items():
            tracked[k] = [v]
        monitored: Dict[str, list] = {}
        for k, v in monitored_quantiles(init_snapshot).items():
            monitored[k] = [v]

        paths = None
        if cfg.save_training:
            from ..io.checkpoint import CheckpointWriter, resolve_paths

            paths = resolve_paths(cfg)
            writer = CheckpointWriter(paths, model, cfg, dcfg)
            writer.save_initial(params, state)
        else:
            writer = None

        # live observability: JSONL metric stream + live board + movie recorded
        # during training (parity: dashboard.jl:1-87, EasyHybridMakie.jl:252-478)
        stream = None
        live = None
        if cfg.save_training or cfg.plotting:
            from ..plotting.live import MetricStream

            stream_path = (
                paths.metrics_jsonl
                if paths is not None
                else f"{cfg.model_name}_metrics.jsonl"
            )
            stream = MetricStream(stream_path)
            stream.write_meta(epoch_path=epoch_path, loop_mode="eager")
            stream.write(
                0,
                init_snapshot,
                tracked_values(params, state),
                monitored_quantiles(init_snapshot),
            )
        if cfg.plotting:
            try:
                from ..plotting.live import LiveDashboard

                live = LiveDashboard(
                    model.targets,
                    {k: np.asarray(v) for k, v in val_data.y.items()},
                    metric=stopper.metric,
                    agg=stopper.agg_name,
                    yscale=cfg.yscale,
                )
                live.update(
                    0,
                    init_snapshot,
                    tracked_values(params, state),
                    monitored_quantiles(init_snapshot),
                )
            except Exception as e:
                log.warning("live dashboard unavailable: %s", e)
                live = None

        t0 = time.perf_counter()

        def process_epoch(epoch: int, snapshot: EpochSnapshot, params, state):
            """Host-side bookkeeping for an evaluated epoch. ``params``/``state``
            must be the live values AT that epoch (run this BEFORE they are
            donated into the next epoch's program)."""
            stopper.update(history, snapshot, params, state, epoch, cfg.keep_history)
            if grad_probe is not None:
                grad_history.append(_grad_norms(grad_probe(params, state, train_eval_batch)))
            tracked_now = tracked_values(params, state)
            monitored_now = monitored_quantiles(snapshot)
            for k, v in tracked_now.items():
                tracked.setdefault(k, []).append(v)
            for k, v in monitored_now.items():
                monitored.setdefault(k, []).append(v)
            if stream is not None:
                stream.write(epoch, snapshot, tracked_now, monitored_now)
            if live is not None:
                live.update(epoch, snapshot, tracked_now, monitored_now)
            # the loop only visits multiples of eval_every; fire whenever a
            # checkpoint_every boundary was crossed since the last visit (so
            # e.g. eval_every=10, checkpoint_every=25 still checkpoints ~every 25)
            if writer is not None and (
                epoch % max(cfg.checkpoint_every, eval_every) < eval_every
            ):
                writer.save_epoch(params, state, snapshot, epoch)
            if cfg.show_progress and (
                epoch == eval_every
                or epoch + eval_every > cfg.nepochs
                or epoch % max(1, cfg.nepochs // 10) == 0
            ):
                agg = stopper.agg_name
                metric = stopper.metric
                tr = snapshot.l_train.get(metric, {}).get(agg, float("nan"))
                va = snapshot.l_val.get(metric, {}).get(agg, float("nan"))
                log.info(
                    "epoch %4d/%d  train %s(%s)=%.6g  val=%.6g  best=%.6g@%d  "
                    "(%.1fs)",
                    epoch,
                    cfg.nepochs,
                    metric,
                    agg,
                    tr,
                    va,
                    stopper.best_loss,
                    stopper.best_epoch,
                    time.perf_counter() - t0,
                )

        # one-step-lagged pipeline: epoch N's metric fetch overlaps epoch N+1's
        # dispatch/compute on device. Processing epoch N happens at the TOP of
        # iteration N+1 — before params are donated into epoch N+1's program, so
        # best-model copies read live buffers — and the early-stop decision still
        # gates epoch N+1's dispatch (the same epochs run as in the eager loop).
        pending = None  # (epoch index, dispatched snapshot)
        for epoch in range(eval_every, cfg.nepochs + 1, eval_every):
            if pending is not None:
                p_epoch, dispatched = pending
                pending = None
                process_epoch(p_epoch, snapshot_collect(dispatched), params, state)
                if stopper.done:
                    break
            key, shuffle_key = jax.random.split(key)
            params, opt_state, state, mean_loss = epoch_fn(
                params, opt_state, state, train_tensors, shuffle_key
            )
            pending = (epoch, snapshot_dispatch(params, state))
        if pending is not None:
            p_epoch, dispatched = pending
            process_epoch(p_epoch, snapshot_collect(dispatched), params, state)

        if cfg.show_progress and len(history) > 1:
            from .show import progress_table

            log.info(
                "final metrics:\n%s", progress_table(history[0], history[-1])
            )

    best_params, best_state = stopper.best_or_final(params, state, cfg.return_model)
    best_params = jax.tree.map(jnp.asarray, best_params)
    best_state = jax.tree.map(jnp.asarray, best_state)

    # ---- final predictions + results (reuses the compiled evaluator) ----
    (_, out_tr), (_, out_va) = evaluator(
        best_params, best_state, train_eval_batch, val_eval_batch
    )
    out_tr = _outputs_to_host(out_tr, train_data.n_samples)
    out_va = _outputs_to_host(out_va, val_data.n_samples)

    targets = tuple(model.targets)
    train_obs, train_pred = _obs_pred_frames(train_data, out_tr, targets)
    val_obs, val_pred = _obs_pred_frames(val_data, out_va, targets)

    results = TrainResults(
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
        paths=paths,
        tracked=tracked or None,
        monitored=monitored or None,
        opt_state=jax.device_get(opt_state),
        grad_history=grad_history or None,
        final_grads=(
            jax.device_get(grad_probe(best_params, best_state, train_eval_batch))
            if grad_probe is not None
            else None
        ),
        epoch_path=epoch_path,
        loop_mode="deferred" if deferred else "eager",
        engine_reason=engine_reason,
    )

    if writer is not None:
        writer.save_final(results)
    if stream is not None:
        stream.close()
        results = dataclasses.replace(results, metrics_stream=stream.path)
    if live is not None:
        movie_path = (
            paths.history_mp4
            if paths is not None
            else f"{cfg.model_name}_train.mp4"
        )
        try:
            written = live.finish(movie_path=movie_path)
            if written:
                log.info("saved in-training movie to %s", written)
        except Exception as e:
            log.warning("movie recording failed: %s", e)
    if cfg.plotting:
        try:
            from ..plotting.plots import train_board

            board_path = (
                paths.history_png
                if paths is not None
                else f"{cfg.model_name}_train_board.png"
            )
            train_board(results, save=board_path, yscale=cfg.yscale)
            log.info("saved training board to %s", board_path)
        except Exception as e:
            log.warning("plotting failed: %s", e)
    return results
