"""Batched inference engine for serving.

The reference's inference story is the DataFrame forward
(GenericHybridModel.jl:433-455, covered by ``predict_df``). For production
serving on TPU this module adds what the reference lacks: a COMPILED
fixed-shape predictor — inputs are padded to a static batch size so every
call hits the same jitted program (no retraces), with optional chunking for
arbitrarily large inputs.
"""

from __future__ import annotations

import functools
import weakref
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prepare import prepare_data

__all__ = ["make_inference_fn", "predict", "ensemble_predict"]

# jitted forwards cached per MODEL via weak references: repeat calls reuse
# the compilation, but a model the caller drops releases its jitted
# program (an lru_cache would pin up to maxsize model objects + compiled
# executables for the process lifetime — e.g. a tune loop constructing a
# fresh model per trial)
_SINGLE_FORWARDS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_ENSEMBLE_FORWARDS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _flatten_outputs(outputs) -> Dict[str, Any]:
    """model.apply outputs → flat {name: (B, ...) array} dict (drops
    nested non-array entries), shared by the single and ensemble paths."""
    flat: Dict[str, Any] = {}
    for k, v in outputs.items():
        if isinstance(v, Mapping):
            for kk, vv in v.items():
                if not isinstance(vv, Mapping) and np.ndim(vv) >= 1:
                    flat[kk] = vv
        else:
            flat[k] = v
    return flat


def make_inference_fn(model, params, state, *, batch_size: int = 1024):
    """Build ``predict(data) -> dict of np.ndarray`` with a single compiled
    program of static shape ``(batch_size, ...)``.

    ``data`` may be a DataFrame, a dict of columns, or a
    :class:`HybridData`; inputs longer than ``batch_size`` are processed in
    chunks, shorter ones are padded (padding rows are dropped from the
    output). Rows with NaN predictors are kept (NaN propagates), matching
    ``predict_df`` semantics.
    """
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    fwd = _single_forward(model)

    def predict_fn(data) -> Dict[str, np.ndarray]:
        return _run_chunked(
            model, functools.partial(fwd, params, state), data, batch_size
        )

    return predict_fn


def _single_forward(model):
    """One jitted single-model forward per MODEL, parameters as explicit
    arguments: repeated ``make_inference_fn``/``predict`` calls (e.g. after
    each retrain) reuse the compilation instead of re-tracing with the new
    parameters baked in as program constants."""
    try:
        cached = _SINGLE_FORWARDS.get(model)
    except TypeError:  # unhashable/un-weakref-able custom model
        cached = None
    if cached is not None:
        return cached

    # closure holds a WEAK ref: a strong capture would make the cache
    # entry immortal (value → closure → key keeps the weak-key dict from
    # ever evicting). Every caller that can trigger a (re)trace holds the
    # model strongly (predict_fn closes over it; predict/ensemble_predict
    # take it as an argument), so the deref can't observe None mid-trace.
    model_ref = weakref.ref(model)

    @jax.jit
    def forward(params, state, x, forcing):
        outputs, _ = model_ref().apply(
            params, state, (x, forcing), training=False
        )
        return _flatten_outputs(outputs)

    try:
        _SINGLE_FORWARDS[model] = forward
    except TypeError:
        pass
    return forward


def predict(model, params, state, data, *, batch_size: int = 1024):
    """One-shot convenience wrapper around :func:`make_inference_fn`."""
    return make_inference_fn(model, params, state, batch_size=batch_size)(data)


def ensemble_predict(
    model,
    population,
    data,
    *,
    batch_size: int = 1024,
    best: bool = True,
) -> Dict[str, np.ndarray]:
    """Ensemble inference over a trained population: ONE vmapped compiled
    forward over all K members, returning per-output member MEAN plus the
    member SPREAD as ``<name>_std`` — predictive uncertainty from a seed
    (or hyperparameter) ensemble, which the reference has no analog for.

    ``population`` is a :class:`~easyhybrid_tpu.training.population.
    PopulationResults` (uses each member's best-epoch params with the
    final model state — identical for static input norms; for trainable
    BatchNorm the end-of-run EMA stands in for the best-epoch stats) or a
    ``(stacked_params, stacked_state)`` tuple with a leading member axis.
    """
    import jax.numpy as jnp

    if isinstance(population, tuple):
        stacked_params, stacked_state = population
    else:
        stacked_params = population.best_params if best else population.params
        stacked_state = population.state
    stacked_params = jax.tree.map(jnp.asarray, stacked_params)
    stacked_state = jax.tree.map(jnp.asarray, stacked_state)
    # one jitted program per MODEL, member parameters as explicit arguments
    # (a closure capture would embed all K members' parameters as program
    # constants and re-trace on every ensemble_predict call)
    fwd = _ensemble_forward(model)
    return _run_chunked(
        model, functools.partial(fwd, stacked_params, stacked_state),
        data, batch_size,
    )


def _ensemble_forward(model):
    """One jitted ensemble forward per MODEL: repeat ``ensemble_predict``
    calls reuse the compilation; compile time and program size no longer
    grow with the member count K (parameters ride as arguments)."""
    try:
        cached = _ENSEMBLE_FORWARDS.get(model)
    except TypeError:
        cached = None
    if cached is not None:
        return cached

    model_ref = weakref.ref(model)  # weak for the same reason as
    # _single_forward: a strong closure would pin the weak-key entry

    @jax.jit
    def forward(stacked_params, stacked_state, x, forcing):
        def one(p, s):
            out, _ = model_ref().apply(p, s, (x, forcing), training=False)
            return _flatten_outputs(out)

        outs = jax.vmap(one)(stacked_params, stacked_state)  # (K, B, ...)
        flat = {}
        for k, v in outs.items():
            flat[k] = jnp.mean(v, axis=0)
            flat[k + "_std"] = jnp.std(v, axis=0)
        return flat

    try:
        _ENSEMBLE_FORWARDS[model] = forward
    except TypeError:
        pass
    return forward


def _run_chunked(model, forward, data, batch_size: int) -> Dict[str, np.ndarray]:
    """Shared pad/chunk/fetch driver around a compiled ``forward``."""
    from ..data.loaders import pad_axis0

    hd = prepare_data(model, data, drop_missing_rows=False)
    n = hd.n_samples

    chunks: Dict[str, list] = {}
    for start in range(0, max(n, 1), batch_size):
        end = min(start + batch_size, n)
        take = end - start
        if isinstance(hd.x, Mapping):
            x = {
                k: pad_axis0(np.asarray(v)[start:end], batch_size)
                for k, v in hd.x.items()
            }
        else:
            x = pad_axis0(np.asarray(hd.x)[start:end], batch_size)
        forcing = {
            k: pad_axis0(np.asarray(v)[start:end], batch_size)
            for k, v in hd.forcing.items()
        }
        out = forward(x, forcing)
        for k, v in out.items():
            v = np.asarray(jax.device_get(v))
            if v.ndim >= 1 and v.shape[0] == batch_size:
                chunks.setdefault(k, []).append(v[:take])
    return {k: np.concatenate(vs) for k, vs in chunks.items()}
