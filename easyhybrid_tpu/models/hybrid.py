"""Generic hybrid models: neural network(s) composed with a mechanistic model.

TPU-native re-design of the reference's GenericHybridModel
(reference: src/models/GenericHybridModel.jl — structs :44-86, constructors
:89-232, Lux init :236-327, forward passes :370-431 and :458-530).

The hybrid model is the fusion unit: ``apply(params, state, (x, forcing))``
traces NN forward + bound scaling + the user's mechanistic function into one
XLA program, so on TPU the physics fuses into the epilogue of the last matmul
(no kernel-boundary between "NN" and "process model"). Models are frozen
dataclasses (hashable statics); parameters/state are plain dict pytrees:

    params = {"nn": ..., "globals": {name: (1,) f32}}        # SingleNN
    params = {"nns": {branch: ...}, "globals": {...}}        # MultiNN
    state  = {"nn": ..., "fixed": {name: (1,) f32}}          # (+"nns" multi)
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (
    ParameterContainer,
    build_parameters,
    scale_param,
    unscale_param,
)
from .nn import Module, construct_nn

__all__ = [
    "AbstractHybridModel",
    "SingleNNHybridModel",
    "MultiNNHybridModel",
    "construct_hybrid_model",
]

Array = jax.Array


def _as_tuple(xs) -> Tuple[str, ...]:
    if xs is None:
        return ()
    if isinstance(xs, str):
        return (xs,)
    return tuple(str(x) for x in xs)


def _call_mechanistic(fn: Callable, kwargs: Dict[str, Any]) -> Dict[str, Array]:
    """Call the user's mechanistic function with the merged forcing+parameter
    kwargs, passing only what its signature accepts (unless it takes **kw).

    The reference calls ``mechanistic_model(; all_kwargs...)``
    (GenericHybridModel.jl:425); here we filter by signature so users can
    write functions of just the names they need.
    """
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        sig = None
    if sig is not None:
        has_var_kw = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
        )
        if not has_var_kw:
            accepted = {
                name
                for name, p in sig.parameters.items()
                if p.kind
                in (
                    inspect.Parameter.POSITIONAL_OR_KEYWORD,
                    inspect.Parameter.KEYWORD_ONLY,
                )
            }
            missing = [
                name
                for name, p in sig.parameters.items()
                if p.default is inspect.Parameter.empty
                and p.kind
                in (
                    inspect.Parameter.POSITIONAL_OR_KEYWORD,
                    inspect.Parameter.KEYWORD_ONLY,
                )
                and name not in kwargs
            ]
            if missing:
                raise KeyError(
                    f"mechanistic model {getattr(fn, '__name__', fn)!r} requires "
                    f"{missing} but only {sorted(kwargs)} are available "
                    "(forcing + parameters)"
                )
            kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    out = fn(**kwargs)
    return _normalize_outputs(out)


def _normalize_outputs(out) -> Dict[str, Array]:
    if isinstance(out, Mapping):
        return dict(out)
    if hasattr(out, "_asdict"):  # NamedTuple
        return dict(out._asdict())
    raise TypeError(
        "mechanistic model must return a dict (or NamedTuple) of named "
        f"outputs; got {type(out).__name__}"
    )


def _freeze_config(cfg: Mapping[str, Any]) -> Tuple[Tuple[str, Any], ...]:
    def freeze(v):
        if isinstance(v, (list, tuple)):
            return tuple(freeze(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x)) for k, x in v.items()))
        return v

    return tuple(sorted((k, freeze(v)) for k, v in cfg.items()))


class AbstractHybridModel:
    """Common behavior for hybrid models (init of globals/fixed, scaling)."""

    parameters: ParameterContainer
    neural_param_names: Tuple[str, ...]
    global_param_names: Tuple[str, ...]
    fixed_param_names: Tuple[str, ...]
    targets: Tuple[str, ...]
    forcing: Tuple[str, ...]
    scale_nn_outputs: bool
    start_from_default: bool

    # -- init helpers -------------------------------------------------------
    def _init_globals(self, key: Array) -> Dict[str, Array]:
        """Raw (unconstrained) trainable globals, seeded at the inverse-
        sigmoid of the table default, or uniform random in (0,1).

        Parity: LuxCore.initialparameters (GenericHybridModel.jl:240-253).
        """
        globals_ = {}
        if not self.global_param_names:
            return globals_
        keys = jax.random.split(key, len(self.global_param_names))
        for g, k in zip(self.global_param_names, keys):
            if self.start_from_default:
                lo = self.parameters.lower_of(g)
                up = self.parameters.upper_of(g)
                d = self.parameters.default_of(g)
                # host-side math: bounds/defaults are python floats, so no
                # device op (and `init` stays jit-traceable — train() runs
                # the whole init as ONE program instead of op-by-op eager
                # dispatches, which dominate cold start on a remote TPU)
                raw = unscale_param(d, lo, up)
            else:
                raw = jax.random.uniform(k, (), jnp.float32)
            globals_[g] = jnp.full((1,), raw, jnp.float32)
        return globals_

    def _init_fixed(self) -> Dict[str, Array]:
        """Fixed params live in (non-trainable) state at their defaults.

        Parity: LuxCore.initialstates (GenericHybridModel.jl:293-299).
        """
        return {
            f: jnp.full((1,), self.parameters.default_of(f), jnp.float32)
            for f in self.fixed_param_names
        }

    def _scale_globals(self, globals_: Dict[str, Array]) -> Dict[str, Array]:
        out = {}
        for g in self.global_param_names:
            lo = self.parameters.lower_of(g)
            up = self.parameters.upper_of(g)
            out[g] = scale_param(globals_[g], lo, up)
        return out

    def _split_nn_outputs(
        self, nn_out: Array, names: Sequence[str]
    ) -> Dict[str, Array]:
        """Slice NN output columns into named per-sample parameters and
        optionally sigmoid-scale them into their physical bounds.

        Output layout is feature-minor: column i of ``(..., P)`` is parameter
        ``names[i]`` — static slices, XLA fuses them away.
        Parity: GenericHybridModel.jl:389-402.
        """
        out = {}
        for i, name in enumerate(names):
            col = nn_out[..., i]
            if self.scale_nn_outputs:
                lo = self.parameters.lower_of(name)
                up = self.parameters.upper_of(name)
                col = scale_param(col, lo, up)
            out[name] = col
        return out

    def _forcing_dict(self, forcing_data) -> Dict[str, Array]:
        if isinstance(forcing_data, Mapping):
            return dict(forcing_data)
        if forcing_data is None:
            return {}
        raise TypeError(
            f"forcing must be a dict name->array; got {type(forcing_data).__name__}"
        )

    # -- inference convenience -----------------------------------------------
    def predict_df(self, params, state, df):
        """Test-mode inference on a DataFrame: returns a copy with
        ``<output>_pred`` columns appended for every per-sample output.

        Parity: the reference's DataFrame forward
        (GenericHybridModel.jl:433-455) — missing→NaN coercion, no row
        dropping, columns appended only for batch-length outputs.
        """
        from ..data.prepare import prepare_data

        data = prepare_data(self, df, drop_missing_rows=False)
        outputs, _ = self.apply(params, state, (data.x, data.forcing))
        n = data.n_samples
        out_df = df.copy()
        for k, v in outputs.items():
            if isinstance(v, Mapping):
                continue  # parameters / nn_outputs handled below
            arr = np.asarray(v)
            if arr.ndim == 1 and arr.shape[0] == n:
                out_df[f"{k}_pred"] = arr
        for k, v in outputs.get("parameters", {}).items():
            arr = np.asarray(v)
            if arr.ndim == 1 and arr.shape[0] == n:
                out_df[f"{k}_pred"] = arr
        return out_df


@dataclasses.dataclass(frozen=True, eq=False)
class SingleNNHybridModel(AbstractHybridModel):
    """One NN predicting several physical parameters + global/fixed params
    feeding a mechanistic model.

    Parity: reference SingleNNHybridModel (GenericHybridModel.jl:44-63) and
    its forward pass (:370-431).
    """

    nn: Optional[Module]
    predictors: Tuple[str, ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...]
    mechanistic_model: Callable
    parameters: ParameterContainer
    neural_param_names: Tuple[str, ...]
    global_param_names: Tuple[str, ...]
    fixed_param_names: Tuple[str, ...]
    scale_nn_outputs: bool = False
    start_from_default: bool = True
    config: Tuple[Tuple[str, Any], ...] = ()

    def init(self, key: Array):
        k_nn, k_glob = jax.random.split(key)
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        if self.nn is not None:
            nn_params, nn_state = self.nn.init(k_nn)
            params["nn"] = nn_params
            state["nn"] = nn_state
        params["globals"] = self._init_globals(k_glob)
        state["fixed"] = self._init_fixed()
        return params, state

    def apply(self, params, state, batch, *, training: bool = False):
        """Fused hybrid forward. ``batch`` is ``(x, forcing_dict)`` with
        ``x`` of shape (N, F) (or (N, T, F) for sequence models).

        Returns ``(outputs, new_state)`` with
        ``outputs = {**mechanistic_outputs, "parameters": all_params}``.
        """
        x, forcing_data = batch[0], batch[1]
        new_state = dict(state)

        global_params = self._scale_globals(params["globals"])

        if self.nn is not None and self.neural_param_names:
            nn_out, nn_state = self.nn.apply(
                params["nn"], state.get("nn", {}), x, training=training
            )
            new_state["nn"] = nn_state
            nn_params = self._split_nn_outputs(nn_out, self.neural_param_names)
        else:
            nn_params = {}

        fixed_params = {f: state["fixed"][f] for f in self.fixed_param_names}

        all_params = {**nn_params, **global_params, **fixed_params}
        all_kwargs = {**self._forcing_dict(forcing_data), **all_params}

        y_pred = _call_mechanistic(self.mechanistic_model, all_kwargs)
        out = {**y_pred, "parameters": all_params}
        return out, new_state


@dataclasses.dataclass(frozen=True, eq=False)
class MultiNNHybridModel(AbstractHybridModel):
    """One NN per neural parameter, each with its own predictor set.

    ``predictors`` is ``((branch_name, (pred, ...)), ...)``; branch order
    defines the neural-parameter order, mirroring the reference's NamedTuple
    predictors form (GenericHybridModel.jl:66-86, :142-206, forward :458-530).
    """

    nns: Tuple[Tuple[str, Module], ...]
    predictors: Tuple[Tuple[str, Tuple[str, ...]], ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...]
    mechanistic_model: Callable
    parameters: ParameterContainer
    neural_param_names: Tuple[str, ...]
    global_param_names: Tuple[str, ...]
    fixed_param_names: Tuple[str, ...]
    scale_nn_outputs: bool = False
    start_from_default: bool = True
    config: Tuple[Tuple[str, Any], ...] = ()

    @property
    def nn_dict(self) -> Dict[str, Module]:
        return dict(self.nns)

    @property
    def predictor_dict(self) -> Dict[str, Tuple[str, ...]]:
        return dict(self.predictors)

    def init(self, key: Array):
        k_glob, *nn_keys = jax.random.split(key, len(self.nns) + 1)
        params: Dict[str, Any] = {"nns": {}}
        state: Dict[str, Any] = {"nns": {}}
        for (name, nn), k in zip(self.nns, nn_keys):
            nn_params, nn_state = nn.init(k)
            params["nns"][name] = nn_params
            state["nns"][name] = nn_state
        params["globals"] = self._init_globals(k_glob)
        state["fixed"] = self._init_fixed()
        return params, state

    def apply(self, params, state, batch, *, training: bool = False):
        """``batch`` is ``(x_branches, forcing_dict)`` with ``x_branches`` a
        dict branch_name -> (N, F_b) (or (N, T, F_b))."""
        x_branches, forcing_data = batch[0], batch[1]
        new_state = dict(state)
        new_state["nns"] = dict(state.get("nns", {}))

        global_params = self._scale_globals(params["globals"])

        nn_outputs: Dict[str, Array] = {}
        for name, nn in self.nns:
            nn_out, nn_state = nn.apply(
                params["nns"][name],
                state.get("nns", {}).get(name, {}),
                x_branches[name],
                training=training,
            )
            nn_outputs[name] = nn_out
            new_state["nns"][name] = nn_state

        # branch i ↦ neural_param_names[i]; each branch predicts one parameter
        # (out_dim=1), mirroring GenericHybridModel.jl:483-505.
        nn_params: Dict[str, Array] = {}
        for (branch, _), pname in zip(self.nns, self.neural_param_names):
            col = nn_outputs[branch][..., 0]
            if self.scale_nn_outputs:
                lo = self.parameters.lower_of(pname)
                up = self.parameters.upper_of(pname)
                col = scale_param(col, lo, up)
            nn_params[pname] = col

        fixed_params = {f: state["fixed"][f] for f in self.fixed_param_names}
        all_params = {**nn_params, **global_params, **fixed_params}
        all_kwargs = {**self._forcing_dict(forcing_data), **all_params}

        y_pred = _call_mechanistic(self.mechanistic_model, all_kwargs)
        out = {**y_pred, "parameters": all_params, "nn_outputs": nn_outputs}
        return out, new_state


# --------------------------------------------------------------------------
# unified constructor
# --------------------------------------------------------------------------

def construct_hybrid_model(
    predictors: Union[Sequence[str], Mapping[str, Sequence[str]]] = (),
    forcing: Sequence[str] = (),
    targets: Sequence[str] = (),
    mechanistic_model: Callable = None,
    parameters: Union[ParameterContainer, Mapping[str, Any]] = None,
    neural_param_names: Optional[Sequence[str]] = None,
    global_param_names: Sequence[str] = (),
    *,
    hidden_layers: Any = (32, 32),
    activation: Any = "tanh",
    scale_nn_outputs: bool = False,
    input_batchnorm: bool = False,
    start_from_default: bool = True,
    compute_dtype: Any = None,
    **kwargs,
) -> Union[SingleNNHybridModel, MultiNNHybridModel]:
    """Build a hybrid model; dispatches on the type of ``predictors``.

    * list/tuple of names → :class:`SingleNNHybridModel` (one NN with
      ``len(neural_param_names)`` outputs) — parity with
      GenericHybridModel.jl:89-140.
    * mapping ``{param_name: [predictor, ...]}`` → :class:`MultiNNHybridModel`
      (one single-output NN per entry; the keys become the neural parameter
      names) — parity with GenericHybridModel.jl:142-206.
    """
    if mechanistic_model is None:
        raise ValueError("mechanistic_model is required")
    parameters = build_parameters(parameters, mechanistic_model)
    all_names = parameters.names

    config = _freeze_config(
        dict(
            hidden_layers=hidden_layers,
            activation=activation,
            scale_nn_outputs=scale_nn_outputs,
            input_batchnorm=input_batchnorm,
            start_from_default=start_from_default,
            compute_dtype=compute_dtype,
            **kwargs,
        )
    )

    global_param_names = _as_tuple(global_param_names)
    for g in global_param_names:
        if g not in all_names:
            raise ValueError(f"global parameter {g!r} not in parameter table")

    if isinstance(predictors, Mapping):
        # ---- MultiNN ----
        neural_param_names = tuple(predictors.keys())
        for n in neural_param_names:
            if n not in all_names:
                raise ValueError(f"neural parameter {n!r} not in parameter table")
        nns = []
        preds_frozen = []
        # a Mapping hidden_layers is per-branch sizes when its keys are the
        # branch names; otherwise it is one shared spec dict for every
        # branch (e.g. {'lstm': n}) — indexing by branch would KeyError
        per_branch_hl = isinstance(hidden_layers, Mapping) and set(
            predictors
        ) <= set(hidden_layers)
        for nn_name, preds in predictors.items():
            preds = _as_tuple(preds)
            preds_frozen.append((nn_name, preds))
            hl = hidden_layers[nn_name] if per_branch_hl else hidden_layers
            act = (
                activation[nn_name] if isinstance(activation, Mapping) else activation
            )
            nns.append(
                (
                    nn_name,
                    construct_nn(
                        hl,
                        len(preds),
                        1,
                        activation=act,
                        input_batchnorm=input_batchnorm,
                        compute_dtype=compute_dtype,
                    ),
                )
            )
        fixed = tuple(
            n
            for n in all_names
            if n not in neural_param_names and n not in global_param_names
        )
        return MultiNNHybridModel(
            nns=tuple(nns),
            predictors=tuple(preds_frozen),
            forcing=_as_tuple(forcing),
            targets=_as_tuple(targets),
            mechanistic_model=mechanistic_model,
            parameters=parameters,
            neural_param_names=neural_param_names,
            global_param_names=global_param_names,
            fixed_param_names=fixed,
            scale_nn_outputs=scale_nn_outputs,
            start_from_default=start_from_default,
            config=config,
        )

    # ---- SingleNN ----
    predictors = _as_tuple(predictors)
    neural_param_names = _as_tuple(neural_param_names)
    for n in neural_param_names:
        if n not in all_names:
            raise ValueError(f"neural parameter {n!r} not in parameter table")
    if predictors and neural_param_names:
        nn = construct_nn(
            hidden_layers,
            len(predictors),
            len(neural_param_names),
            activation=activation,
            input_batchnorm=input_batchnorm,
            compute_dtype=compute_dtype,
        )
    else:
        nn = None
    fixed = tuple(
        n
        for n in all_names
        if n not in neural_param_names and n not in global_param_names
    )
    return SingleNNHybridModel(
        nn=nn,
        predictors=predictors,
        forcing=_as_tuple(forcing),
        targets=_as_tuple(targets),
        mechanistic_model=mechanistic_model,
        parameters=parameters,
        neural_param_names=neural_param_names,
        global_param_names=global_param_names,
        fixed_param_names=fixed,
        scale_nn_outputs=scale_nn_outputs,
        start_from_default=start_from_default,
        config=config,
    )
