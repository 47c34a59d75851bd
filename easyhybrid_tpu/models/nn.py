"""Minimal pytree neural-network modules, TPU-first.

Re-design of the reference's Lux-based NN constructors
(reference: src/models/NNModels.jl — ``prepare_hidden_chain`` :145-232,
``constructNNModel`` :241-290, ``RecurrenceOutputDense`` :48-77,
``InputBatchNorm`` :89-105, ``SingleNNModel``/``MultiNNModel`` :8-17/:262-376).

Why hand-rolled rather than flax: a hybrid model's NN is a *component of a
fused physics program*. Keeping modules as frozen dataclasses (static spec)
with ``init(key) -> (params, state)`` / ``apply(params, state, x)`` pure
functions means the whole hybrid forward — NN, bound-scaling, mechanistic
model — traces into ONE XLA computation with zero framework overhead, and the
same spec objects are hashable statics for ``jax.jit`` closures.

Layout conventions (TPU-first, row-major):
* feed-forward inputs are ``(batch, features)`` → ``x @ W`` hits the MXU with
  batch as the sublane dimension;
* sequence inputs are ``(batch, time, features)`` and recur via ``lax.scan``
  over time with batched matmuls per step.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "Activation",
    "Dense",
    "MLP",
    "LSTMNet",
    "BatchNormState",
    "construct_nn",
    "get_activation",
    "ACTIVATIONS",
]

Array = jax.Array


# --------------------------------------------------------------------------
# activations
# --------------------------------------------------------------------------

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "identity": lambda x: x,
    "linear": lambda x: x,
}


def get_activation(act: Union[str, Callable, None]) -> Callable:
    """Resolve an activation name or callable to a jnp-pure callable."""
    if act is None:
        return ACTIVATIONS["identity"]
    if callable(act):
        return act
    key = str(act).lower()
    if key not in ACTIVATIONS:
        raise ValueError(f"unknown activation {act!r}; known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[key]


def _norm_act(act: Union[str, Callable, None]):
    """Normalize an activation spec: lowercase known names, keep callables."""
    if act is None:
        return "identity"
    if isinstance(act, str):
        return act.lower()
    return act  # arbitrary callable: hashable by identity, resolved at apply


Activation = Union[str, Callable, None]


# --------------------------------------------------------------------------
# initializers (glorot uniform, matching Lux Dense defaults in spirit)
# --------------------------------------------------------------------------

def glorot_uniform(key: Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> Array:
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (fan_in, fan_out), dtype=dtype, minval=-limit, maxval=limit
    )


# --------------------------------------------------------------------------
# module protocol: frozen dataclass spec + pure init/apply
# --------------------------------------------------------------------------

class Module:
    """Spec protocol: ``init(key) -> (params, state)``;
    ``apply(params, state, x, training=False) -> (out, new_state)``."""

    in_dim: int
    out_dim: int

    def init(self, key: Array):  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, params, state, x, *, training: bool = False):  # pragma: no cover
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Dense(Module):
    """Affine layer ``act(x @ W + b)`` with ``(batch, feat)`` inputs.

    ``compute_dtype`` enables mixed precision: parameters stay float32 but
    the matmul runs in the compute dtype (bfloat16 doubles MXU throughput on
    TPU for large layers) with float32 accumulation.
    """

    in_dim: int
    out_dim: int
    activation: str = "identity"
    use_bias: bool = True
    dtype: Any = jnp.float32
    compute_dtype: Any = None

    def init(self, key: Array):
        w = glorot_uniform(key, self.in_dim, self.out_dim, self.dtype)
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_dim,), self.dtype)
        return params, {}

    def apply(self, params, state, x, *, training: bool = False):
        w = params["w"]
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            w = w.astype(self.compute_dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + params["b"]
        return get_activation(self.activation)(y), state


# --------------------------------------------------------------------------
# batch norm over the feature axis (input normalization)
# --------------------------------------------------------------------------

BatchNormState = dict  # {"mean": (F,), "var": (F,)}


@dataclasses.dataclass(frozen=True)
class BatchNorm(Module):
    """BatchNorm over features; handles (N, F) and (N, T, F) inputs.

    Reference parity: ``InputBatchNorm`` (NNModels.jl:89-105) which reshapes
    3-D sequences to 2-D and back; here a reduction-axis choice does the same
    with no data movement.

    ``frozen=True`` turns this into a static input standardization: stats are
    pre-fitted (see ``training.train.fit_input_norm``) and never updated —
    equivalent normalization with zero training-mode state traffic, and the
    form the Pallas fused-epoch kernel requires.
    """

    in_dim: int
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    frozen: bool = False

    @property
    def out_dim(self) -> int:
        return self.in_dim

    def init(self, key: Array):
        params = {}
        if self.affine:
            params = {
                "scale": jnp.ones((self.in_dim,), jnp.float32),
                "bias": jnp.zeros((self.in_dim,), jnp.float32),
            }
        state = {
            "mean": jnp.zeros((self.in_dim,), jnp.float32),
            "var": jnp.ones((self.in_dim,), jnp.float32),
        }
        return params, state

    def apply(self, params, state, x, *, training: bool = False):
        reduce_axes = tuple(range(x.ndim - 1))  # all but feature axis
        if training and not self.frozen:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.var(x, axis=reduce_axes)
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * var,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x - mean) * lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y, new_state


# --------------------------------------------------------------------------
# MLP
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLP(Module):
    """Feed-forward stack: optional input BatchNorm → hidden Dense(act) →
    output Dense(output_activation).

    Reference parity: ``prepare_hidden_chain`` (NNModels.jl:145-232) for the
    layer-size-vector form. Input ``(batch, in_dim)`` or ``(batch, time,
    in_dim)`` (the matmul broadcasts over leading axes, so sequences work
    transparently — one big MXU-friendly batched matmul per layer).
    """

    in_dim: int
    out_dim: int
    hidden: Tuple[int, ...] = (32, 32)
    activation: str = "tanh"
    output_activation: str = "identity"
    input_batchnorm: Any = False  # True | False | "static" (frozen stats)
    dtype: Any = jnp.float32
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU mixed precision

    def __post_init__(self):
        object.__setattr__(self, "hidden", tuple(int(h) for h in self.hidden))

    @property
    def layers(self) -> Tuple[Dense, ...]:
        dims = (self.in_dim,) + self.hidden + (self.out_dim,)
        acts = [self.activation] * len(self.hidden) + [self.output_activation]
        return tuple(
            Dense(
                dims[i],
                dims[i + 1],
                acts[i],
                dtype=self.dtype,
                compute_dtype=self.compute_dtype,
            )
            for i in range(len(dims) - 1)
        )

    @property
    def norm(self) -> Optional[BatchNorm]:
        if not self.input_batchnorm:
            return None
        return BatchNorm(self.in_dim, frozen=(self.input_batchnorm == "static"))

    def init(self, key: Array):
        layers = self.layers
        keys = jax.random.split(key, len(layers) + 1)
        params = {"layers": [l.init(k)[0] for l, k in zip(layers, keys[:-1])]}
        state = {}
        if self.input_batchnorm:
            bn_params, bn_state = self.norm.init(keys[-1])
            params["norm"] = bn_params
            state["norm"] = bn_state
        return params, state

    def apply(self, params, state, x, *, training: bool = False):
        new_state = state
        if self.input_batchnorm:
            x, norm_state = self.norm.apply(
                params["norm"], state["norm"], x, training=training
            )
            new_state = {**state, "norm": norm_state}
        for layer, lp in zip(self.layers, params["layers"]):
            x, _ = layer.apply(lp, {}, x, training=training)
        return x, new_state


# --------------------------------------------------------------------------
# LSTM sequence network (Recurrence + per-step Dense head)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LSTMNet(Module):
    """LSTM over ``(batch, time, features)`` returning the full sequence,
    followed by a per-timestep Dense head → ``(batch, time, out_dim)``.

    Reference parity: ``Recurrence(LSTMCell(...); return_sequence=true)`` +
    ``RecurrenceOutputDense`` (NNModels.jl:48-77, auto-append at :203-211).
    TPU-native: the recurrence is a single ``lax.scan`` whose step does one
    fused ``(batch, F+H) @ (F+H, 4H)`` matmul — time-sequential but
    batch-parallel on the MXU; XLA unrolls nothing and compiles once.
    """

    in_dim: int
    out_dim: int
    hidden_size: int = 32
    output_activation: str = "identity"
    input_batchnorm: Any = False  # True | False | "static"
    dtype: Any = jnp.float32

    @property
    def norm(self) -> Optional[BatchNorm]:
        if not self.input_batchnorm:
            return None
        return BatchNorm(self.in_dim, frozen=(self.input_batchnorm == "static"))

    def init(self, key: Array):
        k_ih, k_hh, k_head, k_bn = jax.random.split(key, 4)
        h = self.hidden_size
        params = {
            "wi": glorot_uniform(k_ih, self.in_dim, 4 * h, self.dtype),
            "wh": glorot_uniform(k_hh, h, 4 * h, self.dtype),
            "b": jnp.zeros((4 * h,), self.dtype),
            # head follows the net's param dtype — a float32 head under
            # dtype=bfloat16 would make a mixed-dtype parameter pytree
            "head": Dense(
                h, self.out_dim, self.output_activation, dtype=self.dtype
            ).init(k_head)[0],
        }
        state = {}
        if self.input_batchnorm:
            bn_params, bn_state = self.norm.init(k_bn)
            params["norm"] = bn_params
            state["norm"] = bn_state
        return params, state

    def apply(self, params, state, x, *, training: bool = False):
        if x.ndim != 3:
            raise ValueError(
                f"LSTMNet expects (batch, time, features); got shape {x.shape}"
            )
        new_state = state
        if self.input_batchnorm:
            x, norm_state = self.norm.apply(
                params["norm"], state["norm"], x, training=training
            )
            new_state = {**state, "norm": norm_state}

        n = x.shape[0]
        h_size = self.hidden_size
        wi, wh, b = params["wi"], params["wh"], params["b"]

        def step(carry, x_t):
            h, c = carry
            gates = (
                jnp.dot(x_t, wi, preferred_element_type=jnp.float32)
                + jnp.dot(h, wh, preferred_element_type=jnp.float32)
                + b
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((n, h_size), jnp.float32)
        c0 = jnp.zeros((n, h_size), jnp.float32)
        xs = jnp.swapaxes(x, 0, 1)  # (time, batch, feat) for scan
        # static unrolling lets XLA fuse the elementwise gate math across
        # consecutive timesteps and drop the loop bookkeeping; windows are
        # O(10-100) steps, so a bounded unroll keeps compile time sane
        unroll = max(
            1, int(os.environ.get("EASYHYBRID_LSTM_SCAN_UNROLL", "8"))
        )
        _, hs = lax.scan(
            step, (h0, c0), xs, unroll=min(unroll, x.shape[1])
        )
        hs = jnp.swapaxes(hs, 0, 1)  # (batch, time, hidden)

        head = Dense(h_size, self.out_dim, self.output_activation)
        out, _ = head.apply(params["head"], {}, hs, training=training)
        return out, new_state


# --------------------------------------------------------------------------
# BroadcastLayer: apply N modules elementwise over a tuple input
# (parity: reference BroadcastLayer, NNModels.jl:397-419)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BroadcastLayer(Module):
    """Applies ``layers[i]`` to ``inputs[i]`` and returns the output tuple."""

    modules: Tuple[Module, ...]

    def __post_init__(self):
        object.__setattr__(self, "modules", tuple(self.modules))

    @property
    def in_dim(self):
        return tuple(m.in_dim for m in self.modules)

    @property
    def out_dim(self):
        return tuple(m.out_dim for m in self.modules)

    def init(self, key: Array):
        keys = jax.random.split(key, len(self.modules))
        inits = [m.init(k) for m, k in zip(self.modules, keys)]
        return [p for p, _ in inits], [s for _, s in inits]

    def apply(self, params, state, xs, *, training: bool = False):
        outs, states = [], []
        for m, p, s, x in zip(self.modules, params, state, xs):
            o, ns = m.apply(p, s, x, training=training)
            outs.append(o)
            states.append(ns)
        return tuple(outs), states


# --------------------------------------------------------------------------
# constructor: layer-size list / spec → module (prepare_hidden_chain parity)
# --------------------------------------------------------------------------

def construct_nn(
    hidden_layers: Union[Sequence[int], Module, dict],
    in_dim: int,
    out_dim: int,
    *,
    activation: Activation = "tanh",
    output_activation: Activation = "identity",
    input_batchnorm: bool = False,
    compute_dtype: Any = None,
) -> Module:
    """Build an NN module from a layer-size list, an explicit module, or a
    recurrent spec dict ``{"lstm": hidden_size}``.

    Reference parity: ``prepare_hidden_chain`` (NNModels.jl:145-232) including
    the auto-LSTM-head behavior; custom pre-built modules pass through like
    user Chains do in the reference (:241-259).
    """
    if isinstance(hidden_layers, Module):
        return hidden_layers
    if isinstance(hidden_layers, dict):
        if "lstm" in hidden_layers:
            if compute_dtype is not None:
                # MLP-style cast-per-layer mixed precision is not
                # implemented for the recurrent scan — reject instead of
                # silently returning a full-float32 model
                raise ValueError(
                    "compute_dtype is not supported with the "
                    "{'lstm': n} spec; LSTM hybrids run float32"
                )
            return LSTMNet(
                in_dim,
                out_dim,
                hidden_size=int(hidden_layers["lstm"]),
                output_activation=_norm_act(output_activation),
                input_batchnorm=input_batchnorm,
            )
        raise ValueError(f"unknown NN spec dict: {hidden_layers!r}")
    return MLP(
        in_dim,
        out_dim,
        hidden=tuple(int(h) for h in hidden_layers),
        activation=_norm_act(activation),
        output_activation=_norm_act(output_activation),
        input_batchnorm=input_batchnorm,
        compute_dtype=compute_dtype,
    )
