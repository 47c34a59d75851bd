"""Legacy hand-written hybrid models.

Parity with the reference's pre-generic example models, each a small pytree
model with raw (unbounded) trainable scalar physics parameters:

* :class:`LinearHM` — ``obs = alpha(x; NN) * x_f + beta``
  (reference src/models/LinearHM.jl:8-68)
* :class:`RespirationRbQ10` — ``R_soil = Rb(NN) * Q10^((T-15)/10)``
  (src/models/Respiration_Rb_Q10.jl:9-72, kernel ``mRbQ10`` :39-41)
* :class:`RsComponents` — 3-component soil respiration with 3 Q10s
  (src/models/Rs_components.jl:8-57)
* :class:`RbQ10TwoParams` — pure 2-parameter PBM, no NN
  (src/models/simple_Rb_Q10_PBM.jl:6-44)
* :class:`FluxPartModelQ10` — two NNs (RUE, Rb): NEE = RECO − GPP
  (src/models/FluxPartModel_Q10_Lux.jl:9-79)

Unlike the generic models these use RAW trainable scalars (no sigmoid
bounding) — matching the reference exactly. All follow the same
``init(key) -> (params, state)`` / ``apply(params, state, batch)`` protocol,
so `train` and `compute_loss` work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .nn import Module, construct_nn

__all__ = [
    "m_rb_q10",
    "LinearHM",
    "RespirationRbQ10",
    "RsComponents",
    "RbQ10TwoParams",
    "FluxPartModelQ10",
]


def m_rb_q10(rb, q10, temp, tref=15.0):
    """Q10 respiration kernel (parity: ``mRbQ10``,
    Respiration_Rb_Q10.jl:39-41)."""
    return rb * q10 ** (0.1 * (temp - tref))


def _as_nn(nn, in_dim: int, out_dim: int) -> Module:
    if isinstance(nn, Module):
        return nn
    return construct_nn(nn if nn is not None else [15, 15], in_dim, out_dim)


@dataclasses.dataclass(frozen=True, eq=False)
class LinearHM:
    """``obs = alpha * x_forcing + beta`` with NN-predicted alpha."""

    predictors: Tuple[str, ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...] = ("obs",)
    beta: float = 1.5
    nn: Any = None

    def __post_init__(self):
        object.__setattr__(self, "predictors", tuple(self.predictors))
        object.__setattr__(self, "forcing", tuple(self.forcing))
        object.__setattr__(self, "targets", tuple(self.targets))
        object.__setattr__(
            self, "nn", _as_nn(self.nn, len(self.predictors), 1)
        )

    def init(self, key):
        nn_params, nn_state = self.nn.init(key)
        return (
            {"nn": nn_params, "beta": jnp.full((1,), self.beta, jnp.float32)},
            {"nn": nn_state},
        )

    def apply(self, params, state, batch, *, training: bool = False):
        x, forcing = batch
        alpha, nn_state = self.nn.apply(params["nn"], state["nn"], x, training=training)
        alpha = alpha[..., 0]
        xf = forcing[self.forcing[0]]
        y = alpha * xf + params["beta"]
        return {self.targets[0]: y, "alpha": alpha}, {"nn": nn_state}


@dataclasses.dataclass(frozen=True, eq=False)
class RespirationRbQ10:
    """``R_soil = Rb(NN) * Q10^((T - tref)/10)`` with raw trainable Q10."""

    predictors: Tuple[str, ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...] = ("R_soil",)
    q10: float = 1.5
    tref: float = 15.0
    nn: Any = None

    def __post_init__(self):
        object.__setattr__(self, "predictors", tuple(self.predictors))
        object.__setattr__(self, "forcing", tuple(self.forcing))
        object.__setattr__(self, "targets", tuple(self.targets))
        object.__setattr__(self, "nn", _as_nn(self.nn, len(self.predictors), 1))

    def init(self, key):
        nn_params, nn_state = self.nn.init(key)
        return (
            {"nn": nn_params, "Q10": jnp.full((1,), self.q10, jnp.float32)},
            {"nn": nn_state},
        )

    def apply(self, params, state, batch, *, training: bool = False):
        x, forcing = batch
        rb, nn_state = self.nn.apply(params["nn"], state["nn"], x, training=training)
        rb = rb[..., 0]
        temp = forcing[self.forcing[0]]
        r_soil = m_rb_q10(rb, params["Q10"], temp, self.tref)
        return {self.targets[0]: r_soil, "Rb": rb}, {"nn": nn_state}


@dataclasses.dataclass(frozen=True, eq=False)
class RsComponents:
    """3-component soil respiration: het/root/myc, each with its own Q10."""

    predictors: Tuple[str, ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...] = ("R_soil",)
    q10_het: float = 1.5
    q10_root: float = 1.5
    q10_myc: float = 1.5
    tref: float = 15.0
    nn: Any = None

    def __post_init__(self):
        object.__setattr__(self, "predictors", tuple(self.predictors))
        object.__setattr__(self, "forcing", tuple(self.forcing))
        object.__setattr__(self, "targets", tuple(self.targets))
        object.__setattr__(self, "nn", _as_nn(self.nn, len(self.predictors), 3))

    def init(self, key):
        nn_params, nn_state = self.nn.init(key)
        params = {
            "nn": nn_params,
            "Q10_het": jnp.full((1,), self.q10_het, jnp.float32),
            "Q10_root": jnp.full((1,), self.q10_root, jnp.float32),
            "Q10_myc": jnp.full((1,), self.q10_myc, jnp.float32),
        }
        return params, {"nn": nn_state}

    def apply(self, params, state, batch, *, training: bool = False):
        x, forcing = batch
        out, nn_state = self.nn.apply(params["nn"], state["nn"], x, training=training)
        temp = forcing[self.forcing[0]]
        r_het = m_rb_q10(out[..., 0], params["Q10_het"], temp, self.tref)
        r_root = m_rb_q10(out[..., 1], params["Q10_root"], temp, self.tref)
        r_myc = m_rb_q10(out[..., 2], params["Q10_myc"], temp, self.tref)
        r_soil = r_het + r_root + r_myc
        return (
            {
                self.targets[0]: r_soil,
                "R_het": r_het,
                "R_root": r_root,
                "R_myc": r_myc,
            },
            {"nn": nn_state},
        )


@dataclasses.dataclass(frozen=True, eq=False)
class RbQ10TwoParams:
    """Pure process model: trainable scalars Rb, Q10; no NN
    (reference simple_Rb_Q10_PBM.jl uses tref = 0)."""

    forcing: Tuple[str, ...]
    targets: Tuple[str, ...] = ("R_soil",)
    q10: float = 1.5
    rb: float = 1.0
    tref: float = 0.0
    predictors: Tuple[str, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "forcing", tuple(self.forcing))
        object.__setattr__(self, "targets", tuple(self.targets))

    def init(self, key):
        params = {
            "Q10": jnp.full((1,), self.q10, jnp.float32),
            "Rb": jnp.full((1,), self.rb, jnp.float32),
        }
        return params, {}

    def apply(self, params, state, batch, *, training: bool = False):
        _, forcing = batch
        temp = forcing[self.forcing[0]]
        r_soil = m_rb_q10(params["Rb"], params["Q10"], temp, self.tref)
        return {self.targets[0]: r_soil}, state


@dataclasses.dataclass(frozen=True, eq=False)
class FluxPartModelQ10:
    """Flux partitioning: NEE = RECO − GPP with two NNs.

    GPP = SW_IN * RUE / 12.011; RECO = Rb * Q10^((TA−15)/10).
    Forcing names default to the reference's (:SW_IN, :TA)."""

    rue_predictors: Tuple[str, ...]
    rb_predictors: Tuple[str, ...]
    forcing: Tuple[str, ...] = ("SW_IN", "TA")
    targets: Tuple[str, ...] = ("NEE",)
    q10: float = 1.5
    rue_nn: Any = None
    rb_nn: Any = None

    def __post_init__(self):
        object.__setattr__(self, "rue_predictors", tuple(self.rue_predictors))
        object.__setattr__(self, "rb_predictors", tuple(self.rb_predictors))
        object.__setattr__(self, "forcing", tuple(self.forcing))
        object.__setattr__(self, "targets", tuple(self.targets))
        object.__setattr__(
            self, "rue_nn", _as_nn(self.rue_nn, len(self.rue_predictors), 1)
        )
        object.__setattr__(
            self, "rb_nn", _as_nn(self.rb_nn, len(self.rb_predictors), 1)
        )

    @property
    def predictors(self) -> Tuple[Tuple[str, Tuple[str, ...]], ...]:
        # MultiNN-style predictor spec so prepare_data builds branch inputs
        return (("RUE", self.rue_predictors), ("Rb", self.rb_predictors))

    def init(self, key):
        k1, k2 = jax.random.split(key)
        rue_params, rue_state = self.rue_nn.init(k1)
        rb_params, rb_state = self.rb_nn.init(k2)
        params = {
            "RUE": rue_params,
            "Rb": rb_params,
            "Q10": jnp.full((1,), self.q10, jnp.float32),
        }
        return params, {"RUE": rue_state, "Rb": rb_state}

    def apply(self, params, state, batch, *, training: bool = False):
        x, forcing = batch
        sw_in = forcing[self.forcing[0]]
        ta = forcing[self.forcing[1]]
        rue, rue_state = self.rue_nn.apply(
            params["RUE"], state["RUE"], x["RUE"], training=training
        )
        rb, rb_state = self.rb_nn.apply(
            params["Rb"], state["Rb"], x["Rb"], training=training
        )
        rue, rb = rue[..., 0], rb[..., 0]
        gpp = sw_in * rue / 12.011
        reco = rb * params["Q10"] ** (0.1 * (ta - 15.0))
        nee = reco - gpp
        return (
            {self.targets[0]: nee, "RUE": rue, "Rb": rb, "GPP": gpp, "RECO": reco},
            {"RUE": rue_state, "Rb": rb_state},
        )
