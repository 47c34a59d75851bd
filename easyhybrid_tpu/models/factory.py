"""Custom hybrid-model factory — the ``@hybrid`` macro analog.

Parity: the reference's ``@hybrid`` macro (src/utils/macro_hybrid.jl:19-106)
generates a struct holding an NN, predictor/forcing/target name lists and
arbitrary named physical scalar parameters, plus Lux init methods; the
forward pass is user-defined. Here :func:`make_hybrid` builds the same thing
as a small class: raw trainable scalars + NN, with the user's ``forward``
callable receiving the NN output, forcing dict and parameter dict.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp

from .nn import Module, construct_nn

__all__ = ["make_hybrid", "CustomHybridModel"]


@dataclasses.dataclass(frozen=True, eq=False)
class CustomHybridModel:
    """A hybrid model with user-defined forward and raw scalar params.

    ``forward(nn_out, forcing, params) -> dict`` where ``nn_out`` is the
    ``(N, out_dim)`` NN output (or None without predictors), ``forcing`` the
    name→array dict and ``params`` the name→(1,)-array dict of trainable
    physical scalars.
    """

    name: str
    predictors: Tuple[str, ...]
    forcing: Tuple[str, ...]
    targets: Tuple[str, ...]
    param_inits: Tuple[Tuple[str, float], ...]
    forward: Callable
    nn: Any = None
    nn_out_dim: int = 1

    def __post_init__(self):
        if self.predictors and not isinstance(self.nn, Module):
            object.__setattr__(
                self,
                "nn",
                construct_nn(
                    self.nn if self.nn is not None else [15, 15],
                    len(self.predictors),
                    self.nn_out_dim,
                ),
            )

    def init(self, key):
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        if self.predictors:
            nn_params, nn_state = self.nn.init(key)
            params["nn"] = nn_params
            state["nn"] = nn_state
        for pname, val in self.param_inits:
            params[pname] = jnp.full((1,), val, jnp.float32)
        return params, state

    def apply(self, params, state, batch, *, training: bool = False):
        x, forcing = batch
        new_state = dict(state)
        nn_out = None
        if self.predictors:
            nn_out, nn_state = self.nn.apply(
                params["nn"], state["nn"], x, training=training
            )
            new_state["nn"] = nn_state
        phys = {pname: params[pname] for pname, _ in self.param_inits}
        out = self.forward(nn_out, dict(forcing), phys)
        if not isinstance(out, Mapping):
            raise TypeError(
                f"{self.name}.forward must return a dict of named outputs"
            )
        return dict(out), new_state


def make_hybrid(
    name: str,
    predictors: Sequence[str],
    forcing: Sequence[str],
    targets: Sequence[str],
    params: Mapping[str, float],
    forward: Callable,
    *,
    nn: Any = None,
    nn_out_dim: int = 1,
) -> CustomHybridModel:
    """Build a custom hybrid model (``@hybrid`` parity)."""
    return CustomHybridModel(
        name=name,
        predictors=tuple(predictors),
        forcing=tuple(forcing),
        targets=tuple(targets),
        param_inits=tuple((str(k), float(v)) for k, v in params.items()),
        forward=forward,
        nn=nn,
        nn_out_dim=nn_out_dim,
    )
