"""Bounded physical-parameter tables and bound transforms.

TPU-native re-design of the reference's ``ParameterContainer`` /
``HybridParams`` (reference: src/models/GenericHybridModel.jl:22-40,
329-365) and ``build_parameters`` (src/models/helpers_for_HybridModel.jl:39-52).

Design notes (why this is not a port):

* The reference stores the table as a 2-D ComponentArray with named axes and
  does per-name scalar lookups inside the forward pass. Under XLA that would
  force gathers; here the table is a struct-of-numpy-arrays that is *static*
  model metadata — bounds are closed over as compile-time constants, so the
  sigmoid rescale fuses into the surrounding XLA program for free.
* All transforms are pure functions over jnp arrays → usable inside jit,
  grad, vmap and Pallas kernels alike.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Mapping, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ParameterContainer",
    "build_parameters",
    "scale_param",
    "unscale_param",
    "hard_sigmoid",
    "inv_hard_sigmoid",
    "inv_sigmoid",
    "sigmoid",
]

ParamSpec = Union[
    Tuple[float, float, float],            # (default, lower, upper)
    Mapping[str, float],                   # {"default": d, "lower": l, "upper": u}
    float,                                 # default only → unbounded-ish wide box
]


def sigmoid(x):
    """Logistic sigmoid via the `logistic` primitive (numerically stable,
    hardware-lowered; also the only form Mosaic lowers cleanly inside
    Pallas kernels — a `where`-based stable sigmoid traces to `select_n`
    branches that complicate the kernel)."""
    import jax

    return jax.nn.sigmoid(x)


def hard_sigmoid(x):
    """Piecewise-linear sigmoid ``clamp(0.2x + 0.5, 0, 1)``.

    Behavior parity with reference src/models/GenericHybridModel.jl:9-11.
    """
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def inv_hard_sigmoid(y):
    """Inverse of :func:`hard_sigmoid` on the linear region (0, 1).

    Saturated inputs extrapolate linearly (the clamp is non-invertible there);
    parity with reference src/models/GenericHybridModel.jl:16-18.
    """
    return (y - 0.5) / 0.2


def inv_sigmoid(y):
    """Logit: inverse of the logistic sigmoid (reference :354).

    Python scalars stay on host (math.log) so init-time seeding dispatches
    zero device ops; arrays/tracers use jnp."""
    if isinstance(y, (float, int)):
        import math

        # mirror jnp.log semantics at/outside the bounds so a parameter whose
        # default equals lower/upper initializes pinned (±inf) instead of
        # raising math-domain/zero-division errors
        if y <= 0.0:
            return -math.inf if y == 0.0 else math.nan
        if y >= 1.0:
            return math.inf if y == 1.0 else math.nan
        return math.log(y / (1.0 - y))
    return jnp.log(y / (1.0 - y))


@dataclasses.dataclass(frozen=True)
class ParameterContainer:
    """Bounded parameter table ``name -> (default, lower, upper)``.

    Static (hashable) model metadata. Arrays are host-side numpy so a model
    holding this container can be closed over by ``jax.jit`` without
    retracing; the bounds become XLA constants.

    Reference parity: ``ParameterContainer`` + accessors ``default/lower/
    upper/pnames`` (src/models/GenericHybridModel.jl:22-30, 329-341).
    """

    names: Tuple[str, ...]
    default: np.ndarray  # float32 (P,)
    lower: np.ndarray    # float32 (P,)
    upper: np.ndarray    # float32 (P,)

    def __post_init__(self):
        object.__setattr__(self, "default", np.asarray(self.default, np.float32))
        object.__setattr__(self, "lower", np.asarray(self.lower, np.float32))
        object.__setattr__(self, "upper", np.asarray(self.upper, np.float32))
        p = len(self.names)
        for field in ("default", "lower", "upper"):
            arr = getattr(self, field)
            if arr.shape != (p,):
                raise ValueError(
                    f"{field} must have shape ({p},); got {arr.shape}"
                )
        if np.any(self.lower >= self.upper):
            bad = [
                self.names[i]
                for i in range(p)
                if self.lower[i] >= self.upper[i]
            ]
            raise ValueError(f"lower >= upper for parameters {bad}")
        if np.any(self.default < self.lower) or np.any(self.default > self.upper):
            bad = [
                self.names[i]
                for i in range(p)
                if not (self.lower[i] <= self.default[i] <= self.upper[i])
            ]
            raise ValueError(f"default outside [lower, upper] for {bad}")

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_dict(table: Mapping[str, ParamSpec]) -> "ParameterContainer":
        names, d, lo, up = [], [], [], []
        for name, spec in table.items():
            names.append(str(name))
            if isinstance(spec, Mapping):
                dv = float(spec["default"])
                lv = float(spec.get("lower", dv - abs(dv) * 10 - 10))
                uv = float(spec.get("upper", dv + abs(dv) * 10 + 10))
            elif isinstance(spec, (tuple, list)):
                if len(spec) != 3:
                    raise ValueError(
                        f"parameter {name!r}: expected (default, lower, upper); got {spec!r}"
                    )
                dv, lv, uv = (float(v) for v in spec)
            else:
                dv = float(spec)
                lv, uv = dv - abs(dv) * 10 - 10, dv + abs(dv) * 10 + 10
            d.append(dv)
            lo.append(lv)
            up.append(uv)
        return ParameterContainer(tuple(names), np.array(d), np.array(lo), np.array(up))

    # -- accessors ---------------------------------------------------------
    def index(self, name: str) -> int:
        try:
            return self.names.index(name)
        except ValueError:
            raise KeyError(
                f"unknown parameter {name!r}; known: {list(self.names)}"
            ) from None

    def default_of(self, name: str) -> float:
        return float(self.default[self.index(name)])

    def lower_of(self, name: str) -> float:
        return float(self.lower[self.index(name)])

    def upper_of(self, name: str) -> float:
        return float(self.upper[self.index(name)])

    def bounds_of(self, names: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        idx = [self.index(n) for n in names]
        return self.lower[idx], self.upper[idx]

    def subset(self, names: Iterable[str]) -> "ParameterContainer":
        names = tuple(names)
        idx = [self.index(n) for n in names]
        return ParameterContainer(
            names, self.default[idx], self.lower[idx], self.upper[idx]
        )

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            n: {
                "default": float(self.default[i]),
                "lower": float(self.lower[i]),
                "upper": float(self.upper[i]),
            }
            for i, n in enumerate(self.names)
        }

    # hashability for closing over in jit-static contexts
    def __hash__(self):
        return hash(
            (
                self.names,
                self.default.tobytes(),
                self.lower.tobytes(),
                self.upper.tobytes(),
            )
        )

    def __eq__(self, other):
        return (
            isinstance(other, ParameterContainer)
            and self.names == other.names
            and np.array_equal(self.default, other.default)
            and np.array_equal(self.lower, other.lower)
            and np.array_equal(self.upper, other.upper)
        )

    def __len__(self):
        return len(self.names)

    def __contains__(self, name):
        return name in self.names

    def __repr__(self):
        rows = "\n".join(
            f"  {n:<16} default={self.default[i]:<10.4g} "
            f"lower={self.lower[i]:<10.4g} upper={self.upper[i]:<10.4g}"
            for i, n in enumerate(self.names)
        )
        return f"ParameterContainer({len(self)} parameters)\n{rows}"


def build_parameters(
    table: Union[ParameterContainer, Mapping[str, ParamSpec]],
    mechanistic_model=None,
) -> ParameterContainer:
    """Normalize a user parameter spec into a :class:`ParameterContainer`.

    Reference parity: ``build_parameters`` (helpers_for_HybridModel.jl:39-52)
    which also associates the mechanistic function; here the association lives
    on the model, so ``mechanistic_model`` is accepted and ignored.
    """
    if isinstance(table, ParameterContainer):
        return table
    return ParameterContainer.from_dict(table)


# -- bound transforms ------------------------------------------------------

def scale_param(raw, lower, upper, kind: str = "sigmoid"):
    """Map unconstrained ``raw`` into the physical box ``[lower, upper]``.

    ``lower + (upper - lower) * sigmoid(raw)`` — parity with
    ``scale_single_param`` (reference GenericHybridModel.jl:348-352).
    ``kind='hard_sigmoid'`` uses the piecewise-linear variant.
    """
    s = hard_sigmoid(raw) if kind == "hard_sigmoid" else sigmoid(raw)
    return lower + (upper - lower) * s


def unscale_param(value, lower, upper, kind: str = "sigmoid"):
    """Inverse of :func:`scale_param`: physical value → unconstrained raw.

    Used to seed trainable parameters at their table default
    (``scale_single_param_minmax``, reference GenericHybridModel.jl:361-365).
    """
    frac = (value - lower) / (upper - lower)
    if kind == "hard_sigmoid":
        return inv_hard_sigmoid(frac)
    return inv_sigmoid(frac)
