"""Loss specification types and the LoggingLoss config.

Parity with the reference's loss-spec type system (reference:
src/losses/compute_loss_types.jl:4-144 — ``SymbolicLoss``/``FunctionLoss``/
``ParameterizedLoss``/``ExtraLoss``/``PerTarget``/``LoggingLoss``) and its
pretty-printing (src/losses/show_loss_types.jl).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple, Union

__all__ = [
    "LossSpec",
    "SymbolicLoss",
    "FunctionLoss",
    "ParameterizedLoss",
    "ElementwiseLoss",
    "ExtraLoss",
    "PerTarget",
    "LoggingLoss",
    "to_loss_spec",
    "loss_name",
    "AGGREGATIONS",
    "resolve_agg",
]


def _sum(xs):
    total = 0.0
    for x in xs:
        total = total + x
    return total


def _mean(xs):
    xs = list(xs)
    return _sum(xs) / len(xs)


AGGREGATIONS = {"sum": _sum, "mean": _mean}


def resolve_agg(agg: Union[str, Callable]) -> Callable:
    """Aggregation over the per-target loss list (reference ``agg=sum``)."""
    if callable(agg):
        return agg
    if agg in AGGREGATIONS:
        return AGGREGATIONS[agg]
    raise ValueError(f"unknown aggregation {agg!r}; known: {sorted(AGGREGATIONS)}")


def agg_name(agg: Union[str, Callable]) -> str:
    if isinstance(agg, str):
        return agg
    return getattr(agg, "__name__", "agg").lstrip("_")


class LossSpec:
    """Base class for normalized loss specifications."""


@dataclasses.dataclass(frozen=True)
class SymbolicLoss(LossSpec):
    """A registry metric referenced by name (reference ``SymbolicLoss``)."""

    name: str

    def __call__(self, y_hat, y, mask):
        from .metrics import loss_fn

        return loss_fn(y_hat, y, mask, self.name)


@dataclasses.dataclass(frozen=True)
class FunctionLoss(LossSpec):
    """A bare callable ``f(y_hat, y, mask)`` (reference ``FunctionLoss``)."""

    fn: Callable

    def __call__(self, y_hat, y, mask):
        from .metrics import loss_fn

        return loss_fn(y_hat, y, mask, self.fn)


@dataclasses.dataclass(frozen=True)
class ParameterizedLoss(LossSpec):
    """A callable with extra args/kwargs (reference ``ParameterizedLoss``)."""

    fn: Callable
    args: Tuple[Any, ...] = ()
    kwargs: Tuple[Tuple[str, Any], ...] = ()

    def __call__(self, y_hat, y, mask):
        from .metrics import loss_fn

        return loss_fn(
            y_hat, y, mask, (self.fn, self.args, dict(self.kwargs))
        )


@dataclasses.dataclass(frozen=True)
class ElementwiseLoss(LossSpec):
    """A per-element loss ``ℓ(ŷᵢ, yᵢ)`` reduced by a masked mean (or sum).

    The declarative counterpart of a custom ``FunctionLoss`` for the common
    case where the loss is a pointwise residual penalty (pinball, Huber,
    log-cosh, …): ``fn(y_hat, y, *args, **kwargs)`` maps same-shape arrays
    elementwise to per-element losses, and the framework applies the NaN
    mask and the reduction. Declaring the structure (instead of burying the
    reduction inside an opaque callable) lets the fused Pallas epoch kernel
    differentiate it in forward mode — the same diagonal-Jacobian ``jvp``
    trick used for the user's mechanistic model — so training with e.g. a
    pinball loss keeps the fused fast path. The runtime exactness gate
    still verifies the kernel against the XLA path on the actual model and
    data, so a ``fn`` that violates the elementwise contract falls back
    safely.

    Reference analog: the RbQ10 project's custom pinball loss
    (projects/RbQ10/Q10.jl:56-62) expressed declaratively.
    """

    fn: Callable
    args: Tuple[Any, ...] = ()
    kwargs: Tuple[Tuple[str, Any], ...] = ()
    normalize: str = "mean"  # "mean" (masked mean) or "sum" (masked sum)
    name: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.kwargs, dict):
            object.__setattr__(self, "kwargs", tuple(sorted(self.kwargs.items())))
        if self.normalize not in ("mean", "sum"):
            raise ValueError(
                f"ElementwiseLoss normalize must be 'mean' or 'sum', "
                f"got {self.normalize!r}"
            )

    def elementwise(self, y_hat, y):
        """Per-element losses (no mask/reduction) — the fused kernel entry."""
        return self.fn(y_hat, y, *self.args, **dict(self.kwargs))

    def __call__(self, y_hat, y, mask):
        import jax.numpy as jnp

        from .metrics import _sanitize, masked_sum

        if isinstance(y, tuple):
            # like named registry metrics (metrics.loss_fn): elementwise
            # losses have no sigma semantics — without this, the (y, sigma)
            # tuple would silently stack into a (2, N) target
            raise ValueError(
                f"elementwise loss {self.name or self.fn!r} does not "
                "support (y, sigma) targets; use a custom callable "
                "f(y_hat, y, mask, sigma=...)"
            )
        yh, ys, m = _sanitize(y_hat, y, mask)
        s = masked_sum(self.elementwise(yh, ys), m)
        if self.normalize == "mean":
            return s / jnp.maximum(jnp.sum(m), 1.0)
        return s


@dataclasses.dataclass(frozen=True)
class ExtraLoss(LossSpec):
    """An additive penalty over (outputs, params) — e.g. weight decay.

    ``fn(outputs, params) -> scalar`` or ``-> dict of named scalars``.
    Parity: reference ``ExtraLoss`` / ``extra_loss`` hook
    (compute_loss_types.jl, compute_loss.jl:30-44).
    """

    fn: Callable

    def __call__(self, outputs, params):
        return self.fn(outputs, params)


@dataclasses.dataclass(frozen=True)
class PerTarget(LossSpec):
    """A different loss spec per target, positionally matched
    (reference ``PerTarget``, assemble at compute_loss.jl:128-145)."""

    losses: Tuple[Any, ...]

    def __init__(self, losses: Sequence[Any]):
        object.__setattr__(
            self, "losses", tuple(to_loss_spec(l) for l in losses)
        )


def to_loss_spec(spec) -> LossSpec:
    """Normalize a user spec (str / callable / tuple / LossSpec) to LossSpec.

    Parity: ``_to_loss_spec`` (compute_loss_types.jl)."""
    if isinstance(spec, LossSpec):
        return spec
    if isinstance(spec, str):
        return SymbolicLoss(spec)
    if callable(spec):
        return FunctionLoss(spec)
    if isinstance(spec, tuple):
        f = spec[0]
        args: Tuple[Any, ...] = ()
        kwargs: Tuple[Tuple[str, Any], ...] = ()
        for extra in spec[1:]:
            if isinstance(extra, dict):
                kwargs = tuple(sorted(extra.items()))
            elif isinstance(extra, (tuple, list)):
                args = tuple(extra)
            else:
                raise TypeError(f"bad loss tuple extra: {extra!r}")
        return ParameterizedLoss(f, args, kwargs)
    raise TypeError(f"cannot normalize loss spec {spec!r}")


def loss_name(spec) -> str:
    """Display/history name for a loss spec (reference ``_loss_name``,
    compute_loss.jl:245-257)."""
    if isinstance(spec, str):
        return spec
    if isinstance(spec, SymbolicLoss):
        return spec.name
    if isinstance(spec, FunctionLoss):
        return getattr(spec.fn, "__name__", "custom").replace("<", "").replace(">", "")
    if isinstance(spec, ElementwiseLoss):
        return spec.name or getattr(spec.fn, "__name__", "elementwise")
    if isinstance(spec, ParameterizedLoss):
        return getattr(spec.fn, "__name__", "custom")
    if isinstance(spec, PerTarget):
        return "per_target"
    if isinstance(spec, tuple):
        return loss_name(to_loss_spec(spec))
    if callable(spec):
        return getattr(spec, "__name__", "custom").replace("<", "").replace(">", "")
    return str(spec)


@dataclasses.dataclass(frozen=True)
class LoggingLoss:
    """Loss configuration carried through training/eval.

    Parity: reference ``LoggingLoss`` (compute_loss_types.jl) —
    ``loss_types`` are the metrics reported at eval; ``training_loss`` is the
    scalar optimized; ``extra_loss`` an additive penalty; ``agg`` aggregates
    per-target losses into one scalar.
    """

    loss_types: Tuple[Any, ...] = ("mse", "r2")
    training_loss: Any = "mse"
    extra_loss: Optional[Any] = None
    agg: Union[str, Callable] = "sum"
    train_mode: bool = True

    def __post_init__(self):
        lt = self.loss_types
        if isinstance(lt, (str,)) or callable(lt) or isinstance(lt, LossSpec):
            lt = (lt,)
        object.__setattr__(self, "loss_types", tuple(lt))

    @property
    def agg_fn(self) -> Callable:
        return resolve_agg(self.agg)

    @property
    def agg_name(self) -> str:
        return agg_name(self.agg)

    def __repr__(self):
        names = ", ".join(loss_name(l) for l in self.loss_types)
        extra = loss_name(self.extra_loss) if self.extra_loss is not None else "nothing"
        return (
            "LoggingLoss(\n"
            f"  loss_types    = [{names}]\n"
            f"  training_loss = {loss_name(self.training_loss)}\n"
            f"  extra_loss    = {extra}\n"
            f"  agg           = {self.agg_name}\n"
            f"  train_mode    = {self.train_mode}\n"
            ")"
        )
