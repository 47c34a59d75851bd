"""Optimizer resolution: names / optax transforms / per-branch rules.

Parity: the reference's optimizer routing (src/training/train.jl:20-93) —
single Optimisers rule, per-branch NamedTuple of rules with ``Adam()``
fallback, or prebuilt state trees — mapped onto optax:

* ``optax.GradientTransformation`` → used as-is
* ``"adam"`` / ``("adam", lr)`` / ``("adam", {"learning_rate": ..})`` → ctor
* ``{"branch": spec, ...}`` → ``optax.multi_transform`` labeled by the
  top-level params key (``nn`` / ``nns`` / ``globals`` or a specific global
  parameter name), default Adam(1e-3) for unlisted branches.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple, Union

import jax
import optax

__all__ = [
    "resolve_optimizer",
    "OPTIMIZERS",
    "SECOND_ORDER_SOLVERS",
    "is_second_order",
    "resolve_second_order",
]

OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "rmsprop": optax.rmsprop,
    "sgd": optax.sgd,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "nadam": optax.nadam,
    "radam": optax.radam,
    "lamb": optax.lamb,
    "lion": optax.lion,
    "amsgrad": optax.amsgrad,
    "adamax": optax.adamax,
    "noisy_sgd": optax.noisy_sgd,
}

def _gd_linesearch(max_linesearch_steps: int = 30, **kwargs):
    """Steepest descent with zoom linesearch — a second non-lbfgs solver on
    the Optimization.jl-style path (the reference accepts any Optimization.jl
    solver there, train.jl:148-157)."""
    return optax.chain(
        optax.sgd(learning_rate=1.0),
        optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps, **kwargs
        ),
    )


#: solver ctors routed to the second-order (linesearch) driver
#: (reference train_optimization.jl routes any non-Optimisers solver here)
SECOND_ORDER_SOLVERS = {
    "lbfgs": optax.lbfgs,
    "l-bfgs": optax.lbfgs,
    "gd_linesearch": _gd_linesearch,
    "gradient_descent": _gd_linesearch,
}

_DEFAULT_LR = 0.01  # reference TrainConfig default: Adam(0.01)


def is_second_order(spec) -> bool:
    return isinstance(spec, str) and spec.lower() in SECOND_ORDER_SOLVERS or (
        isinstance(spec, tuple)
        and len(spec) >= 1
        and isinstance(spec[0], str)
        and spec[0].lower() in SECOND_ORDER_SOLVERS
    )


def resolve_second_order(spec, **ctor_kwargs) -> optax.GradientTransformation:
    """Resolve a second-order solver spec for the linesearch driver.

    Accepts a registered name (``"lbfgs"``, ``"gd_linesearch"``, …), a
    ``(name, args...)`` / ``(name, {kwargs})`` tuple, or any prebuilt optax
    transform (arbitrary-solver parity with the reference's Optimization.jl
    routing, train.jl:148-157). ``ctor_kwargs`` are the leftover ``train``
    kwargs, forwarded to the solver constructor — the ``solve(...)`` kwarg
    forwarding analog (train_optimization.jl:33-119)."""
    if isinstance(spec, optax.GradientTransformation):
        if ctor_kwargs:
            raise TypeError(
                "solver kwargs cannot be applied to a prebuilt optimizer "
                f"instance: {sorted(ctor_kwargs)}"
            )
        return spec
    args: Tuple = ()
    if isinstance(spec, tuple):
        name, *rest = spec
        if rest and isinstance(rest[-1], Mapping):
            ctor_kwargs = {**rest[-1], **ctor_kwargs}
            rest = rest[:-1]
        args = tuple(rest)
    else:
        name = spec
    if not isinstance(name, str) or name.lower() not in SECOND_ORDER_SOLVERS:
        raise ValueError(
            f"unknown second-order solver {name!r}; known: "
            f"{sorted(SECOND_ORDER_SOLVERS)} (or pass a prebuilt optax "
            "transform with second_order=True)"
        )
    return SECOND_ORDER_SOLVERS[name.lower()](*args, **ctor_kwargs)


def _resolve_single(spec) -> optax.GradientTransformation:
    if isinstance(spec, optax.GradientTransformation):
        return spec
    if isinstance(spec, str):
        name = spec.lower()
        if name in SECOND_ORDER_SOLVERS:
            return resolve_second_order(spec)
        if name not in OPTIMIZERS:
            raise ValueError(
                f"unknown optimizer {spec!r}; known: {sorted(OPTIMIZERS)}"
            )
        return OPTIMIZERS[name](_DEFAULT_LR)
    if isinstance(spec, tuple):
        name = spec[0]
        if not isinstance(name, str):
            raise TypeError(f"optimizer tuple must start with a name; got {spec!r}")
        lname = name.lower()
        if lname in SECOND_ORDER_SOLVERS:
            return resolve_second_order(spec)
        if lname not in OPTIMIZERS:
            raise ValueError(
                f"unknown optimizer {name!r}; known: {sorted(OPTIMIZERS)}"
            )
        ctor = OPTIMIZERS[lname]
        if len(spec) == 1:
            return ctor(_DEFAULT_LR)
        arg = spec[1]
        if isinstance(arg, Mapping):
            return ctor(**arg)
        return ctor(arg, *spec[2:])
    raise TypeError(f"cannot resolve optimizer spec {spec!r}")


def resolve_optimizer(spec, params: Optional[Any] = None) -> optax.GradientTransformation:
    """Resolve an optimizer spec; dict specs build a per-branch
    ``multi_transform`` over the top-level keys of ``params``."""
    if isinstance(spec, Mapping):
        if params is None:
            raise ValueError("per-branch optimizers need the params pytree")
        branch_keys = set(params.keys())
        # expand specs naming individual globals into the label space
        transforms: Dict[str, optax.GradientTransformation] = {}
        label_of: Dict[Any, str] = {}
        for key, sub in spec.items():
            if is_second_order(sub):
                # linesearch transforms need update(..., value, grad,
                # value_fn) kwargs the first-order scan epoch never
                # passes — fail here, not as a TypeError inside jit
                raise ValueError(
                    f"per-branch optimizer {sub!r} for {key!r} is a "
                    "second-order/linesearch solver; those cannot be "
                    "per-branch rules — use optimizer=<solver> with "
                    "second_order=True for the whole model instead"
                )
            transforms[str(key)] = _resolve_single(sub)
        default = transforms.setdefault(
            "__default__", optax.adam(1.0e-3)
        )  # Adam fallback parity: train.jl:84

        def label_tree(p):
            labels = {}
            for k, v in p.items():
                if k == "globals" and isinstance(v, Mapping):
                    glabels = {}
                    for g in v:
                        if g in transforms:
                            glabels[g] = g
                        elif "globals" in transforms:
                            glabels[g] = "globals"
                        else:
                            glabels[g] = "__default__"
                    labels[k] = glabels
                elif k == "nns" and isinstance(v, Mapping):
                    nlabels = {}
                    for b in v:
                        lbl = (
                            b
                            if b in transforms
                            else ("nns" if "nns" in transforms else "__default__")
                        )
                        nlabels[b] = jax.tree.map(lambda _: lbl, v[b])
                    labels[k] = nlabels
                else:
                    lbl = k if k in transforms else "__default__"
                    labels[k] = jax.tree.map(lambda _: lbl, v)
            return labels

        return optax.multi_transform(transforms, label_tree(params))
    return _resolve_single(spec)
