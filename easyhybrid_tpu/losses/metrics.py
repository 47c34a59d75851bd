"""Masked loss metrics (jit-safe NaN handling).

Re-design of the reference's metric registry (reference: src/losses/
loss_fn.jl:58-205). The reference boolean-indexes the finite subset
(``ŷ[y_nan]``) — a shape-dynamic operation XLA cannot compile. Here every
metric is an exact masked reduction: means/variances/correlations are taken
over ``mask``-weighted elements with identical math on the masked subset,
so values match the reference bit-for-bit up to float associativity, while
shapes stay static (TPU/MXU friendly).

Custom metrics use the signature ``f(y_hat, y, mask, **kwargs)`` where
``mask`` is a float/bool array marking valid (finite, non-padding) samples.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Union

import jax.numpy as jnp

__all__ = [
    "loss_fn",
    "is_better",
    "best_direction",
    "check_training_loss",
    "register_metric",
    "METRICS",
    "MAXIMIZE_METRICS",
    "masked_mean",
    "masked_sum",
    "masked_var",
    "masked_std",
    "masked_corr",
    "pinball",
    "huber",
]

Array = jnp.ndarray
_EPS = 1e-12


def _sanitize(y_hat: Array, y: Array, mask) -> Tuple[Array, Array, Array]:
    """Zero out invalid entries so NaNs never touch the compute graph:
    targets go through a ``where`` (NaN * 0 = NaN would leak), predictions
    are mask-multiplied. Gradients through masked-out samples are exactly
    zero on both paths."""
    if mask is None:
        mask = jnp.isfinite(y)
    m = mask.astype(jnp.float32)
    y_safe = jnp.where(m > 0, y, 0.0)
    yh_safe = jnp.where(m > 0, y_hat, 0.0)
    return yh_safe, y_safe, m


def masked_sum(x: Array, m: Array) -> Array:
    return jnp.sum(x * m)


def masked_mean(x: Array, m: Array) -> Array:
    return masked_sum(x, m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_var(x: Array, m: Array, *, ddof: int = 1) -> Array:
    """Masked variance (Bessel-corrected by default, matching Julia ``std``)."""
    n = jnp.maximum(jnp.sum(m), 1.0)
    mu = masked_sum(x, m) / n
    d = x - mu
    ss = masked_sum(d * d, m)
    return ss / jnp.maximum(n - ddof, 1.0)


def masked_std(x: Array, m: Array, *, ddof: int = 1) -> Array:
    return jnp.sqrt(masked_var(x, m, ddof=ddof))


def masked_corr(a: Array, b: Array, m: Array) -> Array:
    """Masked Pearson correlation (Bessel factors cancel)."""
    n = jnp.maximum(jnp.sum(m), 1.0)
    mu_a = masked_sum(a, m) / n
    mu_b = masked_sum(b, m) / n
    da = (a - mu_a) * m
    db = (b - mu_b) * m
    cov = jnp.sum(da * db)
    denom = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db))
    return cov / jnp.maximum(denom, _EPS)


# --------------------------------------------------------------------------
# metric registry (reference loss_fn.jl:58-179)
# --------------------------------------------------------------------------

def _mse(yh, y, m):
    return masked_mean((yh - y) * (yh - y), m)


def _rmse(yh, y, m):
    return jnp.sqrt(_mse(yh, y, m))


def _mae(yh, y, m):
    return masked_mean(jnp.abs(yh - y), m)


def _pearson(yh, y, m):
    return masked_corr(yh, y, m)


def _sse_over_sst(yh, y, m):
    sse = masked_sum((yh - y) * (yh - y), m)
    mu = masked_mean(y, m)
    sst = masked_sum((y - mu) * (y - mu), m)
    return sse / jnp.maximum(sst, _EPS)


def _r2(yh, y, m):
    return 1.0 - _sse_over_sst(yh, y, m)


def _pearson_loss(yh, y, m):
    return 1.0 - masked_corr(yh, y, m)


def _nse_loss(yh, y, m):
    return _sse_over_sst(yh, y, m)


def _nse(yh, y, m):
    return 1.0 - _sse_over_sst(yh, y, m)


def _alpha(yh, y, m):
    return masked_std(yh, m) / jnp.maximum(masked_std(y, m), _EPS)


def _beta(yh, y, m):
    return masked_mean(yh, m) / masked_mean(y, m)


def _kge_loss(yh, y, m):
    r = masked_corr(yh, y, m)
    a = _alpha(yh, y, m)
    b = _beta(yh, y, m)
    return jnp.sqrt((r - 1.0) * (r - 1.0) + (a - 1.0) * (a - 1.0) + (b - 1.0) * (b - 1.0))


def _kge(yh, y, m):
    return 1.0 - _kge_loss(yh, y, m)


def _pbkge_loss(yh, y, m):
    r = masked_corr(yh, y, m)
    b = _beta(yh, y, m)
    return jnp.sqrt((r - 1.0) * (r - 1.0) + (b - 1.0) * (b - 1.0))


def _pbkge(yh, y, m):
    return 1.0 - _pbkge_loss(yh, y, m)


METRICS: Dict[str, Callable] = {
    "mse": _mse,
    "rmse": _rmse,
    "mae": _mae,
    "pearson": _pearson,
    "r2": _r2,
    "pearsonLoss": _pearson_loss,
    "nseLoss": _nse_loss,
    "nse": _nse,
    "kgeLoss": _kge_loss,
    "kge": _kge,
    "pbkgeLoss": _pbkge_loss,
    "pbkge": _pbkge,
    "alpha": _alpha,
    "beta": _beta,
    # unicode aliases matching the reference's :α / :β symbols
    "α": _alpha,
    "β": _beta,
}

#: metrics whose best direction is "larger is better"
#: (reference loss_fn.jl:186-188)
# a MUTABLE set: register_metric(maximize=True) adds in place, so modules
# that imported the set by value (from-imports) see custom metrics too
MAXIMIZE_METRICS = {"pearson", "r2", "nse", "kge", "pbkge"}


def register_metric(name: str, fn: Callable, *, maximize: bool = False) -> None:
    """Register a custom named metric ``fn(y_hat, y, mask) -> scalar``.

    Mirrors the reference's "add a ``loss_fn`` method" extension point
    (loss_fn.jl:48-54).
    """
    METRICS[name] = fn
    if maximize:
        MAXIMIZE_METRICS.add(name)  # in place — rebinding would strand
        # stale from-imports of the set in other modules


# --------------------------------------------------------------------------
# declarative elementwise losses (fused-kernel-compatible training losses)
# --------------------------------------------------------------------------

def _pinball_elem(y_hat, y, tau):
    r = y_hat - y
    return tau * jnp.maximum(r, 0.0) + (tau - 1.0) * jnp.minimum(r, 0.0)


def _huber_elem(y_hat, y, delta):
    r = jnp.abs(y_hat - y)
    quad = 0.5 * r * r
    lin = delta * (r - 0.5 * delta)
    return jnp.where(r <= delta, quad, lin)


def pinball(tau: float = 0.5, *, normalize: str = "mean"):
    """Quantile (pinball) loss as a declarative :class:`ElementwiseLoss`.

    ``pinball(0.9)`` trains the 90 %-quantile regression of each target —
    the loss the reference's RbQ10 real-data project hand-writes
    (projects/RbQ10/Q10.jl:56-62). As an ``ElementwiseLoss`` it stays
    inside the fused Pallas epoch kernel's envelope.
    """
    from .specs import ElementwiseLoss

    return ElementwiseLoss(
        _pinball_elem, args=(float(tau),), normalize=normalize,
        name=f"pinball(tau={tau})",
    )


def huber(delta: float = 1.0, *, normalize: str = "mean"):
    """Huber loss as a declarative :class:`ElementwiseLoss` (quadratic below
    ``delta``, linear above — robust to outliers; fused-kernel compatible)."""
    from .specs import ElementwiseLoss

    return ElementwiseLoss(
        _huber_elem, args=(float(delta),), normalize=normalize,
        name=f"huber(delta={delta})",
    )


LossType = Union[str, Callable, tuple]


def loss_fn(y_hat: Array, y: Array, mask, loss_type: LossType):
    """Evaluate one metric on one target. ``loss_type`` is a registry name,
    a callable ``f(y_hat, y, mask, ...)``, or a tuple ``(f, args)``,
    ``(f, kwargs)``, ``(f, args, kwargs)``.

    Parity: reference ``loss_fn`` dispatch (loss_fn.jl:58-103) with mask-aware
    custom-callable signatures instead of boolean-indexed subsets.

    ``y`` may be an ``(y_obs, sigma)`` tuple (observation uncertainty —
    reference ``_get_target_y`` Tuple form, compute_loss.jl:200-205): sigma
    is forwarded to custom callables as a ``sigma=`` keyword; named registry
    metrics reject it (they have no sigma semantics, as in the reference).
    """
    sigma = None
    if isinstance(y, tuple):
        y, sigma = y
        if isinstance(loss_type, str):
            raise ValueError(
                f"named metric {loss_type!r} does not support (y, sigma) "
                "targets; use a custom callable f(y_hat, y, mask, sigma=...)"
            )
    yh, ys, m = _sanitize(y_hat, y, mask)
    if sigma is not None:
        # masked rows typically carry NaN sigma too; fill with a neutral
        # 1.0 (division-safe) so (0-0)/sigma terms stay exactly zero
        # instead of poisoning the loss with NaN*0
        sigma = jnp.where(m > 0, sigma, 1.0)
        if callable(loss_type):
            return loss_type(yh, ys, m, sigma=sigma)
        if isinstance(loss_type, tuple):
            f = loss_type[0]
            args: tuple = ()
            kwargs: dict = {}
            for extra in loss_type[1:]:
                if isinstance(extra, dict):
                    kwargs = dict(extra)
                elif isinstance(extra, tuple):
                    args = extra
            return f(yh, ys, m, *args, sigma=sigma, **kwargs)
        raise TypeError(f"unsupported loss spec for (y, sigma): {loss_type!r}")
    if isinstance(loss_type, str):
        if loss_type not in METRICS:
            raise ValueError(
                f"unknown loss type {loss_type!r}; known: {sorted(METRICS)}"
            )
        return METRICS[loss_type](yh, ys, m)
    if callable(loss_type):
        return loss_type(yh, ys, m)
    if isinstance(loss_type, tuple):
        f = loss_type[0]
        args: tuple = ()
        kwargs: dict = {}
        for extra in loss_type[1:]:
            if isinstance(extra, dict):
                kwargs = extra
            elif isinstance(extra, tuple):
                args = extra
            else:
                raise TypeError(
                    "custom loss tuple extras must be a tuple (args) or dict "
                    f"(kwargs); got {type(extra).__name__}"
                )
        return f(yh, ys, m, *args, **kwargs)
    raise TypeError(f"unsupported loss spec: {loss_type!r}")


# --------------------------------------------------------------------------
# direction traits (reference loss_fn.jl:181-205)
# --------------------------------------------------------------------------

def best_direction(loss_type) -> str:
    """'min' or 'max' — which direction is better for this metric.
    LossSpec wrappers resolve through their display name, so e.g.
    ``SymbolicLoss("r2")`` is maximize-direction like the bare string
    (and ``check_training_loss`` rejects it as a training loss)."""
    if not isinstance(loss_type, str):
        from .specs import LossSpec, loss_name

        if isinstance(loss_type, LossSpec):
            loss_type = loss_name(loss_type)
    name = loss_type if isinstance(loss_type, str) else None
    return "max" if name in MAXIMIZE_METRICS else "min"


def is_better(new: float, best: float, loss_type) -> bool:
    if best_direction(loss_type) == "max":
        return new > best
    return new < best


def check_training_loss(loss_type) -> None:
    """Reject maximize-direction metrics as training losses
    (reference loss_fn.jl:196-205)."""
    if best_direction(loss_type) == "max":
        raise ValueError(
            f"Got a metric defined as `to be maximized` as a training loss: "
            f"{loss_type}. Use a true loss (to be minimized), e.g. 'nseLoss' "
            "(1-NSE), 'kgeLoss' (1-KGE), 'pearsonLoss' (1-Pearson), or 'mse'."
        )
