"""Loss assembly: per-target masked losses + aggregation, train & eval modes.

Parity with the reference's ``compute_loss`` / ``_compute_loss`` /
``assemble_loss`` (reference: src/losses/compute_loss.jl:20-160) including
prediction/target sequence-window alignment (:88-113) and the PerTarget path
(:128-145). Everything here is jit-traceable: train mode returns a scalar
suitable for ``jax.value_and_grad``; eval mode returns a nested dict of
metrics pytree-compatible with ``jax.jit``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp

from .specs import LoggingLoss, PerTarget, loss_name, to_loss_spec

__all__ = ["compute_loss", "assemble_loss", "align_prediction"]


def align_prediction(y_hat, y):
    """Align a prediction's time axis to the target's output window.

    For sequence models the NN emits per-parameter series over the full
    ``input_window`` while targets cover only ``output_window`` trailing
    steps; subset the prediction to the trailing window (correct for
    ``lead_time`` handled at windowing). Parity: ``_get_target_ŷ``
    (reference compute_loss.jl:104-110) — static trailing slice under jit.
    """
    y_arr = y[0] if isinstance(y, tuple) else y
    if y_hat.ndim >= 2 and y_arr.ndim >= 2 and y_hat.shape[1] != y_arr.shape[1]:
        nout = y_arr.shape[1]
        return y_hat[:, -nout:, ...]
    return y_hat


def _get_output(outputs: Mapping[str, Any], target: str):
    if target not in outputs:
        raise KeyError(
            f"mechanistic model did not produce target {target!r}; "
            f"outputs: {sorted(k for k in outputs if k not in ('parameters', 'nn_outputs'))}"
        )
    return outputs[target]


def _target_mask(y, mask, target: str):
    if mask is None:
        y_arr = y[0] if isinstance(y, tuple) else y
        return jnp.isfinite(y_arr)
    if isinstance(mask, Mapping):
        return mask[target]
    return mask


def assemble_loss(
    outputs: Mapping[str, Any],
    y: Mapping[str, Any],
    mask,
    targets: Tuple[str, ...],
    spec,
):
    """Per-target loss list for one spec (or a PerTarget bundle).

    Parity: ``assemble_loss`` (reference compute_loss.jl:115-145)."""
    spec = to_loss_spec(spec) if not isinstance(spec, PerTarget) else spec
    if isinstance(spec, PerTarget):
        if len(spec.losses) != len(targets):
            raise ValueError(
                f"PerTarget has {len(spec.losses)} losses but there are "
                f"{len(targets)} targets"
            )
        specs = spec.losses
    else:
        specs = (spec,) * len(targets)

    losses = []
    for target, sp in zip(targets, specs):
        y_t = y[target]
        y_arr = y_t[0] if isinstance(y_t, tuple) else y_t
        y_hat_t = align_prediction(_get_output(outputs, target), y_t)
        m_t = _target_mask(y_t, mask, target)
        losses.append(sp(y_hat_t, y_t if isinstance(y_t, tuple) else y_arr, m_t))
    return losses


def compute_loss(
    model,
    params,
    state,
    batch,
    logging: LoggingLoss,
):
    """Main loss entry for hybrid models.

    ``batch = ((x, forcing), (y, mask))`` where ``y`` maps target name →
    array (or ``(y_obs, sigma)`` tuple) and ``mask`` maps target name → bool
    validity array (finite & non-padding) or is None (computed from finiteness).

    * train mode → ``(scalar_loss, new_state)``
    * eval mode → ``(metrics_dict, new_state, outputs)`` with
      ``metrics_dict[loss_name][target]`` and ``metrics_dict[loss_name][agg]``.

    Parity: reference ``compute_loss`` (compute_loss.jl:20-48).
    """
    inputs, (y, mask) = batch
    targets = model.targets
    agg = logging.agg_fn

    if logging.train_mode:
        outputs, new_state = model.apply(params, state, inputs, training=True)
        losses = assemble_loss(outputs, y, mask, targets, logging.training_loss)
        loss_value = agg(losses)
        if logging.extra_loss is not None:
            extra = logging.extra_loss(outputs, params)
            if isinstance(extra, Mapping):
                loss_value = agg([loss_value, *extra.values()])
            else:
                loss_value = agg([loss_value, extra])
        return loss_value, new_state

    outputs, new_state = model.apply(params, state, inputs, training=False)
    metrics: Dict[str, Dict[str, Any]] = {}
    for lt in logging.loss_types:
        losses = assemble_loss(outputs, y, mask, targets, lt)
        entry = {t: l for t, l in zip(targets, losses)}
        entry[logging.agg_name] = agg(losses)
        metrics[loss_name(lt)] = entry
    if logging.extra_loss is not None:
        extra = logging.extra_loss(outputs, params)
        if not isinstance(extra, Mapping):
            extra = {"extra": extra}
        entry = dict(extra)
        entry[logging.agg_name] = agg(list(extra.values()))
        metrics["extra_loss"] = entry
    return metrics, new_state, outputs
