"""Weight extraction and L2 regularization over parameter pytrees.

Parity: reference ``extract_weights``/``weight_l2``
(src/utils/extract_weights.jl:31-91) — collect weight-matrix leaves from the
params tree and compute a (optionally normalized) fused L2 penalty, intended
as an ``extra_loss``. Differentiable end-to-end through ``jax.grad``.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp

__all__ = ["extract_weights", "weight_l2", "l2_extra_loss"]


def extract_weights(params: Any, key: str = "w") -> List[jnp.ndarray]:
    """All leaves stored under dict key ``key`` (default the Dense weight
    matrices ``"w"``), walked in deterministic pytree order."""
    found: List[jnp.ndarray] = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == key and not isinstance(v, dict):
                    found.append(v)
                else:
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return found


def weight_l2(params: Any, *, normalize: bool = True, key: str = "w"):
    """Fused L2 norm over all weight leaves; ``normalize`` divides by the
    total number of weight entries (parity: weight_l2, extract_weights.jl)."""
    weights = extract_weights(params, key)
    if not weights:
        return jnp.asarray(0.0, jnp.float32)
    total = sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in weights)
    if normalize:
        count = sum(w.size for w in weights)
        total = total / count
    return total


def l2_extra_loss(scale: float = 1.0, *, normalize: bool = True, key: str = "w"):
    """Build an ``extra_loss`` callable ``(outputs, params) -> scalar``.

    The returned closure carries a declarative ``_l2_spec`` so the fused
    Pallas epoch kernel can add the penalty (value and symbolic gradient
    ``2·scale·w/count``) without reverse-mode AD; arbitrary ``extra_loss``
    callables fall back to the XLA scan epoch."""

    def extra(outputs, params):
        return scale * weight_l2(params, normalize=normalize, key=key)

    extra.__name__ = "weight_l2"
    extra._l2_spec = {"scale": float(scale), "normalize": bool(normalize), "key": key}
    return extra
