"""YAML round-trip of the full run configuration.

Parity: reference config_yaml.jl — ``save_hybrid_config``/
``load_hybrid_config`` (:4-10), parameter table serialization (:33-45), and
mechanistic-model source extraction (:58-115, via ``Base.functionloc``;
here via ``inspect.getsource``).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Dict, Optional

__all__ = [
    "get_full_config",
    "save_hybrid_config",
    "load_hybrid_config",
    "get_mechanistic_model_config",
    "get_parameters_config",
]


def _try_extract_function_source(fn) -> Optional[str]:
    """Best-effort source text of the mechanistic function (parity:
    ``_try_extract_function_source``, config_yaml.jl:89-115)."""
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):
        return None


def get_mechanistic_model_config(model) -> Dict[str, Any]:
    fn = model.mechanistic_model
    return {
        "name": getattr(fn, "__name__", str(fn)),
        "module": getattr(fn, "__module__", None),
        "source": _try_extract_function_source(fn),
    }


def get_parameters_config(model) -> Dict[str, Dict[str, float]]:
    return model.parameters.as_dict()


def _plain(v):
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _plain(x) for k, x in v.items()}
    if callable(v):
        return getattr(v, "__name__", str(v))
    if hasattr(v, "item"):
        return v.item()
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def get_full_config(model, cfg=None, data_cfg=None) -> Dict[str, Any]:
    """Full run configuration (parity: ``get_full_config``,
    config_yaml.jl:125-133)."""
    out: Dict[str, Any] = {
        "model": {
            "type": type(model).__name__,
            "predictors": _plain(model.predictors),
            "forcing": _plain(model.forcing),
            "targets": _plain(model.targets),
            "neural_param_names": _plain(model.neural_param_names),
            "global_param_names": _plain(model.global_param_names),
            "fixed_param_names": _plain(model.fixed_param_names),
            "scale_nn_outputs": model.scale_nn_outputs,
            "start_from_default": model.start_from_default,
            "config": _plain(dict(model.config)),
        },
        "parameters": get_parameters_config(model),
        "mechanistic_model": get_mechanistic_model_config(model),
    }
    if cfg is not None:
        out["train_config"] = _plain(dataclasses.asdict(cfg))
    if data_cfg is not None:
        out["data_config"] = _plain(dataclasses.asdict(data_cfg))
    return out


def save_hybrid_config(path: str, model, cfg=None, data_cfg=None) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(get_full_config(model, cfg, data_cfg), f, sort_keys=False)


def load_hybrid_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
