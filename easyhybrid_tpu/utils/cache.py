"""Persistent XLA compilation cache.

The dominant cost of a cold quick-start run is jit compilation (tens of
seconds per program on a remote-compile TPU), not device compute. Enabling
JAX's persistent compilation cache makes every later run with the same
shapes/program hit the on-disk cache and start in ~1s. No reference
counterpart (Julia caches natively via precompilation); TPU-native
requirement from BASELINE wall-clock-to-MSE.
"""

from __future__ import annotations

import logging
import os

__all__ = ["enable_compilation_cache"]

log = logging.getLogger("easyhybrid_tpu")

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache (idempotent).

    Cache dir priority: explicit arg > ``EASYHYBRID_CACHE_DIR`` env >
    ``~/.cache/easyhybrid_tpu/xla``. Set ``EASYHYBRID_NO_COMPILATION_CACHE=1``
    to disable entirely."""
    global _ENABLED
    if _ENABLED:
        return None
    if os.environ.get("EASYHYBRID_NO_COMPILATION_CACHE") == "1":
        _ENABLED = True
        return None
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("EASYHYBRID_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "easyhybrid_tpu", "xla"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
        log.debug("persistent compilation cache at %s", cache_dir)
        return cache_dir
    except Exception as e:  # cache is an optimization, never fatal
        log.warning("could not enable compilation cache: %s", e)
        _ENABLED = True
        return None
