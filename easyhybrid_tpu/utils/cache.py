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

    # On the remote/tunneled TPU deployment the persistent cache is a TRAP
    # for large programs: deserialized executables pay a first-EXECUTION
    # penalty of minutes (measured 1285 s for the whole-training scan
    # program vs 14.5 s compile+run when freshly compiled — the remote
    # terminal appears to re-stage/validate loaded binaries through a slow
    # path). A fresh remote compile is ~10-15 s, so TPU runs are strictly
    # better off recompiling per process. The cache stays on for the CPU
    # backend (pure win there: tests/dev loops). Force with
    # EASYHYBRID_COMPILATION_CACHE=1.
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and os.environ.get("EASYHYBRID_COMPILATION_CACHE") != "1":
        _install_deterministic_mosaic_serialization()
        _ENABLED = True
        log.debug("persistent compilation cache disabled on TPU backend")
        return None

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
        _install_deterministic_mosaic_serialization()
        _ENABLED = True
        log.debug("persistent compilation cache at %s", cache_dir)
        return cache_dir
    except Exception as e:  # cache is an optimization, never fatal
        log.warning("could not enable compilation cache: %s", e)
        _ENABLED = True
        return None


def _install_deterministic_mosaic_serialization() -> None:
    """Make Pallas/Mosaic custom-call payloads byte-deterministic so they
    hit the persistent compilation cache across processes.

    The Mosaic module serialized into ``tpu_custom_call``'s backend config
    embeds MLIR debug locations whose source SPANS vary between traces of
    the same kernel (verified by deparsing two payloads of an identical
    kernel: the modules are bit-identical after ``strip-debuginfo``; only
    the location tables differ). Since the persistent cache key hashes the
    serialized HLO including this opaque payload, every process missed the
    cache and re-ran the 10-15 s Mosaic compile. Stripping debug info
    before serialization costs only source lines in Mosaic error messages.
    Disable with ``EASYHYBRID_STRIP_MOSAIC_LOCS=0``."""
    if os.environ.get("EASYHYBRID_STRIP_MOSAIC_LOCS") == "0":
        return
    try:
        from jax._src import tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager
    except ImportError:  # pragma: no cover - jax internals moved
        log.debug("mosaic serialization patch: jax internals unavailable")
        return
    orig = getattr(tcc, "_lower_mosaic_module_to_asm", None)
    if orig is None or getattr(orig, "_eh_stripped", False):
        return

    def stripped(module, **kwargs):
        try:
            with module.context as ctx:
                prev = ctx.allow_unregistered_dialects
                ctx.allow_unregistered_dialects = True
                try:
                    PassManager.parse(
                        "builtin.module(strip-debuginfo)"
                    ).run(module.operation)
                finally:
                    ctx.allow_unregistered_dialects = prev
        except Exception as e:  # pragma: no cover - never break lowering
            log.debug("strip-debuginfo pass failed (%s); payload may miss "
                      "the persistent cache", e)
        return orig(module, **kwargs)

    stripped._eh_stripped = True
    tcc._lower_mosaic_module_to_asm = stripped
