"""Observability: profiler traces, step timing, NaN checking, shard asserts.

The reference has no profiling/sanitizer subsystem (SURVEY.md §5: absent;
user-level BenchmarkTools only). TPU-native equivalents provided here:

* :func:`trace` — ``jax.profiler`` trace context manager (view in
  TensorBoard / xprof);
* :class:`StepTimer` — wall-clock per-step/per-epoch timing with summary
  stats, used for quick throughput measurements;
* :func:`debug_nans` — scoped ``jax_debug_nans`` toggle (the analog of the
  reference tests' ``GPUArraysCore.allowscalar(false)`` safety switch);
* :func:`assert_sharding` — verify an array's sharding matches an expected
  PartitionSpec (shard-shape assertions for the parallel layer).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import jax

__all__ = ["trace", "StepTimer", "debug_nans", "assert_sharding"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/easyhybrid_trace", *, create_perfetto_link=False):
    """Profile the enclosed block with ``jax.profiler.trace``."""
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield log_dir


class StepTimer:
    """Accumulates wall-clock timings; blocks on device completion."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def block_and_stop(self, value):
        """Block on ``value`` (device array/pytree) then record the time."""
        jax.block_until_ready(value)
        self.__exit__()

    @property
    def total(self) -> float:
        return sum(self.times)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        return {
            "count": len(self.times),
            "total_s": self.total,
            "mean_s": statistics.mean(self.times),
            "median_s": statistics.median(self.times),
            "min_s": min(self.times),
            "max_s": max(self.times),
        }

    def __repr__(self):
        s = self.summary()
        if not s:
            return "StepTimer(empty)"
        return (
            f"StepTimer(n={s['count']}, mean={s['mean_s']*1e3:.2f}ms, "
            f"median={s['median_s']*1e3:.2f}ms, total={s['total_s']:.2f}s)"
        )


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Scoped ``jax_debug_nans``: raise on the first NaN produced on device."""
    with jax.debug_nans(enabled):
        yield


def assert_sharding(array, mesh, spec) -> None:
    """Assert ``array`` is sharded as ``NamedSharding(mesh, spec)``."""
    from jax.sharding import NamedSharding

    expected = NamedSharding(mesh, spec)
    actual = getattr(array, "sharding", None)
    if actual is None:
        raise AssertionError("array has no sharding (not a jax.Array?)")
    if not actual.is_equivalent_to(expected, array.ndim):
        raise AssertionError(
            f"sharding mismatch: expected {expected}, got {actual}"
        )
