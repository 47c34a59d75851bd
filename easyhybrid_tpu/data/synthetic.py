"""Synthetic data generators for examples, tests and benchmarks.

Parity: reference ``gen_linear_data`` / ``gen_linear_data_2outputs``
(src/data/synthetic_test_data.jl:4-28) and the RbQ10-style synthetic recipe
used in tests (test/test_split_data_train.jl:15-31) and the book-chapter
example (true Q10 = 2.0).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

__all__ = [
    "gen_linear_data",
    "gen_linear_data_2outputs",
    "gen_rbq10_data",
    "gen_multisite_arrays",
]


def gen_linear_data(n: int = 1000, *, seed: int = 123) -> pd.DataFrame:
    """``obs = a_syn(x2, x3) * x1 + 2 + noise`` with
    ``a_syn = exp(-5 (x2 - 0.7)^2) + x3 / 10`` (reference :4-16)."""
    rng = np.random.default_rng(seed)
    x1, x2, x3 = rng.random((3, n), dtype=np.float32)
    a_syn = np.exp(-5.0 * (x2 - 0.7) ** 2) + x3 / 10.0
    b = 2.0
    obs = a_syn * x1 + b + 0.1 * rng.random(n, dtype=np.float32)
    seq_id = np.repeat(np.arange(1, n // 10 + 1), 10)[:n]
    return pd.DataFrame(
        dict(
            x1=x1,
            x2=x2,
            x3=x3,
            a_syn=a_syn.astype(np.float32),
            obs=obs.astype(np.float32),
            pred_syn=obs.astype(np.float32),
            seqID=seq_id,
        )
    )


def gen_linear_data_2outputs(n: int = 1000, *, seed: int = 123) -> pd.DataFrame:
    """Two-target dynamic variant with per-sequence cumsum dynamics
    (reference :18-28)."""
    rng = np.random.default_rng(seed)
    x1, x2, x3 = rng.random((3, n), dtype=np.float32)
    seq_id = np.repeat(np.arange(1, n // 10 + 1), 10)[:n]
    a_dyn = np.zeros(n, np.float32)
    for sid in np.unique(seq_id):
        m = seq_id == sid
        a_dyn[m] = np.cumsum(x2[m] - x3[m])
    obs_dyn1 = a_dyn * x1 + 2.0
    obs_dyn2 = 0.5 * a_dyn * x2
    return pd.DataFrame(
        dict(
            x1=x1,
            x2=x2,
            x3=x3,
            seqID=seq_id,
            a_dyn_syn=a_dyn,
            obs_dyn1=obs_dyn1.astype(np.float32),
            obs_dyn2=obs_dyn2.astype(np.float32),
        )
    )


def gen_rbq10_data(
    n: int = 20_000,
    *,
    seed: int = 42,
    true_q10: float = 2.0,
    tref: float = 15.0,
    noise: float = 0.1,
    nan_frac: float = 0.0,
) -> pd.DataFrame:
    """Synthetic soil-respiration series with known Q10.

    ``reco = rb(sw_pot) * Q10^((ta - tref)/10) + noise`` with
    ``rb = 3 + 0.02 (sw_pot - mean)`` — the recipe of the reference's
    book-chapter synthetic data (test/test_split_data_train.jl:15-31,
    README quick-start target Q10 ≈ 2.0).
    """
    rng = np.random.default_rng(seed)
    ta = 10.0 + 10.0 * rng.standard_normal(n)
    sw_pot = np.abs(50.0 + 20.0 * rng.standard_normal(n))
    dsw_pot = np.concatenate([[0.0], np.diff(sw_pot)])
    true_rb = 3.0 + 0.02 * (sw_pot - sw_pot.mean())
    reco = true_rb * true_q10 ** (0.1 * (ta - tref)) + noise * rng.standard_normal(n)
    if nan_frac > 0:
        drop = rng.random(n) < nan_frac
        reco = np.where(drop, np.nan, reco)
    return pd.DataFrame(
        dict(
            ta=ta.astype(np.float32),
            sw_pot=sw_pot.astype(np.float32),
            dsw_pot=dsw_pot.astype(np.float32),
            rb_syn=true_rb.astype(np.float32),
            reco=reco.astype(np.float32),
            id=np.arange(1, n + 1),
        )
    )


def gen_multisite_arrays(
    n_sites: int,
    n_obs: int,
    *,
    seed: int = 0,
    nan_frac: float = 0.0,
    site_idx: bool = True,
):
    """Synthetic multi-site arrays in ``prepare_multisite_data``'s layout:
    ``x (S, N, 2)``, forcing ``ta (S, N)``, target ``reco (S, N)``, and —
    when ``site_idx`` — the IDENTITY per-site selector ``_site_idx``.
    Returns :class:`~easyhybrid_tpu.data.prepare.HybridData`.

    The identity selector is load-bearing: the fused multisite kernel maps
    data chunk ``c`` to packed parameter row ``c`` statically, and
    ``supports_fused_multisite`` verifies the data's site order IS the
    identity before selecting the kernel (ops/fused_multisite.py) — every
    bench/tool/test multisite fixture must share this one builder so a
    layout change fails loudly instead of silently flipping them to the
    XLA path."""
    from .prepare import HybridData

    S, N = int(n_sites), int(n_obs)
    rng = np.random.default_rng(seed)
    x = rng.random((S, N, 2)).astype(np.float32)
    forcing = {"ta": (10 + 10 * rng.random((S, N))).astype(np.float32)}
    if site_idx:
        forcing["_site_idx"] = np.broadcast_to(
            np.arange(S, dtype=np.float32)[:, None], (S, N)
        ).copy()
    y = (2 + rng.random((S, N))).astype(np.float32)
    if nan_frac:
        y[rng.random((S, N)) < nan_frac] = np.nan
    return HybridData(x=x, forcing=forcing, y={"reco": y})
