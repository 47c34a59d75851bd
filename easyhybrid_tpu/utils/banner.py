"""Startup banner (parity: reference src/utils/print_banner.py:27-91 —
ASCII banner + version on interactive load, env-toggled)."""

from __future__ import annotations

import os
import sys

from ..version import __version__

__all__ = ["print_banner", "BANNER"]

BANNER = r"""
  ___  __ _ ___ _  _| |_ _  _| |__ _ _(_)__| |  — on TPU
 / -_)/ _` (_-<| || |  _| || | '_ \ '_| / _` |  NN ∘ mechanistic hybrid
 \___|\__,_/__/ \_, |\__|\_, |_.__/_| |_\__,_|  modeling, jax/XLA/pallas
                |__/     |__/                   v{version}
"""


def print_banner(force: bool = False) -> None:
    """Print the banner on interactive sessions unless
    ``EASYHYBRID_PRINT_BANNER=0`` (env toggle parity: print_banner.jl:88)."""
    toggle = os.environ.get("EASYHYBRID_PRINT_BANNER", "").lower()
    if toggle in ("0", "false", "no"):
        return
    if not force and not (hasattr(sys, "ps1") or toggle in ("1", "true", "yes")):
        return
    print(BANNER.format(version=__version__))
