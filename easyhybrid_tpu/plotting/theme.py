"""EasyHybrid plot theme — matplotlib port of the reference Makie theme.

Parity: ``hybrid_colors`` / ``theme_easy_hybrid`` (reference
ext/HybridTheme.jl:1-96, credited there to Lazaro Alonso). The Makie
``Theme`` attributes map onto matplotlib rcParams: the 7-color palette and
covarying color/marker/linestyle cycles become a composed ``cycler``, the
dashed major/minor grid, inward ticks, serif font, 16 pt base size,
600×400 figure and plasma colormap carry over directly.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, List, Tuple

__all__ = ["hybrid_colors", "theme_easy_hybrid", "use_theme", "set_theme"]

#: reference palette (HybridTheme.jl:2-7): black, sky blue, raspberry,
#: gold, purple, green, grey
_COLORS: List[Tuple[float, float, float]] = [
    (0.0, 0.0, 0.0),
    (0.082, 0.643, 0.918),
    (0.91, 0.122, 0.361),
    (0.929, 0.773, 0.0),
    (0.588, 0.196, 0.722),
    (0.361, 0.722, 0.361),
    (0.522, 0.522, 0.522),
]

_MARKERS = ["o", "^", "s", "D", "v", "d", "p"]  # HybridTheme.jl:18
_LINESTYLES = ["-", "--", ":", "-.", (0, (3, 1, 1, 1, 1, 1)), "--", "-"]


def hybrid_colors(alpha: float = 1.0) -> List[Tuple[float, float, float, float]]:
    """The 7-color EasyHybrid palette as RGBA tuples
    (parity: HybridTheme.jl:1-9)."""
    return [(r, g, b, alpha) for r, g, b in _COLORS]


def theme_easy_hybrid() -> Dict:
    """rcParams dict for the EasyHybrid look
    (parity: theme_easy_hybrid, HybridTheme.jl:17-96)."""
    from cycler import cycler

    colors = hybrid_colors(0.8)
    prop_cycle = (
        cycler(color=colors)
        + cycler(marker=_MARKERS)
        + cycler(linestyle=_LINESTYLES)
    )
    return {
        "axes.prop_cycle": prop_cycle,
        "font.family": "serif",
        "font.size": 16,
        "figure.figsize": (6.0, 4.0),
        "image.cmap": "plasma",
        "axes.grid": True,
        "axes.grid.which": "both",
        "grid.linestyle": "--",
        "grid.alpha": 0.4,
        "xtick.direction": "in",
        "ytick.direction": "in",
        "xtick.major.size": 10,
        "ytick.major.size": 10,
        "xtick.minor.visible": True,
        "ytick.minor.visible": True,
        "axes.linewidth": 0.5,
        "axes.titleweight": "normal",
        "legend.framealpha": 0.5,
        "legend.edgecolor": "0.35",
        "legend.facecolor": "white",
        "lines.markersize": 6,
        "patch.linewidth": 0.5,
    }


def set_theme() -> None:
    """Apply the EasyHybrid theme globally
    (analog of ``Makie.set_theme!(theme_easy_hybrid())``)."""
    import matplotlib

    matplotlib.rcParams.update(theme_easy_hybrid())


@contextmanager
def use_theme():
    """Context manager applying the theme to plots made inside the block."""
    import matplotlib

    with matplotlib.rc_context(theme_easy_hybrid()):
        yield
