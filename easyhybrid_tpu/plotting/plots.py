"""Post-hoc plots + training dashboard (matplotlib, lazily imported).

Parity: the reference's Makie extension plot set (ext/EasyHybridMakie.jl):
``poplot`` pred-vs-obs with modeling efficiency (:53-184), ``plot_loss``
(:203-220, :504-594), ``plot_parameters`` (:609-665),
``plot_training_summary`` (:706-735) and the multi-panel ``train_board``
(:252-414) — rendered headlessly to files instead of a live Makie window.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import numpy as np

log = logging.getLogger("easyhybrid_tpu")

__all__ = [
    "poplot",
    "plot_population",
    "plot_loss",
    "plot_parameters",
    "plot_training_summary",
    "train_board",
    "record_history",
]


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "matplotlib is required for plotting; install it or disable "
            "plotting (cfg.plotting=False)"
        ) from e


def _modeling_efficiency(obs, pred):
    m = np.isfinite(obs) & np.isfinite(pred)
    obs, pred = obs[m], pred[m]
    if len(obs) < 2:
        return float("nan")
    return 1.0 - np.sum((obs - pred) ** 2) / np.sum((obs - obs.mean()) ** 2)


def poplot(
    obs,
    pred,
    *,
    target: str = "target",
    ax=None,
    max_points: int = 10_000,
    save: Optional[str] = None,
):
    """Pred-vs-obs scatter with 1:1 line and modeling efficiency
    (parity: poplot, EasyHybridMakie.jl:53-102)."""
    plt = _plt()
    obs = np.asarray(obs).ravel()
    pred = np.asarray(pred).ravel()
    if len(obs) > max_points:  # 10k-point subsample like the dashboard
        idx = np.random.default_rng(0).choice(len(obs), max_points, replace=False)
        obs, pred = obs[idx], pred[idx]
    if ax is None:
        fig, ax = plt.subplots(figsize=(5, 5))
    else:
        fig = ax.figure
    ax.scatter(obs, pred, s=4, alpha=0.4, linewidths=0)
    # nan-aware: obs typically carries NaN at masked rows — a plain .min()
    # would turn the limits NaN and silently drop the 1:1 line
    lims = [
        np.nanmin([np.nanmin(obs), np.nanmin(pred)]),
        np.nanmax([np.nanmax(obs), np.nanmax(pred)]),
    ]
    ax.plot(lims, lims, "k--", lw=1, label="1:1")
    mef = _modeling_efficiency(obs, pred)
    ax.set_xlabel(f"observed {target}")
    ax.set_ylabel(f"predicted {target}")
    ax.set_title(f"{target}  (MEF = {mef:.3f})")
    ax.legend(frameon=False)
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return ax


def plot_loss(
    history,
    *,
    metric: Optional[str] = None,
    yscale: str = "log",
    ax=None,
    save: Optional[str] = None,
):
    """Train/val loss curves (parity: plot_loss, :203-220).

    ``history`` is a TrainingHistory or a TrainResults."""
    plt = _plt()
    hist = getattr(history, "history", history)
    metric = metric or next(iter(hist[0].l_train))
    train = hist.series(metric, "train")
    val = hist.series(metric, "val")
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 4))
    else:
        fig = ax.figure
    epochs = np.arange(len(hist))
    for key, ys in train.items():
        ax.plot(epochs, ys, label=f"train {key}", lw=1.2)
    for key, ys in val.items():
        ax.plot(epochs, ys, "--", label=f"val {key}", lw=1.2)
    try:
        ax.set_yscale(yscale)
    except ValueError:
        pass
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric)
    ax.legend(frameon=False, fontsize=8)
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return ax


def plot_parameters(
    tracked: Dict[str, Sequence[float]],
    *,
    truths: Optional[Dict[str, float]] = None,
    ax=None,
    save: Optional[str] = None,
):
    """Physical-parameter trajectories over epochs
    (parity: plot_parameters, :609-665)."""
    plt = _plt()
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 4))
    else:
        fig = ax.figure
    for name, series in tracked.items():
        ax.plot(np.arange(len(series)), series, label=name, lw=1.5)
        if truths and name in truths:
            ax.axhline(truths[name], ls=":", c="gray", lw=1)
    ax.set_xlabel("epoch")
    ax.set_ylabel("parameter value")
    ax.legend(frameon=False)
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return ax


def train_board(results, *, save: Optional[str] = None, yscale: str = "log"):
    """Multi-panel board: loss + zoomed loss + per-target pred-vs-obs
    (parity: train_board, :252-414). ``yscale`` is the loss-axis scale
    (``TrainConfig.yscale`` is plumbed through here)."""
    plt = _plt()
    targets = [c for c in results.train_obs.columns if c not in ("sample", "step")]
    ncols = max(2, len(targets))
    fig, axes = plt.subplots(2, ncols, figsize=(4.5 * ncols, 8))
    axes = np.atleast_2d(axes)
    plot_loss(results, ax=axes[0, 0], yscale=yscale)
    # zoomed loss: second half of training
    hist = results.history
    if len(hist) > 4:
        metric = next(iter(hist[0].l_val))
        val = hist.series(metric, "val")
        half = len(hist) // 2
        for key, ys in val.items():
            axes[0, 1].plot(np.arange(half, len(hist)), ys[half:], label=f"val {key}")
        axes[0, 1].set_title("loss (zoom)")
        axes[0, 1].legend(frameon=False, fontsize=8)
    for j, t in enumerate(targets):
        ax_tr = axes[1, j] if j < ncols else None
        if ax_tr is None:
            break
        pred_col = f"{t}_pred"
        if pred_col in results.train_pred.columns:
            poplot(
                results.train_obs[t].to_numpy(),
                results.train_pred[pred_col].to_numpy(),
                target=t,
                ax=ax_tr,
            )
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return fig


def record_history(results, *, save: str, fps: int = 5, max_frames: int = 100):
    """Animate the loss trajectory + pred-vs-obs over epochs into a movie.

    Parity: the reference's dashboard mp4 recording (``record_or_run`` /
    ``Makie.record``, dashboard.jl:79-87) — rendered post-hoc from the
    stored history. Writes .gif (pillow) or .mp4 (needs ffmpeg).
    Per-epoch predictions require ``keep_history=True``; otherwise only the
    loss panel animates.
    """
    plt = _plt()
    from matplotlib import animation

    hist = results.history
    n = min(len(hist), max_frames)
    frame_ids = np.linspace(0, len(hist) - 1, n).astype(int)
    metric = next(iter(hist[0].l_val))
    val = hist.series(metric, "val")
    targets = [c for c in results.train_obs.columns if c not in ("sample", "step")]
    t0 = targets[0]

    fig, (ax_loss, ax_po) = plt.subplots(1, 2, figsize=(10, 4))

    def draw(i):
        epoch = frame_ids[i]
        ax_loss.clear()
        for key, ys in val.items():
            ax_loss.plot(np.arange(epoch + 1), ys[: epoch + 1], label=f"val {key}")
        ax_loss.set_xlim(0, len(hist))
        ax_loss.set_title(f"epoch {epoch}")
        ax_loss.set_yscale("log")
        ax_loss.legend(frameon=False, fontsize=8)
        ax_po.clear()
        snap = hist[epoch]
        if snap.y_hat_val is not None and t0 in snap.y_hat_val:
            obs = results.val_obs[t0].to_numpy()
            pred = np.asarray(snap.y_hat_val[t0]).ravel()[: len(obs)]
            m = np.isfinite(obs[: len(pred)])
            ax_po.scatter(obs[: len(pred)][m], pred[m], s=4, alpha=0.4)
            lims = [np.nanmin(obs), np.nanmax(obs)]
            ax_po.plot(lims, lims, "k--", lw=1)
            ax_po.set_title(f"{t0} pred vs obs")

    anim = animation.FuncAnimation(fig, draw, frames=n, interval=1000 // fps)
    writer = "pillow" if save.endswith(".gif") else "ffmpeg"
    try:
        anim.save(save, writer=writer, fps=fps)
    except (ValueError, FileNotFoundError):
        gif = save.rsplit(".", 1)[0] + ".gif"
        log.warning("%s writer unavailable; writing %s instead", writer, gif)
        anim.save(gif, writer="pillow", fps=fps)
        save = gif
    plt.close(fig)
    return save


def plot_training_summary(results, *, save: Optional[str] = None):
    """Loss + parameter trajectories + val pred-vs-obs in one figure
    (parity: plot_training_summary, :706-735)."""
    plt = _plt()
    targets = [c for c in results.train_obs.columns if c not in ("sample", "step")]
    grad_history = getattr(results, "grad_history", None)
    n_panels = 2 + len(targets) + (1 if grad_history else 0)
    fig, axes = plt.subplots(1, n_panels, figsize=(5 * n_panels, 4))
    axes = np.atleast_1d(axes)
    plot_loss(results, ax=axes[0])
    if grad_history:
        gax = axes[-1]
        keys = sorted({k for g in grad_history for k in g})
        for k in keys:
            gax.plot([g.get(k, np.nan) for g in grad_history], label=k)
        gax.set_yscale("log")
        gax.set_xlabel("snapshot")
        gax.set_ylabel("grad L2 norm")
        gax.set_title("gradient norms")
        gax.legend(fontsize=8)
    diffs = results.val_diffs or {}
    tracked = {}
    params = diffs.get("parameters", {})
    for name, v in params.items():
        arr = np.asarray(v)
        if arr.size == 1:
            tracked[name] = [float(arr.ravel()[0])]
    if tracked:
        plot_parameters(tracked, ax=axes[1])
    for j, t in enumerate(targets):
        pred_col = f"{t}_pred"
        if pred_col in results.val_pred.columns:
            poplot(
                results.val_obs[t].to_numpy(),
                results.val_pred[pred_col].to_numpy(),
                target=t,
                ax=axes[2 + j],
            )
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return fig


def plot_population(pop, *, metric: Optional[str] = None, yscale: str = "log",
                    save: Optional[str] = None):
    """Per-member validation trajectories of a population/CV run, the best
    member highlighted with its best epoch marked. ``pop`` is a
    :class:`~easyhybrid_tpu.training.population.PopulationResults`.
    No reference analog (populations are a TPU-native addition)."""
    plt = _plt()
    metric = metric or pop.monitor
    hist = pop.val_history[metric]  # (n_evals, K)
    fig, ax = plt.subplots(figsize=(6.5, 4))
    n_evals, K = hist.shape
    for m in range(K):
        is_best = m == pop.best_member
        label = None
        if is_best:
            bits = [f"member {m}"]
            if pop.hyper:
                bits += [
                    f"{k}={float(v[m]):.3g}" for k, v in pop.hyper.items()
                ]
            label = "best: " + ", ".join(bits)
        ax.plot(
            pop.epochs, hist[:, m],
            lw=2.0 if is_best else 0.9,
            alpha=1.0 if is_best else 0.45,
            color="C1" if is_best else "C0",
            label=label,
            zorder=3 if is_best else 2,
        )
    # the best marker must live ON the plotted metric's curve: best_epochs
    # tracks the MONITOR, so place the marker at that epoch's row of the
    # displayed metric; a best at the (unplotted) epoch-0 baseline gets no
    # marker rather than a point detached from every curve
    best_ep = int(pop.best_epochs[pop.best_member])
    row = np.searchsorted(pop.epochs, best_ep)
    if best_ep > 0 and row < n_evals and pop.epochs[row] == best_ep:
        ax.scatter(
            [best_ep], [hist[row, pop.best_member]],
            color="C1", marker="o", zorder=4,
        )
    # log is unusable for non-positive metrics (matplotlib silently masks
    # the points away); fall back to linear for those
    if yscale == "log" and np.nanmin(hist) <= 0:
        yscale = "linear"
    try:
        ax.set_yscale(yscale)
    except ValueError:
        pass
    ax.set_xlabel("epoch")
    ax.set_ylabel(f"val {metric}")
    ax.set_title(f"population ({K} members)")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
    return fig
