"""Live in-training observability: metric stream, live board, movie.

Parity: the reference's live Makie dashboard machinery — ``TrainDashboard``
observables updated every epoch with an mp4 recorded *during* training
(reference: src/training/dashboard.jl:1-87, ext/EasyHybridMakie.jl:252-478,
src/utils/plotrecipes.jl:51-134) — rebuilt on three channels:

* :class:`MetricStream` — an append-only JSONL file, one line per evaluated
  epoch (losses + tracked params + monitored quantiles). This is the
  headless-friendly channel: tail it, plot it, or parse it in tests.
* :class:`LiveDashboard` — a matplotlib board (loss, zoomed loss,
  per-target pred-vs-obs, monitored-parameter trajectories) redrawn at
  every snapshot; interactively shown when the backend supports it.
* in-training movie — each redraw is captured as an RGB frame; ``finish``
  writes the gif/mp4 at the end of the run (recorded during training, not
  re-rendered post-hoc — ``record_history`` remains the post-hoc analog).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

__all__ = ["MetricStream", "read_metric_stream", "LiveDashboard"]

log = logging.getLogger("easyhybrid_tpu")


class MetricStream:
    """Append-only JSONL metric stream; one line per evaluated epoch."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "w")

    def write_meta(self, **fields: Any) -> None:
        """One leading meta record (e.g. the chosen ``epoch_path`` engine)
        so stream consumers and regression tests can assert which engine
        produced the run."""
        self._f.write(json.dumps({"meta": fields}) + "\n")
        self._f.flush()

    def write(
        self,
        epoch: int,
        snapshot,
        tracked: Optional[Dict[str, float]] = None,
        monitored: Optional[Dict[str, Dict[str, float]]] = None,
    ) -> None:
        record: Dict[str, Any] = {
            "epoch": epoch,
            "train": snapshot.l_train,
            "val": snapshot.l_val,
        }
        if tracked:
            record["tracked"] = tracked
        if monitored:
            record["monitored"] = monitored
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def read_metric_stream(
    path: str, include_meta: bool = False
) -> List[Dict[str, Any]]:
    """Parse a :class:`MetricStream` file back into records. Meta records
    (``write_meta`` lines, e.g. the ``epoch_path`` engine) are filtered out
    unless ``include_meta`` is set."""
    with open(path) as f:
        records = [json.loads(line) for line in f if line.strip()]
    if include_meta:
        return records
    return [r for r in records if "meta" not in r]


class LiveDashboard:
    """Multi-panel live board + frame recorder.

    Panels mirror the reference ``train_board`` (EasyHybridMakie.jl:252-414):
    loss curves (log y), zoomed loss (recent half), per-target val
    pred-vs-obs scatter (subsampled), and monitored/tracked parameter
    trajectories. ``update`` redraws and captures a movie frame;
    ``finish`` saves the final png and writes the recorded movie.
    """

    def __init__(
        self,
        targets: Sequence[str],
        val_obs: Dict[str, np.ndarray],
        *,
        metric: str = "mse",
        agg: str = "sum",
        max_frames: int = 120,
        subsample: int = 10_000,
        show: Optional[bool] = None,
        yscale: str = "log",
    ):
        import matplotlib

        from .plots import _plt

        self.plt = _plt()
        self.targets = list(targets)
        self.metric = metric
        self.agg = agg
        self.yscale = yscale
        self.subsample = subsample
        self.max_frames = max_frames
        self.val_obs = {k: np.asarray(v).ravel() for k, v in val_obs.items()}
        self.epochs: List[int] = []
        self.tr_losses: List[float] = []
        self.va_losses: List[float] = []
        self.param_series: Dict[str, List[float]] = {}
        self.frames: List[np.ndarray] = []
        backend = matplotlib.get_backend().lower()
        self.show = (
            show if show is not None else not backend.startswith("agg")
        )

        ncols = max(3, 1 + len(self.targets))
        self.fig, axes = self.plt.subplots(
            2, ncols, figsize=(4.2 * ncols, 7.5)
        )
        self.axes = np.atleast_2d(axes)
        if self.show:
            self.plt.ion()
            self.fig.show()

    # -- drawing ----------------------------------------------------------
    def _draw(self) -> None:
        ax_loss, ax_zoom = self.axes[0, 0], self.axes[0, 1]
        ax_loss.clear()
        ax_loss.plot(self.epochs, self.tr_losses, label=f"train {self.metric}")
        ax_loss.plot(self.epochs, self.va_losses, label=f"val {self.metric}")
        if (self.yscale == "log"
                and min(self.tr_losses + self.va_losses, default=1.0) > 0):
            ax_loss.set_yscale("log")
        elif self.yscale != "log":
            ax_loss.set_yscale(self.yscale)
        ax_loss.set_xlabel("epoch")
        ax_loss.set_title(f"loss ({self.metric}, {self.agg})")
        ax_loss.legend(frameon=False, fontsize=8)

        ax_zoom.clear()
        half = len(self.epochs) // 2
        if half >= 1:
            ax_zoom.plot(self.epochs[half:], self.va_losses[half:], label="val")
            ax_zoom.set_title("loss (zoom)")
            ax_zoom.legend(frameon=False, fontsize=8)

        ax_par = self.axes[0, 2] if self.axes.shape[1] > 2 else None
        if ax_par is not None:
            ax_par.clear()
            for name, series in self.param_series.items():
                ax_par.plot(self.epochs[-len(series):], series, label=name)
            if self.param_series:
                ax_par.set_title("parameters")
                ax_par.legend(frameon=False, fontsize=8)

    def _draw_scatters(self, y_hat_val) -> None:
        for j, t in enumerate(self.targets):
            if 1 + j >= self.axes.shape[1] + 1:
                break
            ax = self.axes[1, j]
            ax.clear()
            obs = self.val_obs.get(t)
            pred = None if y_hat_val is None else y_hat_val.get(t)
            if obs is None or pred is None:
                continue
            pred = np.asarray(pred).ravel()[: obs.size]
            o = obs[: pred.size]
            m = np.isfinite(o) & np.isfinite(pred)
            if m.sum() > self.subsample:
                idx = np.random.default_rng(0).choice(
                    np.nonzero(m)[0], self.subsample, replace=False
                )
            else:
                idx = np.nonzero(m)[0]
            ax.scatter(o[idx], pred[idx], s=4, alpha=0.35)
            if idx.size:
                lims = [float(np.min(o[idx])), float(np.max(o[idx]))]
                ax.plot(lims, lims, "k--", lw=1)
            ax.set_title(f"{t}: val pred vs obs")

    # -- public API --------------------------------------------------------
    def update(
        self,
        epoch: int,
        snapshot,
        tracked: Optional[Dict[str, float]] = None,
        monitored: Optional[Dict[str, Dict[str, float]]] = None,
    ) -> None:
        self.epochs.append(epoch)
        tr = snapshot.l_train.get(self.metric, {})
        va = snapshot.l_val.get(self.metric, {})
        self.tr_losses.append(float(tr.get(self.agg, np.nan)))
        self.va_losses.append(float(va.get(self.agg, np.nan)))
        for name, v in (tracked or {}).items():
            self.param_series.setdefault(name, []).append(float(v))
        for name, q in (monitored or {}).items():
            self.param_series.setdefault(f"{name} q50", []).append(
                float(q.get("q50", np.nan))
            )
        self._draw()
        self._draw_scatters(getattr(snapshot, "y_hat_val", None))
        self.fig.tight_layout()
        if self.show:
            self.fig.canvas.draw_idle()
            self.plt.pause(0.001)
        if len(self.frames) < self.max_frames:
            self.fig.canvas.draw()
            buf = np.asarray(self.fig.canvas.buffer_rgba())
            # store PNG-compressed (~50 kB) instead of raw RGB (~2.8 MB):
            # bounds a 120-frame movie at a few MB of host memory
            self.frames.append(_encode_frame(buf[..., :3]))

    def finish(
        self,
        png_path: Optional[str] = None,
        movie_path: Optional[str] = None,
        fps: int = 5,
    ) -> Optional[str]:
        """Save the final board png and the in-training movie; returns the
        movie path actually written (gif fallback when ffmpeg is absent)."""
        written = None
        if png_path:
            self.fig.savefig(png_path, dpi=120, bbox_inches="tight")
        if movie_path and len(self.frames) >= 2:
            written = _write_movie(self.frames, movie_path, fps=fps)
        self.plt.close(self.fig)
        return written


def _encode_frame(rgb: np.ndarray) -> bytes:
    """RGB array → PNG bytes (lossless, ~50× smaller than raw)."""
    import io

    from PIL import Image

    bio = io.BytesIO()
    Image.fromarray(rgb).save(bio, format="PNG")
    return bio.getvalue()


def _decode_frame(fr) -> np.ndarray:
    if isinstance(fr, (bytes, bytearray)):
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(fr)).convert("RGB"))
    return fr


def _write_movie(frames: List, path: str, fps: int = 5) -> str:
    """Write frames (RGB arrays or PNG bytes) as .mp4 (ffmpeg) or .gif
    (pillow fallback). Frames are decoded one at a time on the mp4 path."""
    first = _decode_frame(frames[0])
    if path.endswith(".mp4"):
        try:
            import matplotlib.animation as animation

            if animation.FFMpegWriter.isAvailable():
                import matplotlib.pyplot as plt

                h, w = first.shape[:2]
                fig = plt.figure(figsize=(w / 100, h / 100), dpi=100)
                ax = fig.add_axes([0, 0, 1, 1])
                ax.axis("off")
                im = ax.imshow(first)
                writer = animation.FFMpegWriter(fps=fps)
                with writer.saving(fig, path, dpi=100):
                    for fr in frames:
                        im.set_data(_decode_frame(fr))
                        writer.grab_frame()
                plt.close(fig)
                return path
        except Exception as e:
            log.warning("mp4 writer failed (%s); falling back to gif", e)
        path = path.rsplit(".", 1)[0] + ".gif"
    from PIL import Image

    imgs = [Image.fromarray(_decode_frame(fr)) for fr in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path
