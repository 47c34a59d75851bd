"""RbQ10 on a REAL soil-respiration CSV — the full measurement workflow.

Python port of the reference's real-data RbQ10 project
(``projects/RbQ10/Q10.jl:1-124`` driving
``projects/RbQ10/data/prec_process_data.jl``, ``data/g_pot.jl`` and the
SSA gap-filling of ``data/fill_csv.R``):

1. **Ingestion** — a half-hourly chamber-respiration CSV with
   ``year/month/day/hour`` columns, chamber temperature, soil moisture and
   total soil respiration (``s_rtot``). Point ``EASYHYBRID_RESP_CSV`` at
   the Heinemeyer ``RESP_07_08_09_10`` file to run on the real data; when
   the file is absent (e.g. CI) a statistically matched surrogate with a
   KNOWN ``Q10 = 2`` is synthesized so the workflow still executes and the
   recovered Q10 can be checked.
2. **Preprocessing** (``prec_process_data.jl:1-56``) — timestamps →
   fractional year, potential radiation ``rgpot`` from the solar-geometry
   model (``g_pot.jl:1-41``) clipped at 0 (``rgpot2``), negative
   respiration flux → NaN (masked, not dropped), column renames.
3. **Gap-filling** (``fill_csv.R:1-47``) — the reference fills sensor gaps
   with singular-spectrum analysis (R ``spectral.methods::gapfillSSA``,
   window M=120). Ported here as a diurnal-climatology fill (mean diurnal
   cycle per ~2-week window) + linear interpolation of the residual — the
   same role (smooth, periodicity-aware reconstruction) with only numpy.
4. **Training** — MLP [15, 15] relu predicts base respiration ``Rb`` from
   filled moisture + potential radiation; global ``Q10`` on chamber
   temperature (the ``RespirationRbQ10`` physics); ``monitor_names=[Rb]``.
5. **Custom pinball loss** (``Q10.jl:56-99``) — trained and logged with
   the quantile (τ=0.9) pinball loss in BOTH the kwargs and positional
   custom-loss forms.
6. **Checkpoint reload + plots** — the run is saved, the best checkpoint
   re-loaded for a warm start, and pred-vs-obs (``poplot``) + loss curves
   are written next to the checkpoints.

Run: python examples/rbq10_realdata.py
Env: EASYHYBRID_RESP_CSV=/path/to/RESP_07_08_09_10_filled.csv (optional)
     EASYHYBRID_EXAMPLE_EPOCHS=5 (CI knob; default 60)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh

NEPOCHS = int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "60"))
LAT, LON = 53.0, 1.0  # site coordinates used by the reference (Q10.jl:105)


# ---------------------------------------------------------------------------
# potential radiation: port of the solar-geometry model (g_pot.jl:1-41)
# ---------------------------------------------------------------------------

def g_pot(latitude, longitude, doy, hour):
    """Top-of-atmosphere potential radiation [W/m²] at local standard time
    ``hour`` on day-of-year ``doy`` (vectorized; g_pot.jl:1-41)."""
    doy = np.asarray(doy, np.float64)
    hour = np.asarray(hour, np.float64)
    tthet = 2.0 * np.pi * (doy - 1.0) / 365.0

    eqoftime = (
        0.000075 + 0.001868 * np.cos(tthet) - 0.032077 * np.sin(tthet)
        - 0.014615 * np.cos(2 * tthet) - 0.040849 * np.sin(2 * tthet)
    ) * 229.18
    las = hour + eqoftime / 60.0 + longitude / 15.0
    omega = -15.0 * np.abs(12.0 - las)

    decl = (
        0.006918 - 0.399912 * np.cos(tthet) + 0.070257 * np.sin(tthet)
        - 0.006758 * np.cos(2 * tthet) + 0.000907 * np.sin(2 * tthet)
        - 0.002697 * np.cos(3 * tthet) + 0.00148 * np.sin(3 * tthet)
    )
    lat_rad = np.deg2rad(latitude)
    cos_theta = np.sin(decl) * np.sin(lat_rad) + np.cos(decl) * np.cos(
        lat_rad
    ) * np.cos(np.deg2rad(omega))
    solarconst = 1376.0
    rpot = solarconst * (
        1.00011 + 0.034221 * np.cos(tthet) + 0.00128 * np.sin(tthet)
        + 0.000719 * np.cos(2 * tthet) + 0.000077 * np.sin(2 * tthet)
    )
    return rpot * cos_theta


# ---------------------------------------------------------------------------
# gap-filling: diurnal-climatology + interpolation (fill_csv.R analog)
# ---------------------------------------------------------------------------

def gapfill_series(x, steps_per_day: int, window_days: int = 15):
    """Fill NaN gaps with the local mean diurnal cycle (± ``window_days``)
    plus linear interpolation of the residual — a numpy stand-in for the
    reference's SSA fill (fill_csv.R:33-41): both reconstruct the missing
    values from the series' own periodic structure."""
    x = np.asarray(x, np.float64).copy()
    n = len(x)
    if not np.isnan(x).any():
        return x
    tod = np.arange(n) % steps_per_day
    day = np.arange(n) // steps_per_day
    clim = np.empty(n)
    half = window_days
    for d in range(int(day[-1]) + 1):
        sel = (day >= d - half) & (day <= d + half)
        rows = np.where(sel)[0]
        block = x[rows]
        block_tod = tod[rows]
        for t in range(steps_per_day):
            m = block_tod == t
            vals = block[m]
            vals = vals[np.isfinite(vals)]
            mean_t = vals.mean() if vals.size else np.nan
            here = rows[(block_tod == t) & (day[rows] == d)]
            clim[here] = mean_t
    resid = x - clim
    good = np.isfinite(resid)
    if good.any():
        resid = np.interp(np.arange(n), np.flatnonzero(good), resid[good])
    else:
        resid = np.zeros(n)
    filled = clim + resid
    # margins where even the climatology is empty: nearest finite value
    bad = ~np.isfinite(filled)
    if bad.any():
        goodi = np.flatnonzero(~bad)
        filled[bad] = filled[goodi[np.searchsorted(
            goodi, np.flatnonzero(bad)
        ).clip(max=len(goodi) - 1)]]
    out = x.copy()
    out[np.isnan(x)] = filled[np.isnan(x)]
    return out


# ---------------------------------------------------------------------------
# ingestion: real CSV when available, surrogate otherwise
# ---------------------------------------------------------------------------

def _fractional_year(year, doy, hour, steps_per_day):
    length = np.where((year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0)),
                      366.0, 365.0)
    return year + (doy - 1 + hour / 24.0) / length


def load_respiration_data():
    """→ dict of columns (year, doy, hour, cham_temp, moisture, R_soil)."""
    path = os.environ.get("EASYHYBRID_RESP_CSV")
    if path and os.path.exists(path):
        import pandas as pd

        df = pd.read_csv(path, na_values=["NA"])
        df.columns = [c.strip().lower() for c in df.columns]
        doy = pd.to_datetime(
            df[["year", "month", "day"]]
        ).dt.dayofyear.to_numpy(float)
        hour = df["hour"].to_numpy(float)
        temp = df.get("cham_temp_filled", df.get("cham_temp")).to_numpy(float)
        moist = df.get("moisture_filled", df.get("moisture")).to_numpy(float)
        rsoil = df.get("s_rtot", df.get("r_soil")).to_numpy(float)
        year = df["year"].to_numpy(float)
        print(f"loaded {len(df)} rows from {path}")
        return dict(year=year, doy=doy, hour=hour, cham_temp=temp,
                    moisture=moist, R_soil=rsoil), 24
    # --- surrogate: two seasons of half-hourly data, TRUE Q10 = 2 ---------
    print("EASYHYBRID_RESP_CSV not set — synthesizing a surrogate "
          "(true Q10 = 2.0) so the workflow runs end-to-end")
    rng = np.random.default_rng(7)
    steps_per_day = 48
    n_days = 2 * 180
    n = n_days * steps_per_day
    day = np.arange(n) / steps_per_day
    doy = (100 + day) % 365 + 1
    hour = (np.arange(n) % steps_per_day) * (24.0 / steps_per_day)
    year = 2007 + ((100 + day) // 365)
    season = np.sin(2 * np.pi * (doy - 100) / 365.0)
    diurnal = np.sin(2 * np.pi * (hour - 9) / 24.0)
    temp = 10 + 8 * season + 5 * diurnal + rng.normal(0, 1.2, n)
    # moisture: slow autocorrelated drying/wetting, bounded (vol. %)
    moisture = 30 + np.cumsum(rng.normal(0, 0.25, n))
    moisture = 20 + 15 * (
        (moisture - moisture.min()) / (moisture.max() - moisture.min())
    )
    rb_true = 1.0 + 0.08 * (moisture - 20) + 0.4 * np.clip(season, 0, None)
    rsoil = rb_true * 2.0 ** (0.1 * (temp - 15.0))
    rsoil = rsoil * np.exp(rng.normal(0, 0.08, n))
    # realistic defects: sensor gaps + occasional negative spikes
    for col, frac in ((temp, 0.06), (moisture, 0.08)):
        starts = rng.choice(n - 50, int(frac * n / 30), replace=False)
        for s in starts:
            col[s : s + rng.integers(5, 50)] = np.nan
    spikes = rng.random(n) < 0.01
    rsoil[spikes] = -0.5
    return dict(year=year, doy=doy, hour=hour, cham_temp=temp,
                moisture=moisture, R_soil=rsoil), steps_per_day


# ---------------------------------------------------------------------------
# the workflow
# ---------------------------------------------------------------------------

def pinball(y_hat, y, mask, tau=0.9):
    """Quantile (pinball) loss with NaN masking (Q10.jl:56-62)."""
    import jax.numpy as jnp

    r = (y_hat - y) * mask
    rho = tau * jnp.maximum(r, 0.0) + (tau - 1.0) * jnp.minimum(r, 0.0)
    return rho.sum() / jnp.maximum(mask.sum(), 1.0)


def pinball_pos(y_hat, y, mask, tau):
    """Positional-argument form (Q10.jl:83-88)."""
    return pinball(y_hat, y, mask, tau=tau)


def rbq10_physics(*, cham_temp_filled, Rb, Q10):
    return {"R_soil": Rb * Q10 ** (0.1 * (cham_temp_filled - 15.0))}


def main(out_dir="rbq10_realdata_out"):
    cols, steps_per_day = load_respiration_data()

    # -- preprocessing (prec_process_data.jl parity) -----------------------
    cols["fractional_year"] = _fractional_year(
        cols["year"], cols["doy"], cols["hour"], steps_per_day
    )
    rgpot = g_pot(LAT, LON, cols["doy"], cols["hour"]) / 1000.0
    cols["rgpot2"] = np.clip(rgpot, 0.0, None)
    rsoil = np.asarray(cols["R_soil"], float).copy()
    rsoil[rsoil < 0.0] = np.nan  # mask, don't drop (NaN-masked loss)
    cols["R_soil"] = rsoil
    cols["cham_temp_filled"] = gapfill_series(
        cols["cham_temp"], steps_per_day
    )
    cols["moisture_filled"] = gapfill_series(cols["moisture"], steps_per_day)
    n_nan = int(np.isnan(cols["cham_temp"]).sum())
    print(f"gap-filled {n_nan} missing temperature steps; "
          f"{int(np.isnan(rsoil).sum())} negative/missing fluxes masked")

    df = {
        k: np.asarray(v, np.float32)
        for k, v in cols.items()
        if k in ("moisture_filled", "rgpot2", "cham_temp_filled", "R_soil")
    }

    # -- the hybrid model (Q10.jl:30-36: BatchNorm + [15,15] relu MLP) -----
    model = eh.construct_hybrid_model(
        predictors=["moisture_filled", "rgpot2"],
        forcing=["cham_temp_filled"],
        targets=["R_soil"],
        mechanistic_model=rbq10_physics,
        parameters={"Rb": (2.5, 0.0, 15.0), "Q10": (2.5, 1.0, 4.0)},
        neural_param_names=["Rb"],
        global_param_names=["Q10"],
        hidden_layers=[15, 15],
        activation="relu",
        scale_nn_outputs=True,
        input_batchnorm=True,
    )

    res = eh.train(
        model, df,
        nepochs=NEPOCHS, batchsize=512, optimizer=("adam", 0.01),
        monitor_names=["Rb"], tracked_params=["Q10"],
        save_training=True, output_folder=out_dir, model_name="rbq10_real",
        show_progress=False,
    )
    q10 = float(np.asarray(
        eh.scale_param(res.params["globals"]["Q10"], 1.0, 4.0)
    ).ravel()[0])
    print(f"MSE run: Q10 = {q10:.3f}  val mse = {res.best_loss:.4f}  "
          f"engine = {res.epoch_path}/{res.loop_mode}")

    # -- custom pinball loss, kwargs + positional forms (Q10.jl:56-99) -----
    res_pin = eh.train(
        model, df,
        training_loss=(pinball, {"tau": 0.9}),
        loss_types=["mse", (pinball, (0.9,))],
        nepochs=max(2, NEPOCHS // 3), batchsize=512,
        optimizer=("adam", 0.01), monitor_names=["Rb"],
        show_progress=False,
    )
    res_pin_pos = eh.train(
        model, df,
        training_loss=(pinball_pos, (0.9,)),
        nepochs=2, batchsize=512, show_progress=False,
    )
    print(f"pinball(τ=0.9) run: val loss {res_pin.best_loss:.4f} "
          f"(positional-form smoke: {res_pin_pos.best_loss:.4f})")

    # -- declarative form: eh.pinball(τ) stays inside the fused-kernel
    #    envelope (ElementwiseLoss, forward-differentiated in-kernel),
    #    unlike the opaque callables above which take the XLA epoch -------
    res_pin_decl = eh.train(
        model, df,
        training_loss=eh.pinball(0.9), loss_types=["mse"],
        nepochs=2, batchsize=512, show_progress=False,
    )
    print(f"declarative eh.pinball(0.9): val loss "
          f"{res_pin_decl.best_loss:.4f} engine = {res_pin_decl.epoch_path}")

    # -- checkpoint reload + warm start (Q10.jl:103-124) -------------------
    best = os.path.join(out_dir, "rbq10_real", "best_rbq10_real.pkl")
    ckpt = eh.load_checkpoint(os.path.join(out_dir, "rbq10_real"))
    assert "params" in ckpt
    res_warm = eh.train(
        model, df, nepochs=2, batchsize=512, train_from=best,
        show_progress=False,
    )
    print(f"warm start from {best}: val mse {res_warm.best_loss:.4f}")

    # -- plots (poplot + loss curves; Q10.jl plotting section) -------------
    try:
        from easyhybrid_tpu.plotting.plots import plot_loss, poplot

        poplot(
            res.val_obs["R_soil"], res.val_pred["R_soil_pred"],
            target="R_soil",
            save=os.path.join(out_dir, "pred_vs_obs.png"),
        )
        plot_loss(res.history, save=os.path.join(out_dir, "loss.png"))
        print(f"plots written to {out_dir}/")
    except Exception as exc:  # matplotlib optional
        print(f"plotting skipped: {exc}")

    return q10, res


if __name__ == "__main__":
    q10, _ = main()
    if not os.environ.get("EASYHYBRID_RESP_CSV"):
        # surrogate has known truth (2.0): the workflow must recover it
        # given a real epoch budget; smoke runs only sanity-check bounds
        lo, hi = (1.6, 2.4) if NEPOCHS >= 30 else (1.0, 4.0)
        assert lo < q10 < hi, f"surrogate Q10 not recovered: {q10}"
        print("OK: recovered plausible Q10 from the surrogate workflow")
