"""Tune, NetCDF ingestion, predict_df, show, plotting, WrappedTuples."""

import os

import numpy as np
import pytest

import easyhybrid_tpu as eh


def test_tune_single_run(rbq10_model, rbq10_df):
    mspec = eh.ModelSpec(
        hyper_model={"hidden_layers": [4]},
        hyper_train={"nepochs": 1, "batchsize": 64, "show_progress": False},
    )
    res = eh.tune(rbq10_model, rbq10_df, mspec)
    assert np.isfinite(res.best_loss)


def test_grid_search(rbq10_model, rbq10_df):
    best, trials = eh.grid_search(
        rbq10_model,
        rbq10_df,
        {"hidden_layers": [[4], [8]]},
        nepochs=1,
        batchsize=64,
        show_progress=False,
    )
    assert len(trials) == 2
    assert best in ({"hidden_layers": [4]}, {"hidden_layers": [8]})


def test_random_search(rbq10_model, rbq10_df):
    best, trials = eh.random_search(
        rbq10_model,
        rbq10_df,
        {
            "hidden_layers": [[4], [8]],
            "optimizer": [("adam", 0.01), ("adam", 0.001)],
        },
        n_trials=2,
        nepochs=1,
        batchsize=64,
        show_progress=False,
    )
    assert len(trials) == 2 and "hidden_layers" in best


def test_netcdf_roundtrip_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "series.nc")
    n = 50
    with h5py.File(path, "w") as f:
        f.create_dataset("ta", data=np.arange(n, dtype=np.float64))
        d = f.create_dataset("reco", data=np.full(n, 2.0))
        d.attrs["_FillValue"] = np.array([2.0])
        f.create_dataset("matrix", data=np.zeros((3, 3)))  # 2-D: ignored
    df = eh.load_timeseries_netcdf(path)
    assert set(df.columns) == {"ta", "reco"}
    assert df["reco"].isna().all()  # fill value -> NaN
    assert len(df) == n


def test_netcdf3_roundtrip(tmp_path):
    from scipy.io import netcdf_file

    path = str(tmp_path / "classic.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("time", 10)
        v = f.createVariable("ta", "f4", ("time",))
        v[:] = np.arange(10, dtype=np.float32)
    df = eh.load_timeseries_netcdf(path)
    assert "ta" in df.columns and len(df) == 10


def test_netcdf_missing_file():
    with pytest.raises(FileNotFoundError):
        eh.load_timeseries_netcdf("/nonexistent/file.nc")


def test_predict_df(rbq10_model, rbq10_df):
    import jax

    params, state = rbq10_model.init(jax.random.PRNGKey(0))
    out_df = rbq10_model.predict_df(params, state, rbq10_df)
    assert "reco_pred" in out_df.columns
    assert "rb_pred" in out_df.columns  # per-sample neural parameter
    assert len(out_df) == len(rbq10_df)
    # original df untouched
    assert "reco_pred" not in rbq10_df.columns


def test_model_repr(rbq10_model):
    s = repr(rbq10_model)
    assert "SingleNNHybridModel" in s
    assert "Q10" in s and "global" in s
    assert "rbq10" in s  # mechanistic fn name
    s2 = repr(rbq10_model.parameters)
    assert "ParameterContainer" in s2


def test_logging_loss_repr():
    ll = eh.LoggingLoss(loss_types=("mse", "r2"), training_loss="mse")
    s = repr(ll)
    assert "mse" in s and "r2" in s and "train_mode" in s


def test_wrapped_tuples():
    wt = eh.WrappedTuples([{"a": 1, "b": 2.0}, {"a": 3, "b": 4.0}])
    assert wt.a == [1, 3]
    assert len(wt) == 2
    assert wt.to_matrix().shape == (2, 2)
    with pytest.raises(AttributeError):
        wt.nope


def test_plots_render(tmp_path, rbq10_model, rbq10_df):
    pytest.importorskip("matplotlib")
    res = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=3,
        batchsize=64,
        show_progress=False,
        tracked_params=["Q10"],
    )
    from easyhybrid_tpu.plotting.plots import (
        plot_loss,
        plot_parameters,
        poplot,
        train_board,
        plot_training_summary,
    )

    poplot(
        res.train_obs["reco"].to_numpy(),
        res.train_pred["reco_pred"].to_numpy(),
        target="reco",
        save=str(tmp_path / "poplot.png"),
    )
    plot_loss(res, save=str(tmp_path / "loss.png"))
    plot_parameters(res.tracked, save=str(tmp_path / "params.png"))
    train_board(res, save=str(tmp_path / "board.png"))
    plot_training_summary(res, save=str(tmp_path / "summary.png"))
    for f in ["poplot.png", "loss.png", "params.png", "board.png", "summary.png"]:
        assert os.path.getsize(str(tmp_path / f)) > 0


def test_train_plotting_flag(tmp_path, rbq10_model, rbq10_df):
    """plotting=True drives the live observability stack headless: JSONL
    metric stream (one line per evaluated epoch), live-board png, and the
    movie recorded DURING training (reference dashboard.jl:1-87)."""
    pytest.importorskip("matplotlib")
    res = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=3,
        batchsize=64,
        show_progress=False,
        plotting=True,
        save_training=True,
        tracked_params=["Q10"],
        output_folder=str(tmp_path),
        model_name="plotrun",
    )
    assert os.path.exists(res.paths.history_png)
    # metric stream: epoch 0 + 3 epochs, parseable, with tracked params
    from easyhybrid_tpu.plotting.live import read_metric_stream

    assert res.metrics_stream == res.paths.metrics_jsonl
    records = read_metric_stream(res.metrics_stream)
    assert [r["epoch"] for r in records] == [0, 1, 2, 3]
    assert "mse" in records[1]["val"] and "Q10" in records[1]["tracked"]
    # in-training movie (mp4, or gif fallback without ffmpeg)
    movie = res.paths.history_mp4
    gif = movie.rsplit(".", 1)[0] + ".gif"
    assert os.path.exists(movie) or os.path.exists(gif)


def test_yscale_plumbed_into_boards(tmp_path):
    """TrainConfig.yscale reaches the live dashboard and the post-hoc board
    loss axes (previously hardcoded to log)."""
    pytest.importorskip("matplotlib")
    from easyhybrid_tpu.plotting.live import LiveDashboard

    for yscale in ("linear", "log"):
        board = LiveDashboard(
            ["reco"], {"reco": np.ones(8, np.float32)},
            yscale=yscale, show=False,
        )
        board.update(0, type("S", (), {
            "l_train": {"mse": {"sum": 1.0}},
            "l_val": {"mse": {"sum": 1.0}},
            "y_pred_val": {"reco": np.ones(8, np.float32)},
        })(), {}, {})
        assert board.axes[0, 0].get_yscale() == yscale
        board.plt.close(board.fig)


def test_deferred_checkpoint_every_warns(tmp_path, rbq10_model, rbq10_df,
                                         caplog):
    """A deferred save_training run with checkpoint_every>1 warns that
    mid-run checkpoint files are not written (review finding, round 3)."""
    import logging as _logging

    with caplog.at_level(_logging.WARNING, logger="easyhybrid_tpu"):
        res = eh.train(
            rbq10_model, rbq10_df, nepochs=2, batchsize=64,
            show_progress=False, save_training=True, checkpoint_every=5,
            output_folder=str(tmp_path), model_name="ckptwarn",
        )
    assert res.loop_mode == "deferred"
    assert any("checkpoint_every" in r.message for r in caplog.records)


def test_metric_stream_without_plotting(tmp_path, rbq10_model, rbq10_df):
    """save_training alone also streams metrics (headless channel)."""
    res = eh.train(
        rbq10_model, rbq10_df, nepochs=2, batchsize=64, show_progress=False,
        save_training=True, output_folder=str(tmp_path), model_name="streamrun",
    )
    from easyhybrid_tpu.plotting.live import read_metric_stream

    records = read_metric_stream(res.paths.metrics_jsonl)
    assert len(records) == 3 and records[0]["epoch"] == 0


def test_record_history_gif(tmp_path, rbq10_model, rbq10_df):
    pytest.importorskip("matplotlib")
    res = eh.train(
        rbq10_model, rbq10_df, nepochs=3, batchsize=64,
        keep_history=True, show_progress=False,
    )
    from easyhybrid_tpu.plotting.plots import record_history

    out = record_history(res, save=str(tmp_path / "hist.gif"), fps=2)
    assert os.path.getsize(out) > 0


def test_cross_validate(rbq10_model, rbq10_df):
    scores, results = eh.cross_validate(
        rbq10_model, rbq10_df, k=3, nepochs=1, batchsize=64,
        show_progress=False,
    )
    assert len(scores) == 3 and all(np.isfinite(s) for s in scores)


def test_inference_engine(rbq10_model, rbq10_df):
    import jax

    params, state = rbq10_model.init(jax.random.PRNGKey(0))
    predict_fn = eh.make_inference_fn(rbq10_model, params, state, batch_size=100)
    out = predict_fn(rbq10_df)  # 256 rows -> 3 chunks incl. padding
    assert out["reco"].shape == (256,)
    assert out["rb"].shape == (256,)  # per-sample parameter exposed
    # matches predict_df values
    df_out = rbq10_model.predict_df(params, state, rbq10_df)
    np.testing.assert_allclose(
        out["reco"], df_out["reco_pred"].to_numpy(), rtol=1e-5, atol=1e-6
    )
    # one-shot wrapper
    out2 = eh.predict(rbq10_model, params, state, rbq10_df.head(10))
    assert out2["reco"].shape == (10,)


def test_history_frame(rbq10_model, rbq10_df):
    res = eh.train(rbq10_model, rbq10_df, nepochs=3, batchsize=64,
                   loss_types=["mse", "r2"], show_progress=False)
    hf = res.history_frame()
    assert len(hf) == 4  # epoch 0 + 3
    assert "val_mse_reco" in hf.columns and "train_r2_sum" in hf.columns
    assert hf["epoch"].tolist() == [0, 1, 2, 3]


def test_progress_table_format(rbq10_model, rbq10_df):
    from easyhybrid_tpu.training.show import progress_table

    res = eh.train(rbq10_model, rbq10_df, nepochs=2, batchsize=64,
                   show_progress=False)
    table = progress_table(res.history[0], res.history[-1])
    assert "metric" in table and "reco" in table and "mse" in table


def test_trace_smoke(tmp_path, rbq10_model, rbq10_df):
    """jax.profiler trace context produces a trace directory."""
    import jax.numpy as jnp

    with eh.trace(str(tmp_path / "trc")) as d:
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(d)


def test_optimizer_spec_forms():
    import optax

    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    assert isinstance(resolve_optimizer("adam"), optax.GradientTransformation)
    assert isinstance(resolve_optimizer(("adamw", 0.01)), optax.GradientTransformation)
    assert isinstance(
        resolve_optimizer(("adam", {"learning_rate": 0.01, "b1": 0.95})),
        optax.GradientTransformation,
    )
    opt = optax.sgd(0.1)
    assert resolve_optimizer(opt) is opt
    with pytest.raises(ValueError):
        resolve_optimizer("bogus")
    with pytest.raises(ValueError):
        resolve_optimizer({"nn": "adam"})  # dict spec needs params


def test_best_hyperparams_direction_aware():
    """With a maximize-direction first loss type (r2), the LARGEST best_loss
    wins (advisor finding: unconditional min() returned the worst trial)."""
    class FakeResult:
        def __init__(self, best_loss):
            self.best_loss = best_loss

    trials = [({"lr": 0.1}, FakeResult(0.2)), ({"lr": 0.3}, FakeResult(0.9))]
    assert eh.best_hyperparams(trials, metric="r2") == {"lr": 0.3}
    assert eh.best_hyperparams(trials, metric="mse") == {"lr": 0.1}


def test_theme_renders_and_matches_reference_palette(tmp_path):
    """Theme parity with ext/HybridTheme.jl:1-96: 7-color palette, covarying
    color/marker/linestyle cycle, serif 16pt, plasma colormap."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = eh.hybrid_colors(0.8)
    assert len(cols) == 7 and cols[0][:3] == (0.0, 0.0, 0.0)
    assert all(c[3] == 0.8 for c in cols)
    rc = eh.theme_easy_hybrid()
    assert rc["font.size"] == 16 and rc["image.cmap"] == "plasma"
    cycle = list(rc["axes.prop_cycle"])
    assert len(cycle) == 7 and {"color", "marker", "linestyle"} <= set(cycle[0])
    with eh.use_theme():
        assert matplotlib.rcParams["font.size"] == 16
        fig, ax = plt.subplots()
        for i in range(3):
            ax.plot([0, 1], [i, i + 1], label=f"s{i}")
        ax.legend()
        fig.savefig(tmp_path / "theme.png")
        plt.close(fig)
    assert matplotlib.rcParams["font.size"] != 16  # context restores


def test_docs_site_builds(tmp_path):
    """The static docs-site generator (the reference's Documenter/Vitepress
    HTML-site analog, built in CI) renders every nav page with working
    intra-site links."""
    import pathlib
    import re
    import subprocess
    import sys

    pytest.importorskip("markdown")  # in the test extra; absent on minimal rigs
    root = pathlib.Path(__file__).resolve().parent.parent
    out = tmp_path / "site"
    res = subprocess.run(
        [sys.executable, str(root / "tools" / "build_docs_site.py"),
         str(out)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    pages = sorted(p.name for p in out.glob("*.html"))
    assert "index.html" in pages and "api_reference.html" in pages
    assert len(pages) >= 14
    # every nav href resolves to a built page
    html = (out / "index.html").read_text()
    for target in set(re.findall(r'href="([a-z_]+\.html)"', html)):
        assert (out / target).exists(), target
    assert (out / "style.css").exists() and (out / "pygments.css").exists()
    # cross-SECTION links between same-basename pages resolve by the
    # source page's directory (tutorials/overview.md's research link must
    # not collapse onto itself)
    tut = (out / "tutorials_overview.html").read_text()
    body = tut.split("<main>")[1]
    assert 'href="research_overview.html"' in body
    # no unresolved nav-page .md links survive in any built body
    for page in out.glob("*.html"):
        b = page.read_text().split("<main>")[1]
        for md_target in re.findall(r'href="([^"#:]+\.md)[#"]', b):
            base = md_target.split("/")[-1]
            known = [
                "README.md", "get_started.md", "overview.md",
                "custom_models.md", "losses.md", "sequences_lstm.md",
                "second_order.md", "hyperparameter_tuning.md",
                "scaling_tpu.md", "cluster_jobs.md",
                "synthetic_respiration.md", "tpu_notes.md", "BASELINE.md",
                "api.md", "api_reference.md",
            ]
            assert base not in known, f"{page.name}: unresolved {md_target}"


def test_inference_cache_releases_dropped_models(rbq10_df):
    """Regression: the per-model jitted forwards were cached in a
    WeakKeyDictionary whose VALUE (the jitted closure) strongly captured
    the model — the key could never be collected, so every model trained
    in a loop pinned its compiled executables for the process lifetime."""
    import gc
    import weakref

    import jax

    from easyhybrid_tpu.training import inference as inf

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[4],
    )
    params, state = model.init(jax.random.PRNGKey(0))
    out = eh.predict(model, params, state, rbq10_df.head(32), batch_size=32)
    assert out["reco"].shape == (32,)
    assert model in inf._SINGLE_FORWARDS  # cache populated

    ref = weakref.ref(model)
    del model, params, state, out
    gc.collect()
    assert ref() is None, "dropped model still pinned by the forward cache"


def test_poplot_nan_obs_keeps_identity_line():
    """Regression: NaN observations (masked rows) turned the axis limits
    NaN via plain .min()/.max(), silently dropping the 1:1 line."""
    pytest.importorskip("matplotlib")
    from easyhybrid_tpu.plotting.plots import poplot

    obs = np.array([1.0, np.nan, 3.0, 4.0])
    pred = np.array([1.1, 2.0, np.nan, 4.2])
    ax = poplot(obs, pred, target="t")
    (line,) = [ln for ln in ax.get_lines() if ln.get_label() == "1:1"]
    assert np.all(np.isfinite(line.get_xdata()))
