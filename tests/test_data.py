"""Data layer: prepare, split modes, sequences, loaders (reference parity:
test/test_split_data_train.jl data sections + sequences semantics)."""

import numpy as np
import pandas as pd
import pytest

import easyhybrid_tpu as eh
from easyhybrid_tpu.data.loaders import build_epoch_tensors
from easyhybrid_tpu.data.sequences import window_starts


def test_prepare_data_row_filtering(rbq10_model):
    df = eh.gen_rbq10_data(100, seed=0)
    df.loc[3, "sw_pot"] = np.nan       # NaN predictor -> row dropped
    df.loc[5, "reco"] = np.nan         # all targets NaN -> dropped
    df.loc[7, "ta"] = np.nan           # NaN forcing -> dropped
    data = eh.prepare_data(rbq10_model, df)
    assert data.n_samples == 97
    assert data.x.shape == (97, 2)
    assert set(data.forcing) == {"ta"}
    assert set(data.y) == {"reco"}


def test_prepare_data_keeps_partial_targets():
    def mech(*, f, a):
        return {"t1": a * f, "t2": a + f}

    m = eh.construct_hybrid_model(
        predictors=["p"], forcing=["f"], targets=["t1", "t2"],
        mechanistic_model=mech, parameters={"a": (1.0, 0.0, 2.0)},
        neural_param_names=["a"], global_param_names=[],
    )
    df = pd.DataFrame(
        {"p": [1.0, 2.0], "f": [1.0, 1.0], "t1": [np.nan, 1.0], "t2": [1.0, np.nan]}
    )
    data = eh.prepare_data(m, df)
    assert data.n_samples == 2  # one target present -> keep


def test_prepare_data_dict_and_passthrough(rbq10_model):
    df = eh.gen_rbq10_data(50, seed=0)
    cols = {c: df[c].to_numpy() for c in df.columns}
    data = eh.prepare_data(rbq10_model, cols)
    assert data.n_samples == 50
    again = eh.prepare_data(rbq10_model, data)
    assert again is data


def test_prepare_data_multi_nn():
    def mech(*, f, a, b):
        return {"t": a * f + b}

    m = eh.construct_hybrid_model(
        predictors={"a": ["p1", "p2"], "b": ["p3"]},
        forcing=["f"], targets=["t"],
        mechanistic_model=mech,
        parameters={"a": (1.0, 0.0, 2.0), "b": (0.5, 0.0, 1.0)},
        global_param_names=[],
    )
    n = 20
    rng = np.random.default_rng(0)
    df = pd.DataFrame({k: rng.random(n) for k in ["p1", "p2", "p3", "f", "t"]})
    data = eh.prepare_data(m, df)
    assert set(data.x) == {"a", "b"}
    assert data.x["a"].shape == (n, 2)
    assert data.x["b"].shape == (n, 1)


def test_fraction_split_chronological_and_shuffled(rbq10_model, rbq10_df):
    tr, va = eh.split_data(rbq10_df, rbq10_model, split_data_at=0.75)
    assert tr.n_samples == 192 and va.n_samples == 64
    # chronological: train block equals the head of the data
    prepared = eh.prepare_data(rbq10_model, rbq10_df)
    np.testing.assert_array_equal(tr.x, prepared.x[:192])
    tr_s, va_s = eh.split_data(
        rbq10_df, rbq10_model, split_data_at=0.75, shuffleobs=True, seed=0
    )
    assert tr_s.n_samples == 192
    assert not np.array_equal(tr_s.x, prepared.x[:192])


def test_split_by_id(rbq10_model):
    df = eh.gen_rbq10_data(100, seed=0)
    df["site"] = np.repeat(np.arange(10), 10)
    tr, va = eh.split_data(df, rbq10_model, split_by_id="site", split_data_at=0.8)
    assert tr.n_samples == 80 and va.n_samples == 20


def test_split_by_id_and_folds_rejected(rbq10_model, rbq10_df):
    with pytest.raises(ValueError):
        eh.split_data(
            rbq10_df, rbq10_model, split_by_id="id", folds=[1] * 256, val_fold=1
        )


def test_kfold_split(rbq10_model, rbq10_df):
    folds = eh.make_folds(rbq10_df, k=4, shuffle=True, seed=0)
    assert sorted(np.unique(folds)) == [1, 2, 3, 4]
    tr, va = eh.split_data(rbq10_df, rbq10_model, folds=folds, val_fold=2)
    assert va.n_samples == 64 and tr.n_samples == 192
    with pytest.raises(ValueError):
        eh.split_data(rbq10_df, rbq10_model, folds=folds, val_fold=9)
    with pytest.raises(ValueError):
        eh.split_data(rbq10_df, rbq10_model, folds=folds)  # missing val_fold


def test_presplit_passthrough(rbq10_model, rbq10_df):
    tr, va = eh.split_data(rbq10_df, rbq10_model)
    tr2, va2 = eh.split_data((tr, va), rbq10_model, split_data_at=0.5)
    assert tr2 is tr and va2 is va


def test_window_starts_match_reference_semantics():
    # 1-based reference: sx_min=max(1, 1-(iw+lt-ow)), sx_max=L-iw-lt+1
    for L, iw, ow, shift, lt in [
        (30, 5, 1, 1, 1),
        (30, 5, 1, 2, 0),
        (30, 10, 3, 1, 1),
        (30, 4, 6, 1, 0),  # output window longer than input
    ]:
        starts = window_starts(L, iw, ow, shift, lt)
        sx_min_jl = max(1, 1 - (iw + lt - ow))
        sx_max_jl = L - iw - lt + 1
        expected = np.arange(sx_min_jl, sx_max_jl + 1, shift) - 1  # 0-based
        np.testing.assert_array_equal(starts, expected)


def test_split_into_sequences_values():
    L, F = 20, 2
    x = np.arange(L * F, dtype=np.float32).reshape(L, F)
    yv = np.arange(L, dtype=np.float32) * 10
    data = eh.HybridData(x=x, forcing={"f": yv.copy()}, y={"t": yv})
    seq = eh.split_into_sequences(
        data, input_window=5, output_window=2, output_shift=3, lead_time=1
    )
    starts = window_starts(L, 5, 2, 3, 1)
    assert seq.x.shape == (len(starts), 5, F)
    assert seq.forcing["f"].shape == (len(starts), 5)
    assert seq.y["t"].shape == (len(starts), 2)
    s0 = starts[0]
    np.testing.assert_array_equal(seq.x[0], x[s0 : s0 + 5])
    # target window: ends lead_time after last input; width output_window
    end = s0 + 5 - 1 + 1
    np.testing.assert_array_equal(seq.y["t"][0], yv[end - 1 : end + 1])


def test_window_errors():
    with pytest.raises(ValueError):
        window_starts(5, 10, 1, 1, 1)  # too long
    with pytest.raises(ValueError):
        window_starts(20, 5, 1, 1, -1)  # negative lead


def test_filter_sequences():
    x = np.random.default_rng(0).random((10, 4, 2)).astype(np.float32)
    y = np.random.default_rng(1).random((10, 1)).astype(np.float32)
    x[3, 0, 0] = np.nan          # NaN predictor -> drop
    y[7, 0] = np.nan             # all-NaN target -> drop
    data = eh.HybridData(x=x, forcing={}, y={"t": y})
    out = eh.filter_sequences(data)
    assert out.n_samples == 8


def test_epoch_tensor_padding():
    n = 10
    data = eh.HybridData(
        x=np.ones((n, 2), np.float32),
        forcing={"f": np.ones(n, np.float32)},
        y={"t": np.concatenate([np.ones(8), [np.nan, 5.0]]).astype(np.float32)},
    )
    t = build_epoch_tensors(data, 4)
    assert t.num_batches == 3 and t.batch_size == 4
    assert t.weight.sum() == n
    # NaN target -> 0 mask, 0 value; padding rows -> 0 mask
    assert t.mask["t"].sum() == 9  # 10 samples - 1 NaN
    assert np.all(np.isfinite(t.y["t"]))
    # full-batch mode
    tf = build_epoch_tensors(data, None)
    assert tf.num_batches == 1 and tf.batch_size == n


def test_batch_iterator():
    n = 10
    data = eh.HybridData(
        x=np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        forcing={"f": np.arange(n, dtype=np.float32)},
        y={"t": np.arange(n, dtype=np.float32)},
    )
    batches = list(eh.batch_iterator(data, 4, shuffle=False))
    assert len(batches) == 3
    (x0, f0), y0 = batches[0]
    assert x0.shape == (4, 2)
    assert len(batches[-1][1]["t"]) == 2  # remainder kept
    batches_dl = list(eh.batch_iterator(data, 4, shuffle=False, drop_last=True))
    assert len(batches_dl) == 2


def test_synthetic_generators():
    df = eh.gen_linear_data(200, seed=1)
    assert {"x1", "x2", "x3", "obs", "seqID"} <= set(df.columns)
    df2 = eh.gen_linear_data_2outputs(200, seed=1)
    assert {"obs_dyn1", "obs_dyn2"} <= set(df2.columns)
    df3 = eh.gen_rbq10_data(100, nan_frac=0.2, seed=1)
    assert df3["reco"].isna().sum() > 0


# ---- labeled-array (xarray) ingestion --------------------------------------
# xarray is optional; a minimal duck-typed stand-in exercises the dispatch
# (reference parity: KeyedArray/DimArray prepare_data methods,
# prepare_data.jl:3-10/:21-29)

class _FakeDataset:
    """Speaks the minimal xr.Dataset interface prepare_data relies on:
    to_dataframe() (dims as a MultiIndex) + .dims + .data_vars."""

    def __init__(self, variables, coords):
        import pandas as pd

        self.dims = {k: len(v) for k, v in coords.items()}
        self.data_vars = dict(variables)
        index = pd.MultiIndex.from_product(
            list(coords.values()), names=list(coords.keys())
        )
        flat = {k: np.asarray(v).ravel() for k, v in variables.items()}
        self._df = pd.DataFrame(flat, index=index)

    def to_dataframe(self):
        return self._df


def _fake_rbq10_dataset(n=64, sites=1, seed=0):
    rng = np.random.default_rng(seed)
    shape = (sites, n) if sites > 1 else (n,)
    sw = rng.random(shape).astype(np.float32)
    dsw = rng.random(shape).astype(np.float32)
    ta = (10 + 10 * rng.random(shape)).astype(np.float32)
    rb = 2.0 + sw
    reco = rb * 2.0 ** (0.1 * (ta - 15.0))
    coords = {"time": np.arange(n)}
    if sites > 1:
        coords = {"site": np.arange(sites), "time": np.arange(n)}
    return _FakeDataset(
        {"sw_pot": sw, "dsw_pot": dsw, "ta": ta, "reco": reco}, coords
    )


def test_is_xarray_like_duck_typing(rbq10_df):
    ds = _fake_rbq10_dataset()
    assert eh.is_xarray_like(ds)
    assert not eh.is_xarray_like(rbq10_df)          # DataFrame excluded
    assert not eh.is_xarray_like({"a": [1.0]})      # plain dict excluded


def test_prepare_data_from_dataset(rbq10_model):
    ds = _fake_rbq10_dataset(n=64)
    prepared = eh.prepare_data(rbq10_model, ds)
    assert prepared.x.shape == (64, 2)
    assert prepared.forcing["ta"].shape == (64,)
    assert prepared.y["reco"].shape == (64,)


def test_train_from_dataset(rbq10_model):
    ds = _fake_rbq10_dataset(n=128, seed=1)
    res = eh.train(
        rbq10_model, ds, nepochs=1, batchsize=32, show_progress=False
    )
    assert np.isfinite(res.best_loss)


def test_multisite_dataset_long_format(rbq10_model):
    """(site, time) dataset → long format with a site column, feeding
    split_by_id and prepare_multisite_data."""
    ds = _fake_rbq10_dataset(n=32, sites=4, seed=2)
    df = eh.xarray_to_dataframe(ds)
    assert {"site", "time", "reco"} <= set(df.columns)
    assert len(df) == 4 * 32
    res = eh.train(
        rbq10_model, ds, nepochs=1, batchsize=32, split_by_id="site",
        show_progress=False,
    )
    assert np.isfinite(res.best_loss)
    msd = eh.prepare_multisite_data(rbq10_model, ds, "site")
    assert msd.x.shape == (4, 32, 2)


def test_to_dataset_requires_xarray(rbq10_model, rbq10_df):
    """Exporter uses real xarray when present; raises ImportError otherwise."""
    res = eh.train(rbq10_model, rbq10_df, nepochs=1, batchsize=32,
                   show_progress=False)
    try:
        import xarray  # noqa: F401
        has_xr = True
    except ImportError:
        has_xr = False
    if has_xr:
        ds = eh.to_dataset(res, which="val")
        assert "reco" in ds and "reco_pred" in ds
    else:
        import pytest as _pytest
        with _pytest.raises(ImportError):
            eh.to_dataset(res, which="val")


def test_split_by_id_empty_partition_dtype():
    """Regression: an empty id partition built a float64 index array,
    crashing take() — 2 unique ids at split_data_at=0.8 leaves val empty."""
    import pandas as pd

    import easyhybrid_tpu as eh

    df = pd.DataFrame({
        "a": np.arange(10, dtype=np.float32),
        "reco": np.arange(10, dtype=np.float32),
        "site": ["s1"] * 5 + ["s2"] * 5,
    })

    def mech(*, a, p):
        return {"reco": p * a}

    m = eh.construct_hybrid_model(
        predictors=["a"], forcing=[], targets=["reco"],
        mechanistic_model=mech, parameters={"p": (1.0, 0.0, 2.0)},
        neural_param_names=["p"], hidden_layers=[4],
    )
    tr, va = eh.split_data(df, m, split_by_id="site", split_data_at=0.8,
                           shuffleobs=False)
    assert tr.n_samples == 10 and va.n_samples == 0


def test_hdf5_netcdf_uses_modal_record_length(tmp_path):
    """Regression: the netCDF-4 reader anchored to the FIRST 1-D dataset
    visited (alphabetical), so a short auxiliary coord (e.g. 'bnds')
    dropped every real time-series variable."""
    h5py = pytest.importorskip("h5py")

    from easyhybrid_tpu.data.netcdf import load_timeseries_netcdf

    p = tmp_path / "t.nc"
    with h5py.File(p, "w") as f:
        f["aaa_bnds"] = np.arange(2.0)  # alphabetically first, length 2
        f["tair"] = np.arange(100.0)
        f["rsds"] = np.arange(100.0) * 2
    df = load_timeseries_netcdf(str(p))
    assert set(df.columns) == {"tair", "rsds"} and len(df) == 100
