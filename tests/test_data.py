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
