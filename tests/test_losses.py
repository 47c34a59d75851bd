"""Loss metrics vs closed-form math (reference parity: test/test_loss_fn.jl,
test_compute_loss.jl, test_loss_types.jl) — every metric is checked against a
numpy implementation over the masked subset, exactly the reference semantics
(boolean indexing) that the framework re-expresses as masked reductions."""

import numpy as np
import pytest

import easyhybrid_tpu as eh
from easyhybrid_tpu.losses.metrics import METRICS


@pytest.fixture
def yy(rng):
    y = rng.normal(2.0, 1.0, 200).astype(np.float32)
    y[rng.random(200) < 0.25] = np.nan
    y_hat = (y if False else rng.normal(2.0, 1.0, 200)).astype(np.float32)
    y_hat = (0.8 * np.nan_to_num(y) + 0.2 * y_hat).astype(np.float32)
    mask = np.isfinite(y)
    return y_hat, y, mask


def _np_subset(y_hat, y, mask):
    return y_hat[mask], y[mask]


def _np_metrics(y_hat, y, mask):
    yh, yv = _np_subset(y_hat, y, mask)
    mse = np.mean((yh - yv) ** 2)
    sst = np.sum((yv - yv.mean()) ** 2)
    sse = np.sum((yh - yv) ** 2)
    r = np.corrcoef(yh, yv)[0, 1]
    alpha = yh.std(ddof=1) / yv.std(ddof=1)
    beta = yh.mean() / yv.mean()
    kge_loss = np.sqrt((r - 1) ** 2 + (alpha - 1) ** 2 + (beta - 1) ** 2)
    pbkge_loss = np.sqrt((r - 1) ** 2 + (beta - 1) ** 2)
    return {
        "mse": mse,
        "rmse": np.sqrt(mse),
        "mae": np.mean(np.abs(yh - yv)),
        "pearson": r,
        "r2": 1 - sse / sst,
        "pearsonLoss": 1 - r,
        "nseLoss": sse / sst,
        "nse": 1 - sse / sst,
        "kgeLoss": kge_loss,
        "kge": 1 - kge_loss,
        "pbkgeLoss": pbkge_loss,
        "pbkge": 1 - pbkge_loss,
        "alpha": alpha,
        "beta": beta,
    }


@pytest.mark.parametrize(
    "name",
    ["mse", "rmse", "mae", "pearson", "r2", "pearsonLoss", "nseLoss", "nse",
     "kgeLoss", "kge", "pbkgeLoss", "pbkge", "alpha", "beta"],
)
def test_metric_matches_closed_form(name, yy):
    y_hat, y, mask = yy
    expected = _np_metrics(y_hat, y, mask)[name]
    got = float(eh.loss_fn(y_hat, y, mask, name))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_unicode_aliases(yy):
    y_hat, y, mask = yy
    assert float(eh.loss_fn(y_hat, y, mask, "α")) == float(
        eh.loss_fn(y_hat, y, mask, "alpha")
    )
    assert float(eh.loss_fn(y_hat, y, mask, "β")) == float(
        eh.loss_fn(y_hat, y, mask, "beta")
    )


def test_mask_none_uses_finiteness(yy):
    y_hat, y, mask = yy
    a = float(eh.loss_fn(y_hat, y, None, "mse"))
    b = float(eh.loss_fn(y_hat, y, mask, "mse"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_custom_callable_forms(yy):
    y_hat, y, mask = yy

    def custom(yh, yv, m):
        return eh.masked_mean((yh - yv) ** 2, m.astype(np.float32))

    def weighted(yh, yv, m, w):
        return w * eh.masked_mean((yh - yv) ** 2, m.astype(np.float32))

    def scaled(yh, yv, m, scale=1.0):
        return scale * eh.masked_mean((yh - yv) ** 2, m.astype(np.float32))

    def both(yh, yv, m, w, scale=1.0):
        return scale * w * eh.masked_mean((yh - yv) ** 2, m.astype(np.float32))

    mse = float(eh.loss_fn(y_hat, y, mask, "mse"))
    assert float(eh.loss_fn(y_hat, y, mask, custom)) == pytest.approx(mse, rel=1e-6)
    assert float(eh.loss_fn(y_hat, y, mask, (weighted, (0.5,)))) == pytest.approx(
        0.5 * mse, rel=1e-6
    )
    assert float(
        eh.loss_fn(y_hat, y, mask, (scaled, {"scale": 2.0}))
    ) == pytest.approx(2.0 * mse, rel=1e-6)
    assert float(
        eh.loss_fn(y_hat, y, mask, (both, (0.5,), {"scale": 2.0}))
    ) == pytest.approx(mse, rel=1e-6)


def test_unknown_metric_raises(yy):
    y_hat, y, mask = yy
    with pytest.raises(ValueError):
        eh.loss_fn(y_hat, y, mask, "not_a_metric")


def test_register_metric(yy):
    y_hat, y, mask = yy

    def half_mse(yh, yv, m):
        return 0.5 * eh.masked_mean((yh - yv) ** 2, m.astype(np.float32))

    eh.register_metric("half_mse", half_mse)
    assert float(eh.loss_fn(y_hat, y, mask, "half_mse")) == pytest.approx(
        0.5 * float(eh.loss_fn(y_hat, y, mask, "mse")), rel=1e-6
    )


def test_directions():
    assert eh.best_direction("mse") == "min"
    assert eh.best_direction("r2") == "max"
    assert eh.is_better(0.1, 0.2, "mse")
    assert eh.is_better(0.9, 0.5, "r2")
    with pytest.raises(ValueError):
        eh.check_training_loss("nse")
    eh.check_training_loss("nseLoss")  # no error


def test_loss_specs_normalization():
    from easyhybrid_tpu.losses.specs import to_loss_spec, loss_name

    assert loss_name(to_loss_spec("mse")) == "mse"

    def myloss(yh, yv, m):
        return 0.0

    assert loss_name(to_loss_spec(myloss)) == "myloss"
    spec = to_loss_spec((myloss, (1.0,), {"k": 2}))
    assert loss_name(spec) == "myloss"
    pt = eh.PerTarget(["mse", myloss])
    assert len(pt.losses) == 2


def test_compute_loss_train_and_eval(rbq10_model, rbq10_df):
    import jax

    model = rbq10_model
    data = eh.prepare_data(model, rbq10_df)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = ((data.x, data.forcing), (data.y, None))

    logging_train = eh.LoggingLoss(training_loss="mse", train_mode=True)
    loss, new_state = eh.compute_loss(model, params, state, batch, logging_train)
    assert np.isfinite(float(loss))

    logging_eval = eh.LoggingLoss(
        loss_types=("mse", "r2", "mae"), agg="sum", train_mode=False
    )
    metrics, _, outputs = eh.compute_loss(
        model, params, state, batch, logging_eval
    )
    assert set(metrics) == {"mse", "r2", "mae"}
    assert set(metrics["mse"]) == {"reco", "sum"}
    assert "reco" in outputs and "parameters" in outputs


def test_compute_loss_per_target_and_extra(rng):
    """Two-target model with PerTarget losses and an extra_loss."""
    import jax

    def mech(*, f, a, b):
        return {"t1": a * f, "t2": b + f}

    model = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t1", "t2"],
        mechanistic_model=mech,
        parameters={"a": (1.0, 0.0, 2.0), "b": (0.5, 0.0, 1.0)},
        neural_param_names=["a"],
        global_param_names=["b"],
        hidden_layers=[4],
    )
    params, state = model.init(jax.random.PRNGKey(0))
    n = 32
    x = rng.normal(size=(n, 1)).astype(np.float32)
    f = rng.normal(size=n).astype(np.float32)
    y = {"t1": rng.normal(size=n).astype(np.float32),
         "t2": rng.normal(size=n).astype(np.float32)}
    batch = ((x, {"f": f}), (y, None))

    logging = eh.LoggingLoss(
        training_loss=eh.PerTarget(["mse", "mae"]),
        extra_loss=eh.l2_extra_loss(0.1),
        train_mode=True,
    )
    loss, _ = eh.compute_loss(model, params, state, batch, logging)
    assert np.isfinite(float(loss))

    # agg=mean vs sum differ
    l_sum, _ = eh.compute_loss(
        model, params, state, batch,
        eh.LoggingLoss(training_loss="mse", agg="sum", train_mode=True),
    )
    l_mean, _ = eh.compute_loss(
        model, params, state, batch,
        eh.LoggingLoss(training_loss="mse", agg="mean", train_mode=True),
    )
    np.testing.assert_allclose(float(l_sum) / 2, float(l_mean), rtol=1e-6)


def test_sequence_alignment():
    """Prediction over input_window aligns to trailing output_window
    (reference compute_loss.jl:104-110)."""
    from easyhybrid_tpu.losses.compute import align_prediction

    y_hat = np.arange(24, dtype=np.float32).reshape(2, 12)
    y = np.zeros((2, 3), np.float32)
    out = align_prediction(y_hat, y)
    np.testing.assert_array_equal(out, y_hat[:, -3:])
    # 1-D passes through
    v = np.arange(5, dtype=np.float32)
    np.testing.assert_array_equal(align_prediction(v, v), v)


def test_sigma_tuple_targets(rbq10_model, rbq10_df):
    """(y_obs, sigma) targets feed custom losses with sigma= kwarg
    (reference compute_loss.jl:200-205)."""
    import jax

    model = rbq10_model
    data = eh.prepare_data(model, rbq10_df)
    params, state = model.init(jax.random.PRNGKey(0))
    sigma = np.full(data.n_samples, 0.5, np.float32)

    def chi2(yh, yv, m, sigma=1.0):
        return eh.masked_mean(((yh - yv) / sigma) ** 2, m)

    y = {"reco": (data.y["reco"], sigma)}
    batch = ((data.x, data.forcing), (y, None))
    logging = eh.LoggingLoss(training_loss=chi2, train_mode=True)
    loss, _ = eh.compute_loss(model, params, state, batch, logging)
    # chi2 with sigma=0.5 is 4x the plain mse of the same residuals
    logging_mse = eh.LoggingLoss(training_loss="mse", train_mode=True)
    batch_plain = ((data.x, data.forcing), ({"reco": data.y["reco"]}, None))
    mse, _ = eh.compute_loss(model, params, state, batch_plain, logging_mse)
    np.testing.assert_allclose(float(loss), 4 * float(mse), rtol=1e-5)

    # named metrics reject sigma tuples
    with pytest.raises(ValueError):
        eh.loss_fn(data.y["reco"], (data.y["reco"], sigma), None, "mse")


def test_extra_loss_dict_in_eval(rbq10_model, rbq10_df):
    """extra_loss returning a dict appears as named eval entries
    (reference compute_loss.jl:39-44)."""
    import jax

    model = rbq10_model
    data = eh.prepare_data(model, rbq10_df)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = ((data.x, data.forcing), (data.y, None))

    def extra(outputs, params):
        return {"l2": eh.weight_l2(params), "tiny": 0.001}

    logging = eh.LoggingLoss(
        loss_types=("mse",), extra_loss=extra, train_mode=False
    )
    metrics, _, _ = eh.compute_loss(model, params, state, batch, logging)
    assert "extra_loss" in metrics
    assert {"l2", "tiny", "sum"} <= set(metrics["extra_loss"])

    # train mode: dict values aggregate into the scalar
    logging_t = eh.LoggingLoss(
        training_loss="mse", extra_loss=extra, train_mode=True
    )
    loss, _ = eh.compute_loss(model, params, state, batch, logging_t)
    assert np.isfinite(float(loss))


def test_elementwise_loss_pinball_huber(yy):
    """Declarative ElementwiseLoss applies the masked-mean reduction over
    the per-element values; pinball/huber match numpy closed forms on the
    masked subset (reference analog: the hand-written pinball loss of
    projects/RbQ10/Q10.jl:56-62)."""
    y_hat, y, mask = yy
    yh, yv = _np_subset(y_hat, y, mask)

    r = yh - yv
    for tau in (0.1, 0.5, 0.9):
        want = np.mean(tau * np.maximum(r, 0) + (tau - 1) * np.minimum(r, 0))
        got = float(eh.pinball(tau)(y_hat, y, mask))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    for delta in (0.3, 1.0):
        a = np.abs(r)
        want = np.mean(
            np.where(a <= delta, 0.5 * a * a, delta * (a - 0.5 * delta))
        )
        got = float(eh.huber(delta)(y_hat, y, mask))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    # sum normalization
    a = np.abs(r)
    want = np.sum(np.where(a <= 1.0, 0.5 * a * a, 1.0 * (a - 0.5)))
    got = float(eh.huber(1.0, normalize="sum")(y_hat, y, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5)

    with pytest.raises(ValueError):
        eh.pinball(0.5, normalize="median")

    # direction: any ElementwiseLoss is a minimize loss and a legal
    # training loss
    eh.check_training_loss(eh.pinball(0.9))
    assert eh.is_better(0.1, 0.2, eh.pinball(0.9))


def test_elementwise_loss_as_training_loss(rbq10_model, rbq10_df):
    """ElementwiseLoss flows through compute_loss train mode like any spec."""
    import jax

    model = rbq10_model
    data = eh.prepare_data(model, rbq10_df)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = ((data.x, data.forcing), (data.y, None))
    logging = eh.LoggingLoss(training_loss=eh.pinball(0.5), train_mode=True)
    loss, _ = eh.compute_loss(model, params, state, batch, logging)
    # tau=0.5 pinball == 0.5 * mae
    logging_mae = eh.LoggingLoss(training_loss="mae", train_mode=True)
    mae, _ = eh.compute_loss(model, params, state, batch, logging_mae)
    np.testing.assert_allclose(float(loss), 0.5 * float(mae), rtol=1e-5)


def test_sigma_nan_at_masked_rows_is_sanitized():
    """Regression: sigma was forwarded raw — NaN sigma at masked-out rows
    (the typical missing-data layout) poisoned the loss via NaN*0."""
    import jax.numpy as jnp

    from easyhybrid_tpu.losses.metrics import loss_fn, masked_mean

    y = jnp.array([1.0, 2.0, jnp.nan, 4.0])
    sigma = jnp.array([0.5, 0.5, jnp.nan, 0.5])
    y_hat = jnp.array([1.0, 2.5, 9.0, 4.5])
    mask = jnp.isfinite(y)

    def chi2(yh, yv, m, sigma=1.0):
        return masked_mean(((yh - yv) / sigma) ** 2, m)

    val = float(loss_fn(y_hat, (y, sigma), mask, chi2))
    assert np.isfinite(val)
    np.testing.assert_allclose(val, ((0.5/0.5)**2 + (0.5/0.5)**2) / 3, rtol=1e-6)


def test_elementwise_loss_rejects_sigma_tuple():
    """Regression: ElementwiseLoss silently stacked a (y, sigma) tuple into
    a (2, N) target; it must reject like named registry metrics do."""
    import jax.numpy as jnp

    from easyhybrid_tpu.losses.metrics import pinball

    y = jnp.ones(4)
    with pytest.raises(ValueError, match="sigma"):
        pinball(0.5)(jnp.ones(4), (y, y), jnp.ones(4))


def test_best_direction_resolves_loss_specs():
    """Regression: LossSpec-wrapped maximize metrics bypassed the
    training-loss direction guard (best_direction only knew raw strings)."""
    from easyhybrid_tpu.losses.metrics import best_direction, check_training_loss
    from easyhybrid_tpu.losses.specs import SymbolicLoss

    assert best_direction(SymbolicLoss("r2")) == "max"
    assert best_direction(SymbolicLoss("mse")) == "min"
    with pytest.raises(ValueError, match="maximized"):
        check_training_loss(SymbolicLoss("r2"))
    # ... and through the user-facing config validation (it used to gate
    # the check on isinstance(str), so spec wrappers bypassed it)
    from easyhybrid_tpu.config.train_config import TrainConfig, validate_config

    with pytest.raises(ValueError, match="maximized"):
        validate_config(TrainConfig(training_loss=SymbolicLoss("r2")))
    validate_config(TrainConfig(training_loss=SymbolicLoss("mse")))


def test_register_metric_maximize_visible_to_from_imports():
    """Regression: register_metric rebound MAXIMIZE_METRICS, so modules
    holding a from-import of the set never saw custom maximize metrics."""
    from easyhybrid_tpu.losses import metrics as M
    from easyhybrid_tpu.losses.metrics import MAXIMIZE_METRICS as imported_set

    name = "_test_maxmetric"
    try:
        M.register_metric(name, lambda yh, y, m: 1.0, maximize=True)
        assert name in imported_set  # the SAME object must have gained it
        assert M.best_direction(name) == "max"
    finally:
        M.METRICS.pop(name, None)
        M.MAXIMIZE_METRICS.discard(name)
