"""Fused Pallas epoch kernel: correctness vs the XLA scan epoch
(interpret mode on CPU; the real kernel runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import easyhybrid_tpu as eh
from easyhybrid_tpu.data.loaders import build_epoch_tensors
from easyhybrid_tpu.ops.fused_epoch import (
    init_fused_opt_state,
    make_fused_epoch,
    supports_fused_epoch,
)
from easyhybrid_tpu.training.epoch import make_train_epoch
from easyhybrid_tpu.training.train import fit_input_norm


def _setup(hidden=(8,), n=512, batch=128, static_norm=True):
    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers=list(hidden),
        activation="tanh",
        scale_nn_outputs=True,
        input_batchnorm="static" if static_norm else False,
    )
    df = eh.gen_rbq10_data(n, seed=42)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, batch))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    return model, params, state, tensors


def test_supports_fused_epoch():
    model, *_ = _setup()
    ll = eh.LoggingLoss(training_loss="mse")
    assert supports_fused_epoch(model, ("adam", 0.01), ll)
    assert supports_fused_epoch(model, "sgd", ll)
    assert supports_fused_epoch(model, {"nn": "adam"}, ll)  # per-branch (round 3)
    # the declarative weight-L2 extra loss IS fused (symbolic gradient);
    # arbitrary extra_loss callables are not
    assert supports_fused_epoch(
        model, ("adam", 0.01), eh.LoggingLoss(extra_loss=eh.l2_extra_loss())
    )
    assert not supports_fused_epoch(
        model, ("adam", 0.01),
        eh.LoggingLoss(extra_loss=lambda outputs, params: 0.0),
    )
    # trainable BN supported since round 3 (batch stats + carried EMA)
    m2 = eh.construct_hybrid_model(
        predictors=["sw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=model.mechanistic_model,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        input_batchnorm=True,
    )
    assert supports_fused_epoch(m2, ("adam", 0.01), ll)


@pytest.mark.parametrize("opt", [("adam", 0.01), ("sgd", 0.05)])
def test_fused_matches_xla_epoch(opt):
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))

    fused = make_fused_epoch(model, state, opt, ll, shuffle=False)
    p_f, os_f, _, loss_f = fused(
        jax.tree.map(jnp.array, params),
        init_fused_opt_state(params),
        state,
        tensors,
        jax.random.PRNGKey(1),
    )

    optimizer = (
        optax.adam(opt[1]) if opt[0] == "adam" else optax.sgd(opt[1])
    )
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params),
        optimizer.init(params),
        state,
        tensors,
        jax.random.PRNGKey(1),
    )

    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # forward-mode-only kernel emits the epoch loss again (round 2)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_multi_epoch_consistency():
    """Adam bias-correction step counter carries across epochs."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)

    p_f = jax.tree.map(jnp.array, params)
    os_f = init_fused_opt_state(params)
    p_x = jax.tree.map(jnp.array, params)
    os_x = optimizer.init(params)
    s_f = jax.tree.map(jnp.array, state)
    s_x = jax.tree.map(jnp.array, state)
    for e in range(3):
        p_f, os_f, s_f, loss_f = fused(p_f, os_f, s_f, tensors, jax.random.PRNGKey(e))
        p_x, os_x, s_x, loss_x = xla(p_x, os_x, s_x, tensors, jax.random.PRNGKey(e))
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_with_nan_targets():
    model, params, state, _ = _setup()
    df = eh.gen_rbq10_data(256, seed=3, nan_frac=0.5)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=True)
    p, o, _, loss = fused(
        jax.tree.map(jnp.array, params),
        init_fused_opt_state(params),
        state,
        tensors,
        jax.random.PRNGKey(0),
    )
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(p))


def test_train_with_use_pallas_flag():
    """train(use_pallas=True) runs the fused path (interpret mode on CPU)."""
    df = eh.gen_rbq10_data(300, seed=11)

    def rbq10(*, ta, rb, Q10):
        return {"reco": rb * Q10 ** (0.1 * (ta - 15.0))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], scale_nn_outputs=True, input_batchnorm="static",
    )
    res = eh.train(
        model, df, nepochs=3, batchsize=64, optimizer=("adam", 0.02),
        use_pallas=True, show_progress=False,
    )
    assert np.isfinite(res.best_loss)
    # and it actually learns a bit
    assert res.best_loss <= res.val_history[0]["mse"]["sum"]
    # stray truthy/falsy values normalize instead of NameError-ing in the
    # engine selection (review finding, round 3)
    res1 = eh.train(
        model, df, nepochs=1, batchsize=64, use_pallas=1, show_progress=False,
    )
    assert np.isfinite(res1.best_loss)
    # ... and 1 means FORCED, exactly like True (1 == True used to dodge
    # the normalization, silently downgrading to the auto backend gate
    # which disqualifies the kernel on CPU)
    res_true = eh.train(
        model, df, nepochs=1, batchsize=64, use_pallas=True,
        show_progress=False,
    )
    assert res1.epoch_path == res_true.epoch_path
    res0 = eh.train(
        model, df, nepochs=1, batchsize=64, use_pallas=0, show_progress=False,
    )
    assert res0.epoch_path == "xla_scan"


def test_fused_forward_matches_apply():
    """Pallas fused forward (interpret on CPU) matches model.apply."""
    from easyhybrid_tpu.ops.fused_forward import (
        make_fused_forward,
        supports_fused_forward,
    )

    model, params, state, _ = _setup(hidden=(8,), n=512, batch=128)
    assert supports_fused_forward(model)
    df = eh.gen_rbq10_data(256, seed=5)
    data = eh.prepare_data(model, df)
    fwd = make_fused_forward(model, params, state, batch_size=128)
    out = fwd(jnp.asarray(data.x), {k: jnp.asarray(v) for k, v in data.forcing.items()})
    ref_out, _ = model.apply(params, state, (data.x, data.forcing))
    np.testing.assert_allclose(
        np.asarray(out["reco"]), np.asarray(ref_out["reco"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("opt", [("adamw", 0.01), ("rmsprop", 0.02),
                                 ("adam", 0.01, {"b1": 0.8}),
                                 # two-slot-state rules (late round 3)
                                 ("adagrad", 0.02),
                                 ("adagrad", 0.02,
                                  {"initial_accumulator_value": 0.0}),
                                 ("lion", 0.001),
                                 ("lion", 0.003, {"weight_decay": 0.1}),
                                 ("adamax", 0.01),
                                 ("nadam", 0.01),
                                 # adadelta's two EMAs ride the (m, v)
                                 # slots; amsgrad carries the 3rd u slot
                                 ("adadelta", 0.5),
                                 ("adadelta", 0.5, {"rho": 0.8,
                                                    "weight_decay": 1e-3}),
                                 ("amsgrad", 0.01),
                                 ("amsgrad", 0.01, {"b1": 0.8}),
                                 # 4 steps stay in the ro<threshold
                                 # momentum-only regime (the rectified
                                 # regime has a dedicated longer test)
                                 ("radam", 0.02),
                                 ("sgd", 0.02, 0.9),         # heavy-ball
                                 ("sgd", 0.02, 0.9, True)])  # nesterov
def test_fused_widened_optimizers(opt):
    """adamw / rmsprop / adagrad / lion / adamax / nadam / adadelta /
    amsgrad / kwarg-form hyperparameters match optax exactly."""
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    if isinstance(opt[-1], dict):
        opt = (opt[0], {**opt[-1], "learning_rate": opt[1]})
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, opt, ll)
    fused = make_fused_epoch(model, state, opt, ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params, opt),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = resolve_optimizer(opt, params)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


@pytest.mark.parametrize("loss_name", ["mae", "rmse"])
def test_fused_widened_losses(loss_name):
    """Hand-written mae/rmse cotangents match jax.grad through the metrics."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss=loss_name, loss_types=(loss_name,))
    assert supports_fused_epoch(model, ("sgd", 0.05), ll)
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.sgd(0.05)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_multi_target_masked():
    """Two targets with NaN masks + agg='mean' match the XLA epoch."""
    def mech(*, ta, rb, gpp_max, Q10):
        reco = rb * Q10 ** (0.1 * (ta - 15.0))
        gpp = gpp_max * (1.0 - jnp.exp(-0.1 * ta))
        return {"reco": reco, "nee": reco - gpp}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"],
        targets=["reco", "nee"], mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "gpp_max": (5.0, 0.0, 20.0),
                    "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb", "gpp_max"], global_param_names=["Q10"],
        hidden_layers=[8], activation="tanh",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(512, seed=7)
    rng = np.random.default_rng(0)
    reco = np.asarray(df["reco"], np.float32)
    nee = reco - 5.0 * (1.0 - np.exp(-0.1 * np.asarray(df["ta"], np.float32)))
    for col, vals in (("reco", reco.copy()), ("nee", nee)):
        vals = np.asarray(vals, np.float32)
        vals[rng.random(len(vals)) < 0.15] = np.nan
        df[col] = vals
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 128))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",), agg="mean")

    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_epochs_per_call_and_shuffle_parity():
    """epochs_per_call scans match the XLA path epoch-for-epoch, including
    the shared shuffle permutations (same keys → same realized order)."""
    model, params, state, tensors = _setup(n=512, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    E = 3
    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=E
    )
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(9),
    )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=True, epochs_per_call=E)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(9),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)


def test_fused_exactness_gate_passes_in_interpret():
    from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check

    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    ok, gdiff = fused_exactness_check(
        model, params, state, ("adam", 0.01), ll, tensors
    )
    assert ok and gdiff < 1e-3


def test_parse_opt_spec_envelope():
    from easyhybrid_tpu.ops.fused_epoch import parse_opt_spec

    assert parse_opt_spec("adam") == ("adam", dict(
        learning_rate=0.01, b1=0.9, b2=0.999, eps=1e-8))
    assert parse_opt_spec(("rmsprop", 0.003))[1]["learning_rate"] == 0.003
    assert parse_opt_spec(("adamw", {"weight_decay": 0.01}))[1]["weight_decay"] == 0.01
    assert parse_opt_spec(("sgd", {"momentum": 0.9}))[1]["momentum"] == 0.9
    assert parse_opt_spec(("rmsprop", {"centered": True})) is None  # not fused
    assert parse_opt_spec("lbfgs") is None
    assert parse_opt_spec(("adam", "bad")) is None
    # late-round-3 rules: defaults mirror the optax constructors
    assert parse_opt_spec("adagrad") == ("adagrad", dict(
        learning_rate=0.01, initial_accumulator_value=0.1, eps=1e-7))
    assert parse_opt_spec(("lion", 0.001))[1]["weight_decay"] == 1e-3
    # optax.lion's 4th positional is mu_dtype — tuple form stops at b2
    assert parse_opt_spec(("lion", 0.01, 0.9, 0.99, 1e-3)) is None
    assert parse_opt_spec(("nadam", 0.01))[1]["eps_root"] == 0.0
    assert parse_opt_spec(("adamax", 0.01, 0.8))[1]["b1"] == 0.8
    # fused since late round 3: adadelta rides (m, v); amsgrad uses the
    # optional third u slot (spec_uses_slot3 drives its allocation)
    from easyhybrid_tpu.ops.fused_epoch import spec_uses_slot3

    assert parse_opt_spec("amsgrad") == ("amsgrad", dict(
        learning_rate=0.01, b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0))
    assert parse_opt_spec(("adadelta", 0.01))[1]["rho"] == 0.9
    assert spec_uses_slot3("amsgrad")
    assert spec_uses_slot3({"nn": ("amsgrad", 0.01)})
    assert not spec_uses_slot3(("adadelta", 0.01))
    assert not spec_uses_slot3("adam")
    # round 5: noisy_sgd parses — its gradient-independent noise stream is
    # pre-generated XLA-side and streamed into the kernel per step
    assert parse_opt_spec(("noisy_sgd", 0.05, 0.02))[1]["eta"] == 0.02
    assert parse_opt_spec("noisy_sgd")[1]["gamma"] == 0.55
    # a spec naming its own RNG key is NOT fused (the kernel pins optax's
    # default jax.random.key(0) stream)
    assert parse_opt_spec(("noisy_sgd", {"key": 7})) is None
    # per-branch noise would need masked-subtree key splitting: XLA path
    from easyhybrid_tpu.ops.fused_epoch import parse_branch_specs

    assert parse_branch_specs({"nn": "noisy_sgd"}) is None


def test_fused_multinn_matches_xla():
    """MultiNN (one single-output MLP per neural parameter, own predictor
    sets) through the fused kernel matches the XLA epoch + gate passes."""
    from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check

    def mech(*, ta, rb, gpp_max, Q10):
        reco = rb * Q10 ** (0.1 * (ta - 15.0))
        gpp = gpp_max * (1.0 - jnp.exp(-0.1 * ta))
        return {"nee": reco - gpp}

    model = eh.construct_hybrid_model(
        predictors={"rb": ["sw_pot", "dsw_pot"], "gpp_max": ["sw_pot"]},
        forcing=["ta"], targets=["nee"], mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "gpp_max": (5.0, 0.0, 20.0),
                    "Q10": (2.0, 1.0, 4.0)},
        global_param_names=["Q10"],
        hidden_layers=[8], activation="tanh",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll)

    df = eh.gen_rbq10_data(512, seed=13)
    ta = np.asarray(df["ta"], np.float32)
    df["nee"] = np.asarray(df["reco"], np.float32) - 5.0 * (
        1.0 - np.exp(-0.1 * ta)
    )
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 128))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)

    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)

    ok, gdiff = fused_exactness_check(
        model, params, state, ("adam", 0.01), ll, tensors
    )
    assert ok and gdiff < 1e-3


def test_fused_l2_extra_loss_matches_xla():
    """The declarative weight-L2 extra loss is fused (value + symbolic
    2·scale·w/count gradient) and matches the XLA path, for both aggs."""
    for agg in ("sum", "mean"):
        model, params, state, tensors = _setup()
        ll = eh.LoggingLoss(
            training_loss="mse", loss_types=("mse",), agg=agg,
            extra_loss=eh.l2_extra_loss(0.5),
        )
        assert supports_fused_epoch(model, ("adam", 0.01), ll)
        fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
        p_f, _, _, loss_f = fused(
            jax.tree.map(jnp.array, params), init_fused_opt_state(params),
            state, tensors, jax.random.PRNGKey(1),
        )
        optimizer = optax.adam(0.01)
        xla = make_train_epoch(model, ll, optimizer, shuffle=False)
        p_x, _, _, loss_x = xla(
            jax.tree.map(jnp.array, params), optimizer.init(params),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
        )
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6,
                err_msg=f"agg={agg}",
            )
        np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
    # arbitrary extra_loss callables stay on the XLA path
    ll_custom = eh.LoggingLoss(
        training_loss="mse", extra_loss=lambda outputs, params: 0.0
    )
    assert not supports_fused_epoch(model, ("adam", 0.01), ll_custom)


def test_fused_adam_masked_first_batch_no_nan():
    """A fully-masked FIRST batch at optimizer step 0 must not NaN-corrupt
    parameters: adam's bias correction is 0/0 when the step counter stays 0
    and the arithmetic valid-gate would propagate it (0*NaN=NaN)."""
    model, params, state, tensors = _setup(n=256, batch=128)
    tensors = tensors._replace(
        mask={k: v.at[0].set(0.0) for k, v in tensors.mask.items()}
    )
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(p_f))
    assert np.isfinite(float(loss_f))
    # and matches the XLA path, which tree-selects the update away
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(0),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_rejects_unknown_shuffle_mode():
    """Unsupported shuffle modes must raise, never silently train
    unshuffled (the XLA path raises for per_shard without a mesh)."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    with pytest.raises(ValueError, match="shuffle"):
        make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle="per_shard")


def test_fused_batch_shuffle_order_parity():
    """shuffle='batches' realizes the same batch order on both paths for
    the same key (both use epoch_permutation's key-sort)."""
    model, params, state, tensors = _setup(n=512, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle="batches")
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(3),
    )
    optimizer = optax.sgd(0.05)
    xla = make_train_epoch(model, ll, optimizer, shuffle="batches")
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_stack_cap_fallback_matches_single_launch(monkeypatch):
    """With the stacked-copy memory cap forced to 0 the shuffled multi-epoch
    path falls back to one launch per epoch (lax.scan) and must produce the
    same trajectory as the all-epochs-in-one-launch path."""
    model, params, state, tensors = _setup(n=512, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    E = 3

    single = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=E
    )
    p_s, _, _, loss_s = single(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(11),
    )

    monkeypatch.setenv("EASYHYBRID_FUSED_STACK_MB", "0")
    scan = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=E
    )
    p_c, _, _, loss_c = scan(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(11),
    )
    np.testing.assert_allclose(float(loss_s), float(loss_c), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gate_verdict_disk_cache(tmp_path, monkeypatch):
    """The exactness-gate verdict is persisted per configuration so repeat
    runs skip the gate's device readback entirely."""
    import json
    import os

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    from easyhybrid_tpu.ops.fused_epoch import (
        _gate_cache_path,
        fused_exactness_check,
    )

    model, params, state, tensors = _setup(n=256, batch=128)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    ok1, g1 = fused_exactness_check(model, params, state, ("adam", 0.01), ll, tensors)
    assert ok1
    path = _gate_cache_path()
    assert os.path.exists(path)
    entries = json.load(open(path))
    assert len(entries) == 1
    # cached verdict is returned verbatim (poison the stored value to prove
    # the second call reads the cache instead of recomputing)
    key = next(iter(entries))
    entries[key] = [False, 123.0]
    json.dump(entries, open(path, "w"))
    ok2, g2 = fused_exactness_check(model, params, state, ("adam", 0.01), ll, tensors)
    assert ok2 is False and g2 == 123.0
    # and EASYHYBRID_GATE_CACHE=0 bypasses it
    monkeypatch.setenv("EASYHYBRID_GATE_CACHE", "0")
    ok3, _ = fused_exactness_check(model, params, state, ("adam", 0.01), ll, tensors)
    assert ok3


@pytest.mark.parametrize(
    "spec",
    [
        {"globals": ("sgd", 0.1)},                      # nn -> default adam
        {"nn": ("adam", 0.02), "Q10": ("sgd", 0.05)},   # specific global
        {"nn": ("rmsprop", 0.005), "globals": ("adamw", 0.01)},
        {"nn": ("lion", 0.001), "globals": ("nadam", 0.02)},  # round-3 rules
    ],
)
def test_fused_per_branch_optimizers_match_multi_transform(spec):
    """Per-branch dict specs run fused with one update rule per leaf and
    match optax.multi_transform exactly (train.jl:74-93 parity path)."""
    from easyhybrid_tpu.ops.fused_epoch import (
        parse_branch_specs,
        supports_fused_epoch,
    )
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    model, params, state, tensors = _setup()
    logging = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert parse_branch_specs(spec) is not None
    assert supports_fused_epoch(model, spec, logging)

    fused = make_fused_epoch(
        model, state, spec, logging, shuffle=False, epochs_per_call=3,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )

    optimizer = resolve_optimizer(spec, params)  # multi_transform: no flatten
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=3
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )


def test_fused_per_branch_rejects_unfusable_branch():
    from easyhybrid_tpu.ops.fused_epoch import parse_branch_specs

    assert parse_branch_specs({"globals": "lbfgs"}) is None
    # sgd momentum is fusable since late round 3
    assert parse_branch_specs({"nn": ("sgd", 0.1, 0.9)}) is not None
    assert parse_branch_specs(
        {"nn": ("rmsprop", {"centered": True})}
    ) is None  # centered rmsprop: third state slot
    assert parse_branch_specs("adam") is None  # not a dict


def test_train_per_branch_optimizer_runs_fused():
    """e2e: a dict optimizer spec selects the fused kernel (forced candidate
    on CPU) and trains to a finite loss."""
    model, *_ = _setup()
    df = eh.gen_rbq10_data(400, seed=3)
    res = eh.train(
        model, df, nepochs=3, batchsize=128, show_progress=False,
        optimizer={"globals": ("sgd", 0.1), "nn": ("adam", 0.02)},
        use_pallas=True,
    )
    assert np.isfinite(res.best_loss)
    assert res.epoch_path == "fused_pallas"


def test_fused_trainable_batchnorm_matches_xla_epoch():
    """input_batchnorm=True (the README quick-start default) runs fused:
    batch-stat normalization + EMA running-stats state carried in-kernel,
    matching the XLA path's params AND state over multiple epochs."""
    model, params, state, tensors = _setup(static_norm=False)
    # rebuild with TRAINABLE input batchnorm
    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=model.mechanistic_model,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], activation="tanh",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    params, state = model.init(jax.random.PRNGKey(0))
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll)

    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=False, epochs_per_call=3
    )
    p_f, _, s_f, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, ll, optimizer, shuffle=False, epochs_per_call=3
    )
    p_x, _, s_x, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=f"params {path}",
        )
    # running stats advanced identically (state parity)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_f)[0],
        jax.tree_util.tree_flatten_with_path(s_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=f"state {path}",
        )
    # stats actually moved (training mode, not static passthrough)
    assert not np.allclose(
        np.asarray(s_f["nn"]["norm"]["mean"]),
        np.asarray(state["nn"]["norm"]["mean"]),
    )


def test_fused_trainable_batchnorm_shuffled_multinn():
    """Trainable BN also holds for MultiNN branches under the shuffled
    stacked grid."""
    def mech(*, ta, rb, q, Q10):
        return {"reco": rb * Q10 ** (0.1 * (ta - 15.0)) + 0.1 * q}

    model = eh.construct_hybrid_model(
        predictors={"rb": ["sw_pot"], "q": ["dsw_pot"]},
        forcing=["ta"], targets=["reco"],
        mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "q": (1.0, 0.0, 5.0),
                    "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb", "q"], global_param_names=["Q10"],
        hidden_layers=[6], activation="tanh",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(256, seed=5)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    params, state = model.init(jax.random.PRNGKey(0))
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))

    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=2
    )
    p_f, _, s_f, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(2),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, ll, optimizer, shuffle=True, epochs_per_call=2
    )
    p_x, _, s_x, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(2),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_f), jax.tree.leaves(s_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def _setup_lstm(n=600, batch=128, input_window=6, output_window=2,
                hidden=8, norm="static"):
    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers={"lstm": hidden}, activation="swish",
        scale_nn_outputs=True, input_batchnorm=norm,
    )
    from easyhybrid_tpu.data.sequences import split_into_sequences

    df = eh.gen_rbq10_data(n, seed=21)
    data = split_into_sequences(
        eh.prepare_data(model, df), input_window=input_window,
        output_window=output_window,
    )
    tensors = jax.device_put(build_epoch_tensors(data, batch))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    return model, params, state, tensors


@pytest.mark.parametrize("opt,loss", [(("adam", 0.01), "mse"),
                                      (("sgd", 0.05), "mae")])
def test_fused_lstm_matches_xla_epoch(opt, loss):
    """The LSTM sequence hybrid runs fused: static-unrolled recurrence +
    hand-written BPTT matches the XLA scan path over multiple epochs."""
    model, params, state, tensors = _setup_lstm()
    ll = eh.LoggingLoss(training_loss=loss, loss_types=(loss,))
    assert supports_fused_epoch(model, opt, ll)

    fused = make_fused_epoch(
        model, state, opt, ll, shuffle=False, epochs_per_call=3
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.flatten(
        optax.adam(opt[1]) if opt[0] == "adam" else optax.sgd(opt[1])
    )
    xla = make_train_epoch(
        model, ll, optimizer, shuffle=False, epochs_per_call=3
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )
    assert int(o_f["t"][0]) == 3 * tensors.weight.shape[0]


def test_fused_lstm_shuffled_no_norm():
    """Shuffled stacked grid + no input norm + NaN-masked targets."""
    model, params, state, tensors = _setup_lstm(norm=False)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_epoch(
        model, state, ("adam", 0.02), ll, shuffle=True, epochs_per_call=2
    )
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(5),
    )
    optimizer = optax.flatten(optax.adam(0.02))
    xla = make_train_epoch(
        model, ll, optimizer, shuffle=True, epochs_per_call=2
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(5),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_fused_lstm_envelope():
    model, params, state, tensors = _setup_lstm()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll)
    # rmse joined via the round-4 two-pass scheme
    rmse = eh.LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert supports_fused_epoch(model, ("adam", 0.01), rmse)
    # weight-L2 extra loss targets Dense "w" keys: XLA path
    assert not supports_fused_epoch(
        model, ("adam", 0.01),
        eh.LoggingLoss(extra_loss=eh.l2_extra_loss()),
    )


def test_fused_lstm_window_bound(monkeypatch):
    """Windows beyond the measured envelope (default 32 since the round-4
    checkpointed-recompute backward removed the T=6 Mosaic compile cliff)
    are rejected when tensors are provided; the env knob tightens/widens."""
    model, params, state, tensors = _setup_lstm(input_window=6)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll)  # no tensors
    assert supports_fused_epoch(model, ("adam", 0.01), ll, tensors)
    monkeypatch.setenv("EASYHYBRID_LSTM_FUSED_MAX_T", "4")
    assert not supports_fused_epoch(model, ("adam", 0.01), ll, tensors)
    m4 = _setup_lstm(input_window=4)
    assert supports_fused_epoch(m4[0], ("adam", 0.01), ll, m4[3])


def test_fused_lstm_t10_matches_xla_epoch():
    """The reference LSTM tutorial's 10-step windows run fused (round 4):
    checkpointed-recompute BPTT matches the XLA scan path at T=10."""
    import optax

    model, params, state, tensors = _setup_lstm(
        n=800, input_window=10, output_window=2
    )
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll, tensors)
    key = jax.random.PRNGKey(2)
    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=2
    )
    p_f, _, _, l_f = fused(
        jax.tree.map(jnp.array, params),
        init_fused_opt_state(params), state, tensors, key,
    )
    opt = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(model, ll, opt, shuffle=True, epochs_per_call=2)
    p_x, _, _, l_x = xla(
        jax.tree.map(jnp.array, params), opt.init(params),
        jax.tree.map(jnp.array, state), tensors, key,
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)


# --------------------------------------------------------------------------
# round 3 (late): nseLoss + declarative ElementwiseLoss in-kernel
# --------------------------------------------------------------------------

def test_fused_nse_loss_matches_xla_epoch():
    """nseLoss (per-batch SSE/SST) hand-written cotangent matches jax.grad
    through the metric on the XLA path."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="nseLoss", loss_types=("nseLoss",))
    assert supports_fused_epoch(model, ("sgd", 0.05), ll)
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.sgd(0.05)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_nse_loss_with_nans_multi_target():
    """nseLoss per-target batch statistics honor the NaN mask (two targets,
    agg='mean')."""
    def mech(*, ta, rb, gpp_max, Q10):
        reco = rb * Q10 ** (0.1 * (ta - 15.0))
        return {"reco": reco, "nee": reco - gpp_max}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"],
        targets=["reco", "nee"], mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "gpp_max": (5.0, 0.0, 20.0),
                    "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb", "gpp_max"], global_param_names=["Q10"],
        hidden_layers=[8], input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(256, seed=5, nan_frac=0.3)
    df["nee"] = df["reco"] - 2.0
    df.loc[df.index[::3], "nee"] = np.nan
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)

    ll = eh.LoggingLoss(training_loss="nseLoss", loss_types=("nseLoss",),
                        agg="mean")
    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


@pytest.mark.parametrize("spec_fn", [lambda: eh.pinball(0.3),
                                     lambda: eh.pinball(0.9),
                                     lambda: eh.huber(0.7),
                                     lambda: eh.huber(1.0, normalize="sum")])
def test_fused_elementwise_loss_matches_xla(spec_fn):
    """Declarative ElementwiseLoss (pinball/huber) is differentiated
    in-kernel via the diagonal-Jacobian jvp and matches the XLA epoch's
    jax.grad through the same spec."""
    spec = spec_fn()
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss=spec, loss_types=("mse",))
    assert supports_fused_epoch(model, ("sgd", 0.02), ll)
    fused = make_fused_epoch(model, state, ("sgd", 0.02), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.sgd(0.02)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    # "sum" normalization scales gradients ~batchsize×: scale the float
    # tolerance with it
    atol = 5e-6 if spec.normalize == "mean" else 5e-5
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_elementwise_loss_nan_targets():
    """ElementwiseLoss masking matches the XLA path under 50% NaN targets."""
    model, params, state, _ = _setup()
    df = eh.gen_rbq10_data(256, seed=3, nan_frac=0.5)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    ll = eh.LoggingLoss(training_loss=eh.pinball(0.8), loss_types=("mse",))
    fused = make_fused_epoch(model, state, ("adam", 0.01), ll, shuffle=True)
    p_f, _, _, _ = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(7),
    )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=True)
    p_x, _, _, _ = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(7),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_fused_loss_envelope_round3():
    """Envelope: ElementwiseLoss + nseLoss in; arbitrary callables out."""
    model, *_ = _setup()
    opt = ("adam", 0.01)
    assert supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss="nseLoss"))
    assert supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss=eh.pinball(0.5)))
    assert supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss=eh.huber(2.0)))
    # opaque callables / tuple specs / maximize metrics stay on the XLA path
    assert not supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss=lambda yh, y, m: 0.0))
    assert not supports_fused_epoch(
        model, opt,
        eh.LoggingLoss(training_loss=(lambda yh, y, m, tau: 0.0,
                                      {"tau": 0.3})))
    # batch-statistic losses joined the envelope (late round 3)
    assert supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss="kgeLoss"))
    # alpha/beta are diagnostics, not sensible training losses: XLA path
    assert not supports_fused_epoch(
        model, opt, eh.LoggingLoss(training_loss="beta"))


def test_train_pinball_runs_fused():
    """train(training_loss=pinball) picks the fused engine (interpret on
    CPU) and reports it in TrainResults.epoch_path."""
    df = eh.gen_rbq10_data(300, seed=11)
    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=lambda *, ta, rb, Q10: {
            "reco": rb * Q10 ** (0.1 * (ta - 15.0))},
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], input_batchnorm="static",
    )
    res = eh.train(
        model, df, nepochs=3, batchsize=64, training_loss=eh.pinball(0.5),
        loss_types=("mse",), use_pallas=True, plotting=False,
        show_progress=False, save_training=False,
    )
    assert res.epoch_path == "fused_pallas"
    assert np.isfinite(res.best_loss)


@pytest.mark.parametrize("loss_name", ["pearsonLoss", "kgeLoss", "pbkgeLoss"])
def test_fused_stat_losses_match_xla(loss_name):
    """Batch-statistic losses (centered sufficient statistics + scalar jvp
    partials) match jax.grad through the masked metrics on the XLA path."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss=loss_name, loss_types=(loss_name,))
    assert supports_fused_epoch(model, ("sgd", 0.05), ll)
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle=False)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.sgd(0.05)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


@pytest.mark.parametrize("loss_name", ["kgeLoss", "pearsonLoss"])
def test_fused_stat_losses_nan_multi_target(loss_name):
    """Stat-loss batch moments honor per-target NaN masks (two targets,
    agg='mean', shuffled multi-epoch)."""
    def mech(*, ta, rb, gpp_max, Q10):
        reco = rb * Q10 ** (0.1 * (ta - 15.0))
        return {"reco": reco, "nee": reco - gpp_max}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"],
        targets=["reco", "nee"], mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "gpp_max": (5.0, 0.0, 20.0),
                    "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb", "gpp_max"], global_param_names=["Q10"],
        hidden_layers=[8], input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(256, seed=5, nan_frac=0.3)
    df["nee"] = df["reco"] - 2.0
    df.loc[df.index[::3], "nee"] = np.nan
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)

    ll = eh.LoggingLoss(training_loss=loss_name, loss_types=(loss_name,),
                        agg="mean")
    # sgd, not adam: pearson is shift-invariant, so output-bias gradients
    # are mathematically ~0 — adam amplifies their float noise into full
    # +/-lr steps whose sign differs between paths (see memory of round-1
    # exactness findings); sgd keeps noise at noise scale.
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle=True,
                             epochs_per_call=2)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(1),
    )
    optimizer = optax.sgd(0.05)
    xla = make_train_epoch(model, ll, optimizer, shuffle=True,
                           epochs_per_call=2)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_train_kge_loss_runs_fused():
    """train(training_loss='kgeLoss') picks the fused engine end-to-end."""
    df = eh.gen_rbq10_data(300, seed=11)
    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=lambda *, ta, rb, Q10: {
            "reco": rb * Q10 ** (0.1 * (ta - 15.0))},
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], input_batchnorm="static",
    )
    res = eh.train(
        model, df, nepochs=3, batchsize=64, training_loss="kgeLoss",
        loss_types=("kgeLoss", "mse"), use_pallas=True, plotting=False,
        show_progress=False, save_training=False,
    )
    assert res.epoch_path == "fused_pallas"
    assert np.isfinite(res.best_loss)


@pytest.mark.parametrize("shuffle", [False, True])
def test_fused_sub_batch_unroll_parity(shuffle):
    """Sub-batch unrolling (round 3) is semantics-free: unroll=3 over 7
    batches (non-dividing — exercises the zero-mask tail padding) matches
    unroll=1 and the XLA epoch exactly, including the shuffled stacked
    layout and the adam step counter."""
    model, params, state, tensors = _setup(n=7 * 64, batch=64)
    assert tensors.weight.shape[0] == 7
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))

    outs = {}
    for k in (1, 3):
        fused = make_fused_epoch(
            model, state, ("adam", 0.01), ll, shuffle=shuffle,
            epochs_per_call=2, unroll=k,
        )
        outs[k] = fused(
            jax.tree.map(jnp.array, params), init_fused_opt_state(params),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(5),
        )
    optimizer = optax.adam(0.01)
    xla = make_train_epoch(model, ll, optimizer, shuffle=shuffle,
                           epochs_per_call=2)
    p_x, os_x, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(5),
    )
    for k in (1, 3):
        p_f, os_f, _, loss_f = outs[k]
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6,
                err_msg=f"unroll={k}",
            )
        np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
        # step counter counts REAL valid batches, not padded tail slots
        assert int(os_f["t"][0]) == int(os_x[0][0].count) if hasattr(
            os_x[0][0], "count") else True
        assert int(os_f["t"][0]) == 14


def test_fused_unroll_with_trainable_bn_and_l2():
    """Carried BN state and the sub-step-current weight-L2 gradient stay
    exact through the unrolled loop."""
    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(6 * 64, seed=3)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 64))
    params, state = model.init(jax.random.PRNGKey(0))
    ll = eh.LoggingLoss(training_loss="mse", extra_loss=eh.l2_extra_loss(1e-3))

    res = {}
    for k in (1, 4):
        fused = make_fused_epoch(model, state, ("adamw", 0.01), ll,
                                 shuffle=False, unroll=k)
        res[k] = fused(
            jax.tree.map(jnp.array, params), init_fused_opt_state(params),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(1),
        )
    for a, b in zip(jax.tree.leaves(res[1][:3]), jax.tree.leaves(res[4][:3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    np.testing.assert_allclose(float(res[1][3]), float(res[4][3]), rtol=1e-5)


def test_fused_amsgrad_multi_epoch_shuffle_and_branch():
    """The third (nu_max) slot carries across grid steps, stacked shuffled
    epochs, and the lax.scan fallback; per-branch specs may mix a 3-slot
    rule on one branch with 2-slot rules elsewhere."""
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    model, params, state, tensors = _setup(n=6 * 64, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))

    for opt in [("amsgrad", 0.01), {"nn": ("amsgrad", 0.01),
                                    "globals": ("adam", 0.02)}]:
        fused = make_fused_epoch(model, state, opt, ll, shuffle=True,
                                 epochs_per_call=3)
        p_f, os_f, _, loss_f = fused(
            jax.tree.map(jnp.array, params),
            init_fused_opt_state(params, opt),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(2),
        )
        assert "u" in os_f
        optimizer = resolve_optimizer(opt, params)
        if not isinstance(opt, dict):
            optimizer = optax.flatten(optimizer)
        xla = make_train_epoch(model, ll, optimizer, shuffle=True,
                               epochs_per_call=3)
        p_x, _, _, loss_x = xla(
            jax.tree.map(jnp.array, params), optimizer.init(params),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(2),
        )
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6, err_msg=str(opt))
        # slightly looser than the adam cases: exp/log b^t noise compounds
        # through the max() accumulator over 18 steps
        np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=5e-5)
        # nu_max is non-negative everywhere and populated on the amsgrad
        # leaves (2-slot branches legitimately leave their u slot zero)
        assert all(
            float(jnp.min(u)) >= 0.0 for u in jax.tree.leaves(os_f["u"])
        )
        assert any(
            float(jnp.max(u)) > 0.0 for u in jax.tree.leaves(os_f["u"])
        )


def test_fused_amsgrad_scan_fallback_matches_single_launch(monkeypatch):
    """u-slot threading through the per-epoch lax.scan (stack cap 0)."""
    monkeypatch.setenv("EASYHYBRID_FUSED_STACK_MB", "0")
    model, params, state, tensors = _setup(n=4 * 64, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    opt = ("amsgrad", 0.01)
    scan = make_fused_epoch(model, state, opt, ll, shuffle=True,
                            epochs_per_call=2)
    p_s, os_s, _, loss_s = scan(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params, opt),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(7),
    )
    monkeypatch.setenv("EASYHYBRID_FUSED_STACK_MB", "256")
    single = make_fused_epoch(model, state, opt, ll, shuffle=True,
                              epochs_per_call=2)
    p_1, os_1, _, loss_1 = single(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params, opt),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(7),
    )
    for a, b in zip(jax.tree.leaves((p_s, os_s["u"])),
                    jax.tree.leaves((p_1, os_1["u"]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)


def test_fused_radam_rectified_regime():
    """radam across BOTH regimes: 24 steps pass through the t≈5 variance-
    tractability boundary into the rectified update; trajectories must
    match optax (which crosses the same boundary at the same step)."""
    from easyhybrid_tpu.training.optimizers import resolve_optimizer
    from easyhybrid_tpu.ops.fused_epoch import parse_opt_spec

    # pathological thresholds (optax NaNs for ro ∈ (thr, 4)) stay XLA-side
    assert parse_opt_spec(("radam", 0.02, {"threshold": 2.0})) is None
    assert parse_opt_spec(("radam", 0.02))[1]["threshold"] == 5.0

    model, params, state, tensors = _setup(n=12 * 64, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    opt = ("radam", 0.02)
    fused = make_fused_epoch(model, state, opt, ll, shuffle=False,
                             epochs_per_call=2)
    p_f, os_f, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params, opt),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(3),
    )
    assert int(os_f["t"][0]) == 24
    optimizer = optax.flatten(resolve_optimizer(opt, params))
    xla = make_train_epoch(model, ll, optimizer, shuffle=False,
                           epochs_per_call=2)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(3),
    )
    # looser than the other rules: ro = ro_inf - 2t·b2^t/(1-b2^t) suffers
    # catastrophic cancellation in (1-b2^t) (±0.04 on ro at t≈5 between
    # pow and exp/log roundings) and the rectifier r=sqrt(rad) is
    # ill-conditioned just past the boundary where rad is tiny — ~1e-3
    # relative update noise for a few steps, identical regime on both
    # paths (a flip would diverge the whole trajectory, not 3e-5)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)


def test_fused_compute_dtype_bf16_matches_xla():
    """compute_dtype=bfloat16 mixed precision inside the kernel: forward
    operands cast per layer, backward mirrors the XLA path's cast-VJP
    bf16 round-trips — trajectories match the XLA epoch. Tolerance is a
    touch looser than the f32 cases: the kernel's feature-major
    contraction sums the (exact) bf16 products in a different order, and
    where that lands a backward result on a bf16 rounding boundary the
    cast-VJP quantization flips one ulp (~2^-9 relative) on isolated
    elements."""
    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish", scale_nn_outputs=True,
        input_batchnorm="static", compute_dtype=jnp.bfloat16,
    )
    df = eh.gen_rbq10_data(4 * 128, seed=9)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, 128))
    params, state = model.init(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll)

    # sgd for the trajectory comparison: adaptive rules amplify an
    # isolated bf16 ulp flip to ~lr per step (sign noise), which is why
    # the runtime gate's phase-B criterion is structural; under sgd the
    # divergence stays proportional to the true gradient difference
    fused = make_fused_epoch(model, state, ("sgd", 0.05), ll, shuffle=True,
                             epochs_per_call=2)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params),
        init_fused_opt_state(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(4),
    )
    optimizer = optax.flatten(optax.sgd(0.05))
    xla = make_train_epoch(model, ll, optimizer, shuffle=True,
                           epochs_per_call=2)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(4),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    # f16 compute dtypes stay outside the envelope
    m16 = eh.construct_hybrid_model(
        predictors=["sw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        compute_dtype=jnp.float16,
    )
    assert not supports_fused_epoch(m16, ("adam", 0.01), ll)


def test_fused_lamb_matches_xla():
    """In-kernel lamb: adam direction + weight decay + per-LEAF trust
    ratio (tile-norm dots; padded regions are zero so the tile norm IS the
    leaf norm, including for the (1,1) global leaves). Trajectories match
    optax.lamb through the XLA epoch, with and without weight decay, and
    in a per-branch mix. The multisite kernel supports it since round 4
    via deferred whole-tile per-site updates (amsgrad stays out)."""
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    model, params, state, tensors = _setup(n=6 * 64, batch=64)
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))

    specs = [
        ("lamb", 0.01),
        ("lamb", {"learning_rate": 0.01, "weight_decay": 0.02}),
        {"nn": ("lamb", 0.01), "globals": ("adam", 0.02)},
    ]
    for opt in specs:
        assert supports_fused_epoch(model, opt, ll), opt
        fused = make_fused_epoch(model, state, opt, ll, shuffle=True,
                                 epochs_per_call=3)
        p_f, os_f, _, loss_f = fused(
            jax.tree.map(jnp.array, params),
            init_fused_opt_state(params, opt),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(2),
        )
        # NO optax.flatten here: flatten concatenates leaves, turning the
        # per-leaf trust ratio into one global norm — train()'s fast path
        # excludes lamb for exactly this reason (_flatten_safe)
        optimizer = resolve_optimizer(opt, params)
        xla = make_train_epoch(model, ll, optimizer, shuffle=True,
                               epochs_per_call=3)
        p_x, _, _, loss_x = xla(
            jax.tree.map(jnp.array, params), optimizer.init(params),
            jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(2),
        )
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(opt))
        np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=5e-5)

    # the flatten fast path must refuse lamb (global-norm corruption) but
    # keep elementwise rules
    from easyhybrid_tpu.training.train import _flatten_safe
    assert not _flatten_safe(("lamb", 0.01)) and not _flatten_safe("lamb")
    assert _flatten_safe(("adam", 0.01)) and _flatten_safe("adagrad")

    # whole-leaf semantics joined the multisite kernel in round 4 (per-site
    # updates defer to the whole-tile path whose packed tile IS the leaf);
    # amsgrad's nu_max rides an optional third buffer set there too
    from easyhybrid_tpu.ops.fused_multisite import supports_fused_multisite
    ms = eh.MultiSiteHybridModel(model, n_sites=8, share_nn=True)
    assert supports_fused_multisite(ms, ("lamb", 0.01), ll)
    assert supports_fused_multisite(ms, ("amsgrad", 0.01), ll)


@pytest.mark.parametrize("opt,loss", [
    (("lion", 0.003), "nseLoss"),
    (("adadelta", 0.5), "kgeLoss"),
    (("radam", 0.02), None),  # None → pinball(0.7) ElementwiseLoss
    (("lamb", 0.01), "mae"),
])
def test_fused_cross_optimizer_loss_combos(opt, loss):
    """Cross combinations of the widened optimizer and loss envelopes —
    each was validated against adam (losses) or mse (optimizers)
    individually; these pin the off-diagonal pairings."""
    training_loss = loss if loss is not None else eh.pinball(0.7)
    model, params, state, tensors = _setup(n=6 * 64, batch=64)
    ll = eh.LoggingLoss(
        training_loss=training_loss,
        loss_types=(training_loss if loss is not None else "mse",),
    )
    assert supports_fused_epoch(model, opt, ll)
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    fused = make_fused_epoch(model, state, opt, ll, shuffle=True,
                             epochs_per_call=2)
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params, opt),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(3),
    )
    optimizer = resolve_optimizer(opt, params)
    from easyhybrid_tpu.training.train import _flatten_safe

    if _flatten_safe(opt):
        optimizer = optax.flatten(optimizer)
    xla = make_train_epoch(model, ll, optimizer, shuffle=True,
                           epochs_per_call=2)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.array, params), optimizer.init(params),
        jax.tree.map(jnp.array, state), tensors, jax.random.PRNGKey(3),
    )
    # 5e-5: radam's rectification chain ×  the pinball jvp compounds
    # f32 rounding a touch past the usual 2e-5 after 12 steps
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=f"{opt} × {training_loss}",
        )
    # pinball's hinge flips subgradient terms under ulp-level param
    # divergence, amplifying the LOSS difference past the param one
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-3)


def test_fused_traced_hyper_matches_static():
    """The traced-hyper kernel (streamed per-call optimizer scalars, the
    population-sweep engine) matches the static-hyper kernel at the same
    values — element-wise and under jax.vmap over members."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    key = jax.random.PRNGKey(3)
    vals = [(0.02, 0.9), (0.005, 0.95)]
    spec0 = ("adam", {"learning_rate": vals[0][0], "b1": vals[0][1]})
    traced = make_fused_epoch(
        model, state, spec0, ll, shuffle=True, epochs_per_call=2,
        traced_hyper=("learning_rate", "b1"),
    )
    cp = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
    vm = jax.vmap(traced, in_axes=(0, 0, 0, None, None, 0))
    dup = lambda t: jax.tree.map(  # noqa: E731
        lambda a: jnp.stack([jnp.asarray(a)] * 2), t
    )
    pv, _, _, lv = vm(
        dup(params), dup(init_fused_opt_state(params, spec0)), dup(state),
        tensors, key, jnp.asarray(vals, jnp.float32),
    )
    for i, v in enumerate(vals):
        spec = ("adam", {"learning_rate": v[0], "b1": v[1]})
        static = make_fused_epoch(
            model, state, spec, ll, shuffle=True, epochs_per_call=2
        )
        p1, _, _, l1 = static(
            cp(params), init_fused_opt_state(params, spec), cp(state),
            tensors, key,
        )
        for a, b in zip(jax.tree.leaves(pv), jax.tree.leaves(p1)):
            np.testing.assert_allclose(
                np.asarray(a)[i], np.asarray(b), rtol=1e-5, atol=1e-6
            )
        assert abs(float(np.asarray(lv)[i]) - float(l1)) < 1e-5
    # per-branch specs cannot stream scalars
    with pytest.raises(ValueError, match="single optimizer spec"):
        make_fused_epoch(
            model, state, {"globals": ("sgd", 0.1)}, ll,
            traced_hyper=("learning_rate",),
        )
    with pytest.raises(ValueError, match="not"):
        make_fused_epoch(
            model, state, ("adam", 0.01), ll, traced_hyper=("decay",)
        )


@pytest.mark.parametrize("loss", ["mse", "mae"])
def test_fused_batch_chunked_grid_matches_unchunked(monkeypatch, loss):
    """The batch-chunked grid variant (round 4: each batch rides n_chunks
    grid steps, gradients accumulate in carried tiles, update at the last
    chunk) matches the unchunked kernel exactly — including the opt-state
    step counter and with NaN-masked targets."""
    from easyhybrid_tpu.ops.fused_epoch import _pick_batch_chunks

    model, params, state, tensors = _setup(hidden=(32, 16), n=768, batch=256)
    ll = eh.LoggingLoss(training_loss=loss, loss_types=(loss,))
    spec = ("adam", 0.01)
    key = jax.random.PRNGKey(5)
    cp = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
    f0 = make_fused_epoch(model, state, spec, ll, shuffle=True,
                          epochs_per_call=2)
    p0, o0, _, l0 = f0(
        cp(params), init_fused_opt_state(params, spec), state, tensors, key
    )
    monkeypatch.setenv("EASYHYBRID_FUSED_MAX_VMEM_MB", "0.45")
    monkeypatch.setenv("EASYHYBRID_FUSED_CHUNKED", "1")
    assert _pick_batch_chunks(model, [model.nn], tensors, ll) == 2
    f1 = make_fused_epoch(model, state, spec, ll, shuffle=True,
                          epochs_per_call=2)
    p1, o1, _, l1 = f1(
        cp(params), init_fused_opt_state(params, spec), state, tensors, key
    )
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    assert int(np.asarray(o0["t"])[0]) == int(np.asarray(o1["t"])[0])
    assert abs(float(l0) - float(l1)) < 1e-5 * max(1.0, abs(float(l0)))
    # rmse needs full-batch prediction moments → never chunks
    ll_rmse = eh.LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert _pick_batch_chunks(model, [model.nn], tensors, ll_rmse) == 0
    # auto (opt-in unset, round-4 measurement-driven policy): f32 chunks
    # of width >= 256 WIN over XLA and auto-enable; width-128 chunks and
    # bf16 chunks LOSE and stay behind the opt-in
    monkeypatch.delenv("EASYHYBRID_FUSED_CHUNKED")
    assert _pick_batch_chunks(model, [model.nn], tensors, ll) == 0  # w=128
    model_w, _, state_w, tensors_w = _setup(hidden=(32, 16), n=1024,
                                            batch=512)
    # limit between the w=256 chunk score (0.53 MB) and the unchunked
    # score (0.73 MB): chunk search triggers AND the candidate fits
    monkeypatch.setenv("EASYHYBRID_FUSED_MAX_VMEM_MB", "0.6")
    assert _pick_batch_chunks(model_w, [model_w.nn], tensors_w, ll) == 2
    import dataclasses

    nn_bf16 = dataclasses.replace(model_w.nn, compute_dtype="bfloat16")
    model_bf = dataclasses.replace(model_w, nn=nn_bf16)
    assert _pick_batch_chunks(model_bf, [model_bf.nn], tensors_w, ll) == 0
    # AUTO mode honors an explicitly LOWERED limit as a hard cap on chunk
    # candidates too — no silent 35 MB floor past the user's VMEM budget
    monkeypatch.setenv("EASYHYBRID_FUSED_MAX_VMEM_MB", "0.45")
    assert _pick_batch_chunks(model_w, [model_w.nn], tensors_w, ll) == 0
    monkeypatch.setenv("EASYHYBRID_FUSED_MAX_VMEM_MB", "0.6")
    # explicit opt-out disables chunking even where auto would enable
    monkeypatch.setenv("EASYHYBRID_FUSED_CHUNKED", "0")
    assert _pick_batch_chunks(model_w, [model_w.nn], tensors_w, ll) == 0


@pytest.mark.parametrize("loss", ["nseLoss", "pinball"])
def test_fused_lstm_nse_and_elementwise_losses(loss):
    """Round-4 LSTM loss widening: nseLoss (target-only SST scale over the
    output window) and declarative ElementwiseLoss (diagonal-jvp) match
    the XLA scan path."""
    import optax

    model, params, state, tensors = _setup_lstm(n=700, input_window=8,
                                                output_window=2)
    tl = "nseLoss" if loss == "nseLoss" else eh.pinball(0.7)
    ll = eh.LoggingLoss(training_loss=tl, loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll, tensors)
    key = jax.random.PRNGKey(4)
    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=2
    )
    p_f, _, _, l_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, key,
    )
    opt = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(model, ll, opt, shuffle=True, epochs_per_call=2)
    p_x, _, _, l_x = xla(
        jax.tree.map(jnp.array, params), opt.init(params),
        jax.tree.map(jnp.array, state), tensors, key,
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    # rmse + batch-statistic losses joined via the two-pass scheme
    ll_r = eh.LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll_r, tensors)


@pytest.mark.parametrize("loss", ["rmse", "pearsonLoss", "kgeLoss", "pbkgeLoss"])
def test_fused_lstm_two_pass_losses(loss):
    """Round-4 two-pass LSTM losses: rmse and the batch-statistic losses
    need window-wide PREDICTION moments before any cotangent exists — pass
    A stores each output step's forward, pass B applies the scalar
    partials. Must match the XLA scan path."""
    import optax

    model, params, state, tensors = _setup_lstm(n=700, input_window=8,
                                                output_window=2)
    ll = eh.LoggingLoss(training_loss=loss, loss_types=("mse",))
    assert supports_fused_epoch(model, ("adam", 0.01), ll, tensors)
    key = jax.random.PRNGKey(6)
    fused = make_fused_epoch(
        model, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=2
    )
    p_f, _, _, l_f = fused(
        jax.tree.map(jnp.array, params), init_fused_opt_state(params),
        state, tensors, key,
    )
    opt = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(model, ll, opt, shuffle=True, epochs_per_call=2)
    p_x, _, _, l_x = xla(
        jax.tree.map(jnp.array, params), opt.init(params),
        jax.tree.map(jnp.array, state), tensors, key,
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)


# --------------------------------------------------------------------------
# round 5: noisy_sgd — the last OPTIMIZERS rule joins the kernel
# --------------------------------------------------------------------------

def test_noisy_sgd_noise_stream_matches_optax():
    """_noisy_sgd_noise replicates optax.add_noise's exact draws: running
    optax.noisy_sgd on ZERO gradients recovers -lr·(σ_t·noise), which must
    equal the pre-generated stream — including a warm start that
    fast-forwards the key chain."""
    from easyhybrid_tpu.ops.fused_epoch import (
        _from_kernel_buffer,
        _noisy_sgd_noise,
    )

    params = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 10,
        "b": jnp.ones((4,), jnp.float32),
    }
    lr, eta, gamma = 0.5, 0.01, 0.55
    opt = optax.noisy_sgd(lr, eta, gamma)
    st = opt.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    ref = []
    for _ in range(5):
        upd, st = opt.update(zeros, st, params)
        ref.append([np.asarray(-u / lr) for u in jax.tree.leaves(upd)])

    shapes = [l.shape for l in jax.tree.leaves(params)]
    nz, _ = _noisy_sgd_noise(
        jax.random.key(0), jnp.int32(0), 5, shapes, eta, gamma
    )
    for t in range(5):
        for i, s in enumerate(shapes):
            np.testing.assert_allclose(
                np.asarray(_from_kernel_buffer(nz[i][t], s)),
                ref[t][i], rtol=1e-6, atol=0,
            )
    # warm start: draws 3..5 from a chain fast-forwarded past 2 steps
    k0 = jax.lax.fori_loop(
        0, 2, lambda _, kk: jax.random.split(kk)[0], jax.random.key(0)
    )
    nz2, _ = _noisy_sgd_noise(k0, jnp.int32(2), 3, shapes, eta, gamma)
    for t in range(3):
        for i, s in enumerate(shapes):
            np.testing.assert_allclose(
                np.asarray(_from_kernel_buffer(nz2[i][t], s)),
                ref[2 + t][i], rtol=1e-6, atol=0,
            )


@pytest.mark.parametrize("shuffle", [False, True, "batches"])
def test_fused_noisy_sgd_matches_xla_epoch(shuffle):
    """Fused noisy_sgd == UNFLATTENED optax.noisy_sgd (flatten would
    change the realized noise stream — one flat-vector draw instead of
    per-leaf subkey draws)."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    spec = ("noisy_sgd", 0.05, 0.01, 0.55)
    assert supports_fused_epoch(model, spec, ll, tensors)
    cp = lambda t: jax.tree.map(jnp.copy, t)

    fused = make_fused_epoch(model, state, spec, ll, shuffle=shuffle,
                             epochs_per_call=3)
    p_f, _, _, loss_f = fused(
        cp(params), init_fused_opt_state(params), cp(state), tensors,
        jax.random.PRNGKey(1),
    )
    optimizer = optax.noisy_sgd(0.05, 0.01, 0.55)  # UNFLATTENED reference
    xla = make_train_epoch(model, ll, optimizer, shuffle=shuffle,
                           epochs_per_call=3)
    p_x, _, _, loss_x = xla(
        cp(params), optimizer.init(params), cp(state), tensors,
        jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)


def test_fused_noisy_sgd_warm_start_and_scan_mode(monkeypatch):
    """The noise chain continues exactly across launches (2+2 == 4
    epochs) and the per-epoch-launch scan fallback (stack cap exceeded)
    equals the single-launch program."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    spec = ("noisy_sgd", 0.05, 0.01, 0.55)
    cp = lambda t: jax.tree.map(jnp.copy, t)

    fused2 = make_fused_epoch(model, state, spec, ll, shuffle=False,
                              epochs_per_call=2)
    p1, os1, _, _ = fused2(cp(params), init_fused_opt_state(params),
                           cp(state), tensors, jax.random.PRNGKey(1))
    p2, _, _, _ = fused2(p1, os1, cp(state), tensors, jax.random.PRNGKey(2))
    fused4 = make_fused_epoch(model, state, spec, ll, shuffle=False,
                              epochs_per_call=4)
    p4, _, _, _ = fused4(cp(params), init_fused_opt_state(params),
                         cp(state), tensors, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)

    # the spec-built opt state carries the chain key (O(1) resume instead
    # of the O(t0) split replay) — must realize the SAME stream
    os_k = init_fused_opt_state(params, spec)
    assert "noise_key" in os_k
    pk1, osk1, _, _ = fused2(cp(params), os_k, cp(state), tensors,
                             jax.random.PRNGKey(1))
    assert "noise_key" in osk1
    pk2, _, _, _ = fused2(pk1, osk1, cp(state), tensors,
                          jax.random.PRNGKey(2))
    for a, b in zip(jax.tree.leaves(pk2), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)

    monkeypatch.setenv("EASYHYBRID_FUSED_STACK_MB", "0")
    scan = make_fused_epoch(model, state, spec, ll, shuffle=True,
                            epochs_per_call=3)
    p_s, _, _, _ = scan(cp(params), init_fused_opt_state(params), cp(state),
                        tensors, jax.random.PRNGKey(1))
    monkeypatch.delenv("EASYHYBRID_FUSED_STACK_MB")
    single = make_fused_epoch(model, state, spec, ll, shuffle=True,
                              epochs_per_call=3)
    p_l, _, _, _ = single(cp(params), init_fused_opt_state(params),
                          cp(state), tensors, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_fused_noisy_sgd_scan_mode_keeps_shuffle_off(monkeypatch):
    """Regression: noisy_sgd can enter the per-epoch-launch scan fallback
    via the NOISE-tile budget with shuffle=False — the scan body must pass
    the data through untouched (it used to batch-shuffle unconditionally,
    silently training on permuted batches)."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    spec = ("noisy_sgd", 0.05, 0.01, 0.55)
    cp = lambda t: jax.tree.map(jnp.copy, t)

    monkeypatch.setenv("EASYHYBRID_FUSED_STACK_MB", "0")
    scan = make_fused_epoch(model, state, spec, ll, shuffle=False,
                            epochs_per_call=2)
    p_s, _, _, _ = scan(cp(params), init_fused_opt_state(params), cp(state),
                        tensors, jax.random.PRNGKey(1))
    monkeypatch.delenv("EASYHYBRID_FUSED_STACK_MB")
    optimizer = optax.noisy_sgd(0.05, 0.01, 0.55)
    xla = make_train_epoch(model, ll, optimizer, shuffle=False,
                           epochs_per_call=2)
    p_x, _, _, _ = xla(cp(params), optimizer.init(params), cp(state),
                       tensors, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_noisy_sgd_support_guard():
    """The fused path needs data where NO batch can be fully masked under
    any permutation (the XLA path's discarded updates do not consume
    noise draws); it also needs the tensors to verify that."""
    model, params, state, tensors = _setup()
    ll = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_epoch(model, "noisy_sgd", ll, tensors)
    assert not supports_fused_epoch(model, "noisy_sgd", ll, None)
    # ≥ one batch's worth of dead slots → an empty batch is possible under
    # some permutation (prepare_data drops all-NaN rows, so build the
    # adversarial mask directly)
    dead_mask = {
        k: np.asarray(v).copy() for k, v in tensors.mask.items()
    }
    for v in dead_mask.values():
        v.reshape(-1)[:200] = 0.0
    bad = tensors._replace(
        mask={k: jnp.asarray(v) for k, v in dead_mask.items()}
    )
    assert not supports_fused_epoch(model, "noisy_sgd", ll, bad)
    # other rules are unaffected by the mask guard
    assert supports_fused_epoch(model, ("adam", 0.01), ll, bad)
    # train()'s flatten fast path must skip noise rules
    from easyhybrid_tpu.training.train import _flatten_safe

    assert not _flatten_safe("noisy_sgd")
    assert not _flatten_safe(("noisy_sgd", 0.05))
    assert _flatten_safe(("adam", 0.01))
