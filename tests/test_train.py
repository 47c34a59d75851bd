"""End-to-end micro-trainings over every split mode + training semantics
(reference parity: test/test_split_data_train.jl:69-168,
test_autodiff_backend.jl, test_extract_weights.jl)."""

import jax
import numpy as np
import pytest

import easyhybrid_tpu as eh


def _quick(model, data, **kw):
    kw.setdefault("nepochs", 1)
    kw.setdefault("batchsize", 32)
    kw.setdefault("show_progress", False)
    return eh.train(model, data, **kw)


def test_train_basic(rbq10_model, rbq10_df):
    res = _quick(rbq10_model, rbq10_df, nepochs=2)
    assert isinstance(res, eh.TrainResults)
    assert np.isfinite(res.best_loss)
    assert len(res.train_history) == 3  # epoch 0 + 2
    assert "reco_pred" in res.train_pred.columns
    assert "reco" in res.train_obs.columns
    assert res.train_diffs is not None and "parameters" in res.train_diffs


@pytest.mark.parametrize(
    "split_kwargs",
    [
        dict(),
        dict(shuffleobs=True),
        dict(split_data_at=0.7),
    ],
)
def test_train_split_modes(rbq10_model, rbq10_df, split_kwargs):
    res = _quick(rbq10_model, rbq10_df, **split_kwargs)
    assert np.isfinite(res.best_loss)


def test_train_by_id(rbq10_model):
    df = eh.gen_rbq10_data(120, seed=3)
    df["site"] = np.repeat(np.arange(12), 10)
    res = _quick(rbq10_model, df, split_by_id="site")
    assert np.isfinite(res.best_loss)


def test_train_folds(rbq10_model, rbq10_df):
    folds = eh.make_folds(rbq10_df, k=4, seed=0)
    res = _quick(rbq10_model, rbq10_df, folds=folds, val_fold=1)
    assert np.isfinite(res.best_loss)


def test_train_presplit(rbq10_model, rbq10_df):
    tr, va = eh.split_data(rbq10_df, rbq10_model)
    res = _quick(rbq10_model, (tr, va))
    assert np.isfinite(res.best_loss)


def test_train_learns(rbq10_model):
    """Loss decreases and Q10 moves toward truth on the synthetic recipe."""
    df = eh.gen_rbq10_data(1024, seed=42)
    res = eh.train(
        rbq10_model, df, nepochs=30, batchsize=256,
        optimizer=("adam", 0.02), show_progress=False,
    )
    first = res.val_history[0]["mse"]["sum"]  # epoch-0 (untrained) loss
    assert res.best_loss < first * 0.5
    q10 = float(np.asarray(eh.scale_param(res.params["globals"]["Q10"], 1.0, 4.0))[0])
    assert 1.3 < q10 < 2.7


def test_keep_history_semantics(rbq10_model, rbq10_df):
    res = _quick(rbq10_model, rbq10_df, nepochs=3, keep_history=True)
    # history snapshots: epoch0 + 3 epochs, each with predictions
    assert len(res.history) == 4
    assert res.history[1].y_hat_val is not None
    res2 = _quick(rbq10_model, rbq10_df, nepochs=3, keep_history=False)
    # scalar metric history is always complete (documented divergence from
    # the reference best-only semantics, see docs/api.md "keep_history
    # semantics"); predictions are not kept
    assert len(res2.history) == 4
    assert len(res2.train_history) == 4
    assert res2.history[1].y_hat_val is None
    # even when monitoring forces per-epoch outputs, keep_history=False
    # strips prediction arrays from the stored history (memory contract)
    res3 = _quick(
        rbq10_model, rbq10_df, nepochs=3, keep_history=False,
        monitor_names=["Q10"],
    )
    assert res3.monitored and "Q10" in res3.monitored  # monitoring still works
    assert all(s.y_hat_val is None for s in res3.history.snapshots)


def test_early_stopping(rbq10_model, rbq10_df):
    res = _quick(
        rbq10_model, rbq10_df, nepochs=50, patience=2, optimizer=("sgd", 1e-9)
    )
    # with a tiny LR nothing improves -> stop after ~patience epochs
    assert len(res.train_history) < 10


def test_return_model_final_vs_best(rbq10_model, rbq10_df):
    res_b = _quick(rbq10_model, rbq10_df, nepochs=2, return_model="best")
    res_f = _quick(rbq10_model, rbq10_df, nepochs=2, return_model="final")
    assert res_b.best_epoch <= 2 and res_f.best_epoch <= 2


def test_warm_start(rbq10_model, rbq10_df):
    res1 = _quick(rbq10_model, rbq10_df, nepochs=2)
    res2 = _quick(rbq10_model, rbq10_df, nepochs=1, train_from=res1)
    assert np.isfinite(res2.best_loss)
    res3 = _quick(rbq10_model, rbq10_df, nepochs=1, train_from=res1.ps_st)
    assert np.isfinite(res3.best_loss)


def test_extra_loss_weight_l2(rbq10_model, rbq10_df):
    """weight_l2 as extra_loss changes the training objective; its gradient
    is nonzero on every weight leaf (reference test_extract_weights.jl)."""
    import jax

    params, _ = rbq10_model.init(jax.random.PRNGKey(0))
    g = jax.grad(lambda p: eh.weight_l2(p))(params)
    for w in eh.extract_weights(g):
        assert np.any(np.asarray(w) != 0)
    assert len(eh.extract_weights(params)) == 3  # 2 hidden + 1 output layer

    res = _quick(
        rbq10_model, rbq10_df, extra_loss=eh.l2_extra_loss(0.1), nepochs=1
    )
    assert np.isfinite(res.best_loss)


def test_per_branch_optimizer(rbq10_model, rbq10_df):
    res = _quick(
        rbq10_model,
        rbq10_df,
        optimizer={"nn": ("adam", 0.01), "globals": ("sgd", 0.1)},
    )
    assert np.isfinite(res.best_loss)


def test_custom_training_loss_and_loss_types(rbq10_model, rbq10_df):
    def pinball(yh, yv, m, tau=0.5):
        import jax.numpy as jnp

        e = yv - yh
        return eh.masked_mean(jnp.maximum(tau * e, (tau - 1) * e), m)

    res = _quick(
        rbq10_model,
        rbq10_df,
        training_loss=(pinball, {"tau": 0.3}),
        loss_types=["mse", "mae", "r2"],
    )
    assert set(res.val_history[0]) == {"mse", "mae", "r2"}


def test_nan_targets_train(rbq10_model):
    df = eh.gen_rbq10_data(200, seed=5, nan_frac=0.4)
    res = _quick(rbq10_model, df, nepochs=2)
    assert np.isfinite(res.best_loss)


def test_unjitted_matches_jitted(rbq10_model, rbq10_df):
    """AD-backend matrix analog: jit on/off gives the same training result
    (reference test_autodiff_backend.jl:21-40)."""
    res_j = _quick(rbq10_model, rbq10_df, nepochs=1, jit=True,
                   shuffle_each_epoch=False)
    res_n = _quick(rbq10_model, rbq10_df, nepochs=1, jit=False,
                   shuffle_each_epoch=False)
    np.testing.assert_allclose(res_j.best_loss, res_n.best_loss, rtol=1e-4)


def test_lbfgs_full_batch(rbq10_model, rbq10_df):
    res = eh.train(
        rbq10_model,
        rbq10_df,
        optimizer="lbfgs",
        full_batch=True,
        nepochs=5,
        show_progress=False,
    )
    assert np.isfinite(res.best_loss)


def test_promote_f64_scoped_to_solve(rbq10_model, rbq10_df):
    """promote_f64 is per-solve (reference train_optimization.jl): the global
    x64 flag must be restored so a subsequent train() stays in float32."""
    import jax

    assert jax.config.read("jax_enable_x64") is False
    res = eh.train(
        rbq10_model, rbq10_df, optimizer="lbfgs", full_batch=True,
        promote_f64=True, nepochs=2, show_progress=False,
    )
    assert np.isfinite(res.best_loss)
    assert jax.config.read("jax_enable_x64") is False
    res2 = _quick(rbq10_model, rbq10_df, nepochs=1)
    assert jax.tree.leaves(res2.params)[0].dtype == np.float32


def test_lbfgs_minibatch(rbq10_model, rbq10_df):
    res = eh.train(
        rbq10_model,
        rbq10_df,
        optimizer="lbfgs",
        full_batch=False,
        nepochs=1,
        batchsize=128,
        inner_maxiters=3,
        show_progress=False,
    )
    assert np.isfinite(res.best_loss)


def test_deprecated_kwarg_rename(rbq10_model, rbq10_df):
    res = _quick(rbq10_model, rbq10_df, opt=("adam", 0.01))
    assert np.isfinite(res.best_loss)


def test_multi_nn_training():
    def mech(*, f, a, b):
        return {"t": a * f + b}

    m = eh.construct_hybrid_model(
        predictors={"a": ["p1", "p2"], "b": ["p3"]},
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters={"a": (1.0, 0.0, 2.0), "b": (0.5, 0.0, 1.0)},
        global_param_names=[],
        hidden_layers=[4],
        scale_nn_outputs=True,
    )
    rng = np.random.default_rng(0)
    n = 128
    import pandas as pd

    df = pd.DataFrame({k: rng.random(n).astype(np.float32)
                       for k in ["p1", "p2", "p3", "f", "t"]})
    res = _quick(m, df, nepochs=2)
    assert np.isfinite(res.best_loss)


def test_sequence_lstm_training():
    """LSTM hybrid over windowed sequences (reference Q10_lstm analog)."""
    def mech(*, ta, rb, Q10):
        return {"reco": rb * Q10 ** (0.1 * (ta - 15.0))}

    m = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers={"lstm": 8},
        scale_nn_outputs=True,
        input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(300, seed=11)
    res = eh.train(
        m,
        df,
        nepochs=2,
        batchsize=32,
        show_progress=False,
        sequence_kwargs=dict(input_window=8, output_window=2, lead_time=0),
    )
    assert np.isfinite(res.best_loss)


def test_eval_every_fused_epochs(rbq10_model, rbq10_df):
    """eval_every>1 runs N epochs per compiled program; history has one
    snapshot per eval point."""
    res = eh.train(
        rbq10_model, rbq10_df, nepochs=6, eval_every=3, batchsize=64,
        show_progress=False,
    )
    # epoch 0 + evals at 3 and 6
    assert len(res.train_history) == 3


def test_sequence_frames_long_format():
    """Sequence training produces long-format obs/pred frames with aligned
    trailing windows."""
    def mech(*, ta, rb, Q10):
        return {"reco": rb * Q10 ** (0.1 * (ta - 15.0))}

    m = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers={"lstm": 4}, scale_nn_outputs=True,
    )
    df = eh.gen_rbq10_data(200, seed=9)
    res = eh.train(
        m, df, nepochs=1, batchsize=16, show_progress=False,
        sequence_kwargs=dict(input_window=6, output_window=2, lead_time=0),
    )
    assert {"sample", "step", "reco"} <= set(res.train_obs.columns)
    assert len(res.train_obs) == len(res.train_pred)
    assert sorted(res.train_obs["step"].unique()) == [0, 1]


def test_opt_state_resume(rbq10_model, rbq10_df):
    """Training can resume with the exact optimizer state (prebuilt-state
    parity, reference TrainingConfig.jl:16-42)."""
    res1 = _quick(rbq10_model, rbq10_df, nepochs=2)
    assert res1.opt_state is not None
    res2 = _quick(
        rbq10_model, rbq10_df, nepochs=1,
        train_from=res1, opt_state=res1.opt_state,
    )
    assert np.isfinite(res2.best_loss)


def test_remat_matches(rbq10_model, rbq10_df):
    """jax.checkpoint remat gives identical results (recompute == store)."""
    res_a = _quick(rbq10_model, rbq10_df, nepochs=1, remat=False,
                   shuffle_each_epoch=False)
    res_b = _quick(rbq10_model, rbq10_df, nepochs=1, remat=True,
                   shuffle_each_epoch=False)
    np.testing.assert_allclose(res_a.best_loss, res_b.best_loss, rtol=1e-5)


def test_shuffle_batches_mode(rbq10_model, rbq10_df):
    res = _quick(rbq10_model, rbq10_df, nepochs=2, shuffle_each_epoch="batches")
    assert np.isfinite(res.best_loss)


def test_multi_nn_static_norm():
    """MultiNN branches each get fitted static norm stats."""
    def mech(*, f, a, b):
        return {"t": a * f + b}

    m = eh.construct_hybrid_model(
        predictors={"a": ["p1", "p2"], "b": ["p3"]},
        forcing=["f"], targets=["t"],
        mechanistic_model=mech,
        parameters={"a": (1.0, 0.0, 2.0), "b": (0.5, 0.0, 1.0)},
        global_param_names=[], hidden_layers=[4],
        scale_nn_outputs=True, input_batchnorm="static",
    )
    rng = np.random.default_rng(0)
    n = 64
    import pandas as pd

    df = pd.DataFrame({k: (rng.random(n) * 50).astype(np.float32)
                       for k in ["p1", "p2", "p3", "f", "t"]})
    import jax
    from easyhybrid_tpu.data.prepare import prepare_data
    from easyhybrid_tpu.training.train import fit_input_norm

    data = prepare_data(m, df)
    params, state = m.init(jax.random.PRNGKey(0))
    state = fit_input_norm(m, state, data)
    assert state["nns"]["a"]["norm"]["mean"].shape == (2,)
    assert float(state["nns"]["b"]["norm"]["mean"][0]) > 1.0  # fitted, not 0
    res = _quick(m, df, nepochs=1)
    assert np.isfinite(res.best_loss)


def test_return_gradients(rbq10_model, rbq10_df):
    """return_gradients records per-snapshot grad norms and the final
    full-batch grads pytree (reference TrainingConfig.jl:9-160)."""
    res = _quick(rbq10_model, rbq10_df, nepochs=3, return_gradients=True)
    assert res.grad_history is not None and len(res.grad_history) == 4
    for g in res.grad_history:
        assert np.isfinite(g["global"]) and g["global"] > 0
        assert "nn" in g and "globals" in g  # per-branch norms
    assert res.final_grads is not None
    assert set(res.final_grads) == set(res.params)
    # grads flow into every branch
    assert float(np.abs(res.final_grads["globals"]["Q10"]).sum()) > 0


def test_second_order_non_lbfgs(rbq10_model, rbq10_df):
    """A non-lbfgs solver runs on the second-order path (reference accepts
    arbitrary Optimization.jl solvers, train.jl:148-157)."""
    res = eh.train(
        rbq10_model, rbq10_df, optimizer="gd_linesearch",
        full_batch=True, nepochs=5, show_progress=False,
    )
    assert np.isfinite(res.best_loss)


def test_second_order_solver_kwargs_forwarded(rbq10_model, rbq10_df):
    """Leftover train kwargs reach the solver ctor (solve-kwargs parity,
    train_optimization.jl:33-119); a bogus kwarg raises."""
    res = eh.train(
        rbq10_model, rbq10_df, optimizer="lbfgs", memory_size=5,
        full_batch=True, nepochs=3, show_progress=False,
    )
    assert np.isfinite(res.best_loss)
    with pytest.raises(TypeError):
        eh.train(
            rbq10_model, rbq10_df, optimizer="lbfgs", not_a_solver_kwarg=1,
            full_batch=True, nepochs=1, show_progress=False,
        )


def test_second_order_prebuilt_instance(rbq10_model, rbq10_df):
    """An arbitrary prebuilt optax solver routes through the driver with
    second_order=True."""
    import optax

    res = eh.train(
        rbq10_model, rbq10_df, optimizer=optax.lbfgs(memory_size=4),
        second_order=True, full_batch=True, nepochs=3, show_progress=False,
        return_gradients=True,
    )
    assert np.isfinite(res.best_loss)
    assert res.grad_history is not None


def test_second_order_custom_callable_solver(rbq10_model, rbq10_df):
    """Round 5: an ARBITRARY solver callable (anything, not just
    optax-shaped transforms) routes through the second-order driver —
    full arbitrary-solver parity with the reference's Optimization.jl
    solve() routing (train.jl:148-157). Protocol: solver(objective,
    params, **solve_kwargs) -> params or (params, info); objective is
    jax-differentiable, so scipy bridges work."""
    import jax.flatten_util as fu
    import jax.numpy as jnp

    calls = []

    def scipy_solver(objective, params, **kw):
        from scipy.optimize import minimize

        calls.append(kw)
        flat0, unravel = fu.ravel_pytree(params)
        vg = jax.jit(jax.value_and_grad(lambda v: objective(unravel(v))))

        def fun(v):
            val, g = vg(jnp.asarray(v, jnp.float32))
            return float(val), np.asarray(g, np.float64)

        res = minimize(
            fun, np.asarray(flat0, np.float64), jac=True,
            method="L-BFGS-B", options={"maxiter": 150},
        )
        return unravel(jnp.asarray(res.x, jnp.float32)), res

    res = eh.train(
        rbq10_model, rbq10_df, optimizer=scipy_solver, second_order=True,
        full_batch=True, show_progress=False,
    )
    assert res.epoch_path == "second_order"
    assert "custom solver" in res.engine_reason
    assert np.isfinite(res.best_loss)
    first_val = float(res.val_history[0]["mse"]["sum"])
    assert res.best_loss <= first_val  # the solve improved on init
    assert len(calls) == 1  # full_batch: ONE whole-problem solve
    # minibatch scheme: one solve per fixed minibatch per epoch
    res_mb = eh.train(
        rbq10_model, rbq10_df, optimizer=scipy_solver, second_order=True,
        full_batch=False, nepochs=2, batchsize=1000, show_progress=False,
    )
    assert np.isfinite(res_mb.best_loss)
    assert len(calls) > 2
    # a solver returning the wrong structure raises a clear error
    with pytest.raises(ValueError, match="same tree structure"):
        eh.train(
            rbq10_model, rbq10_df,
            optimizer=lambda obj, p, **kw: jnp.zeros((3,)),
            second_order=True, full_batch=True, show_progress=False,
        )
    # ... even when the wrong structure has MATCHING leaf count/shapes
    # (e.g. a list of the leaves instead of the dict pytree)
    with pytest.raises(ValueError, match="same tree structure"):
        eh.train(
            rbq10_model, rbq10_df,
            optimizer=lambda obj, p, **kw: jax.tree.leaves(p),
            second_order=True, full_batch=True, show_progress=False,
        )


def test_patience_counts_snapshots(rbq10_model, rbq10_df):
    """patience counts eval snapshots, not epochs: with eval_every=N and
    patience=P, early stopping needs P non-improving SNAPSHOTS, i.e. up to
    P*N epochs (documented on TrainConfig.patience)."""
    # an absurd LR makes val loss diverge immediately → every snapshot
    # after epoch 0 is non-improving
    res = eh.train(
        rbq10_model, rbq10_df, nepochs=40, eval_every=2, patience=3,
        batchsize=64, optimizer=("sgd", 1e6), show_progress=False,
    )
    # epoch-0 snapshot + exactly `patience` non-improving eval snapshots
    assert len(res.train_history) == 1 + 3
    assert res.best_epoch == 0  # diverged run keeps the initial model


def test_deferred_loop_matches_eager(rbq10_model, rbq10_df):
    """The zero-readback deferred loop (show_progress=False, no plotting/
    saving) must produce the SAME training trajectory, early-stop point,
    best model and tracked series as the eager readback loop — only the
    dispatch discipline differs."""
    kw = dict(
        nepochs=25,
        batchsize=64,
        optimizer=("adam", 0.05),  # aggressive lr so patience triggers
        patience=3,
        tracked_params=["Q10"],
        random_seed=7,
    )
    r_def = eh.train(rbq10_model, rbq10_df, show_progress=False, **kw)
    r_eag = eh.train(rbq10_model, rbq10_df, show_progress=True, **kw)

    assert len(r_def.train_history) == len(r_eag.train_history)
    for a, b in zip(r_def.val_history, r_eag.val_history):
        for lt in a:
            for k in a[lt]:
                np.testing.assert_allclose(a[lt][k], b[lt][k], rtol=1e-6)
    assert r_def.best_epoch == r_eag.best_epoch
    np.testing.assert_allclose(r_def.best_loss, r_eag.best_loss, rtol=1e-6)
    np.testing.assert_allclose(
        r_def.tracked["Q10"], r_eag.tracked["Q10"], rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(r_def.params), jax.tree.leaves(r_eag.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_deferred_loop_no_early_stop(rbq10_model, rbq10_df):
    """Without patience the deferred loop runs every epoch and the history
    has nepochs/eval_every + 1 snapshots, same as the eager loop."""
    r = eh.train(
        rbq10_model, rbq10_df, nepochs=8, batchsize=64, eval_every=2,
        show_progress=False, random_seed=3,
    )
    assert len(r.train_history) == 5  # init + 4 snapshots
    assert np.isfinite(r.best_loss)


def test_deferred_loop_matches_eager_eval_every(rbq10_model, rbq10_df):
    """Deferred vs eager parity also holds with eval_every > 1 (multi-epoch
    programs + coarser snapshots)."""
    kw = dict(nepochs=8, batchsize=64, optimizer=("adam", 0.01),
              eval_every=2, random_seed=11)
    r_def = eh.train(rbq10_model, rbq10_df, show_progress=False, **kw)
    r_eag = eh.train(rbq10_model, rbq10_df, show_progress=True, **kw)
    assert len(r_def.train_history) == len(r_eag.train_history) == 5
    for a, b in zip(r_def.val_history, r_eag.val_history):
        np.testing.assert_allclose(a["mse"]["sum"], b["mse"]["sum"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(r_def.params), jax.tree.leaves(r_eag.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_deferred_observability_monitor_and_grads(rbq10_model, rbq10_df):
    """monitor_names and return_gradients no longer force the readback loop:
    quantiles and grad norms ride the on-device history row and match the
    eager loop's host-computed values."""
    kw = dict(
        nepochs=6, batchsize=64, optimizer=("adam", 0.01),
        monitor_names=["rb"], return_gradients=True, random_seed=5,
    )
    r_def = eh.train(rbq10_model, rbq10_df, show_progress=False, **kw)
    r_eag = eh.train(rbq10_model, rbq10_df, show_progress=True, **kw)
    assert r_def.loop_mode == "deferred"
    assert r_eag.loop_mode == "eager"
    # monitored quantile trajectories match
    assert set(r_def.monitored) == set(r_eag.monitored) == {"rb"}
    assert len(r_def.monitored["rb"]) == len(r_eag.monitored["rb"])
    for a, b in zip(r_def.monitored["rb"], r_eag.monitored["rb"]):
        for q in ("q25", "q50", "q75"):
            np.testing.assert_allclose(a[q], b[q], rtol=1e-4)
    # grad-norm history matches (same probe, device vs host norm)
    assert len(r_def.grad_history) == len(r_eag.grad_history)
    for a, b in zip(r_def.grad_history, r_eag.grad_history):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4)


def test_deferred_save_training_posthoc(tmp_path, rbq10_model, rbq10_df):
    """save_training in deferred mode writes the stream + checkpoints
    post-hoc from the single fetch; the stream matches the history."""
    res = eh.train(
        rbq10_model, rbq10_df, nepochs=4, batchsize=64, show_progress=False,
        save_training=True, tracked_params=["Q10"],
        output_folder=str(tmp_path), model_name="defrun", random_seed=2,
    )
    assert res.loop_mode == "deferred"
    import os

    from easyhybrid_tpu.plotting.live import read_metric_stream

    records = read_metric_stream(res.paths.metrics_jsonl, include_meta=True)
    metas = [r["meta"] for r in records if "meta" in r]
    assert metas and metas[0]["loop_mode"] == "deferred"
    rows = [r for r in records if "meta" not in r]
    assert [r["epoch"] for r in rows] == [0, 1, 2, 3, 4]
    assert all("Q10" in r["tracked"] for r in rows)
    np.testing.assert_allclose(
        [r["val"]["mse"]["sum"] for r in rows],
        [h["mse"]["sum"] for h in res.val_history], rtol=1e-6,
    )
    # initial + best checkpoints + final best model exist
    assert os.path.exists(res.paths.best_model) or os.path.exists(
        os.path.splitext(res.paths.best_model)[0] + ".orbax"
    )
    ckpts = os.listdir(res.paths.checkpoint_dir)
    assert len(ckpts) >= 1


def test_engine_reason_surfaced(rbq10_model, rbq10_df):
    """train() records WHY the engine/loop was selected (VERDICT r4 item
    8): the deferred fast path when nothing blocks it, and the eager loop
    naming the disqualifying flag otherwise."""
    res = _quick(rbq10_model, rbq10_df, nepochs=1)
    assert res.engine_reason and res.engine_reason.startswith(res.epoch_path)
    assert "zero-readback" in res.engine_reason
    res2 = _quick(rbq10_model, rbq10_df, nepochs=1, show_progress=True)
    assert res2.loop_mode == "eager"
    assert "show_progress=True" in res2.engine_reason
    # keep_history no longer blocks the deferred loop (round 4): the
    # prediction history rides on-device buffers
    res3 = _quick(rbq10_model, rbq10_df, nepochs=2, keep_history=True)
    assert res3.loop_mode == "deferred"
    assert len(res3.history) == 3
    assert res3.history[1].y_hat_val is not None
    assert "reco" in res3.history[1].y_hat_val


def test_deferred_keep_history_matches_eager(rbq10_model, rbq10_df):
    """keep_history in the deferred loop (round 4) reproduces the eager
    loop's history exactly: same scalar metrics AND the same per-snapshot
    prediction arrays (on-device buffers vs per-epoch host fetches)."""
    kw = dict(
        nepochs=3, batchsize=64, keep_history=True, optimizer=("adam", 0.01),
        monitor_names=["Q10"],
    )
    res_d = eh.train(rbq10_model, rbq10_df, show_progress=False, **kw)
    res_e = eh.train(rbq10_model, rbq10_df, show_progress=True, **kw)
    assert res_d.loop_mode == "deferred" and res_e.loop_mode == "eager"
    assert len(res_d.history) == len(res_e.history) == 4
    for sd, se in zip(res_d.history.snapshots, res_e.history.snapshots):
        for (ta, ma), (tb, mb) in zip(
            sorted(sd.l_val.items()), sorted(se.l_val.items())
        ):
            assert ta == tb
            for k in ma:
                np.testing.assert_allclose(ma[k], mb[k], rtol=1e-5)
        assert sd.y_hat_val is not None and se.y_hat_val is not None
        np.testing.assert_allclose(
            np.asarray(sd.y_hat_val["reco"]),
            np.asarray(se.y_hat_val["reco"]), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sd.y_hat_train["reco"]),
            np.asarray(se.y_hat_train["reco"]), rtol=1e-5, atol=1e-6,
        )
    # monitored quantiles agree too
    for a, b in zip(res_d.monitored["Q10"], res_e.monitored["Q10"]):
        for q in ("q25", "q50", "q75"):
            np.testing.assert_allclose(a[q], b[q], rtol=1e-4)


def test_flatten_fast_path_size_rule():
    """optax.flatten ravels the whole tree every step — measured on-chip
    to cost ~15% at 1.2M params (tools/probe_b1024_ceiling.py) while
    WINNING for small models, so the fast path is size-gated."""
    import jax.numpy as jnp

    from easyhybrid_tpu.training.train import _FLATTEN_MAX_PARAMS, _flatten_safe

    small = {"w": jnp.zeros((10, 10))}
    big = {"w": jnp.zeros((512, 512))}
    assert (512 * 512) > _FLATTEN_MAX_PARAMS
    assert _flatten_safe(("adam", 0.01), small)
    assert not _flatten_safe(("adam", 0.01), big)
    assert _flatten_safe(("adam", 0.01))  # no params: name rule only
    assert not _flatten_safe(("lamb", 0.01), small)
    assert not _flatten_safe("noisy_sgd", small)


def test_early_stopping_monitors_first_loss_type():
    """Regression: metric dicts round-tripped through a jitted program come
    back KEY-SORTED, so the stopper must look up loss_types[0] by NAME —
    positional `first` silently monitored the alphabetically-first metric
    (and its is_better direction came from a DIFFERENT metric)."""
    from easyhybrid_tpu.config.train_config import TrainConfig
    from easyhybrid_tpu.training.early_stopping import EarlyStopping
    from easyhybrid_tpu.training.history import EpochSnapshot, TrainingHistory

    cfg = TrainConfig(loss_types=("rmse", "mae"), patience=None)

    def snap(rmse, mae):
        # key-sorted exactly like a jit output: "mae" iterates first
        return EpochSnapshot(
            l_train={"mae": {"reco": mae, "sum": mae},
                     "rmse": {"reco": rmse, "sum": rmse}},
            l_val={"mae": {"reco": mae, "sum": mae},
                   "rmse": {"reco": rmse, "sum": rmse}},
        )

    stopper = EarlyStopping(snap(rmse=1.0, mae=5.0), {}, {}, cfg)
    assert stopper.metric == "rmse"
    assert stopper.best_loss == 1.0  # the rmse scalar, not mae's 5.0
    hist = TrainingHistory()
    # rmse worsens while mae improves: best must STAY at epoch 0
    stopper.update(hist, snap(rmse=2.0, mae=0.5), {}, {}, 1, False)
    assert stopper.best_epoch == 0 and stopper.best_loss == 1.0
    # rmse improves: best moves
    stopper.update(hist, snap(rmse=0.7, mae=9.0), {}, {}, 2, False)
    assert stopper.best_epoch == 2 and stopper.best_loss == 0.7


def test_early_stopping_callable_agg_underscore_name():
    """Regression: the stopper's agg-key derivation must match
    compute_loss's (losses.specs.agg_name: lstrip('_'), fallback 'agg') —
    a divergent copy KeyError-ed on underscore-named callable aggs."""
    from easyhybrid_tpu.config.train_config import TrainConfig
    from easyhybrid_tpu.training.early_stopping import EarlyStopping
    from easyhybrid_tpu.training.history import EpochSnapshot

    def _my_agg(xs):
        return sum(xs)

    cfg = TrainConfig(loss_types=("mse",), agg=_my_agg, patience=None)
    s = EpochSnapshot(
        l_train={"mse": {"reco": 1.0, "my_agg": 1.0}},
        l_val={"mse": {"reco": 1.0, "my_agg": 1.0}},
    )
    stopper = EarlyStopping(s, {}, {}, cfg)  # used to KeyError('_my_agg')
    assert stopper.agg_name == "my_agg" and stopper.best_loss == 1.0


def test_train_monitors_first_loss_type_e2e(rbq10_model, rbq10_df):
    """e2e: with loss_types=("r2", "mse") the returned best_loss is the
    MAXIMIZED r2 over the history (r2 sorts after mse, so the positional
    bug would minimize mse and report ITS scalar)."""
    r = eh.train(
        rbq10_model, rbq10_df, nepochs=8, batchsize=64,
        loss_types=("r2", "mse"), optimizer=("adam", 0.01),
        show_progress=False, patience=None,
    )
    r2s = [h["r2"]["sum"] for h in r.val_history]
    assert r.best_loss == pytest.approx(max(r2s), rel=1e-6)
    assert r.best_epoch == int(np.argmax(r2s))


def test_second_order_warm_start_and_input_norm(rbq10_model, rbq10_df):
    """Regression: the second-order driver ignored cfg.train_from (fresh
    init) and never fitted the static input norm (identity stats)."""
    warm = eh.train(
        rbq10_model, rbq10_df, nepochs=5, batchsize=64,
        optimizer=("adam", 0.01), show_progress=False,
    )
    r = eh.train(
        rbq10_model, rbq10_df, optimizer="lbfgs", full_batch=True,
        nepochs=2, train_from=warm, show_progress=False,
    )
    # input_batchnorm=True ("static" stats) must be fitted, not identity
    norm = r.state["nn"]["norm"]
    assert float(np.abs(np.asarray(norm["mean"])).max()) > 1e-3
    # the warm start is visible in the INITIAL snapshot: it must equal the
    # warm model's loss, far below a fresh init's
    fresh = eh.train(
        rbq10_model, rbq10_df, optimizer="lbfgs", full_batch=True,
        nepochs=2, show_progress=False,
    )
    warm_init = r.val_history[0]["mse"]["sum"]
    fresh_init = fresh.val_history[0]["mse"]["sum"]
    assert warm_init <= warm.val_history[-1]["mse"]["sum"] * 1.01
    assert warm_init < fresh_init


def test_second_order_eval_every_zero_clamped(rbq10_model, rbq10_df):
    """eval_every=0 clamps to 1 on the full-batch solver loop (the optax
    path already clamped; this one ZeroDivisionError-ed)."""
    r = eh.train(
        rbq10_model, rbq10_df, optimizer="lbfgs", full_batch=True,
        nepochs=2, eval_every=0, show_progress=False,
    )
    assert np.isfinite(r.best_loss)


def test_per_branch_second_order_rejected(rbq10_model, rbq10_df):
    """A per-branch dict naming a linesearch solver must fail with a clear
    error, not a TypeError deep inside jit (linesearch update() needs
    value/grad/value_fn kwargs the scan epoch never passes)."""
    with pytest.raises(ValueError, match="second-order"):
        eh.train(
            rbq10_model, rbq10_df, nepochs=1,
            optimizer={"globals": "lbfgs", "nn": ("adam", 0.01)},
            show_progress=False,
        )


def test_obs_pred_frames_heterogeneous_target_shapes():
    """Targets with different shapes (windowed (N, T) next to per-sample
    (N,)) build per-shape long frames outer-merged on the index columns —
    one shared ravel index crashed pandas after the whole run finished."""
    from types import SimpleNamespace

    from easyhybrid_tpu.training.train import _obs_pred_frames

    n, t = 4, 3
    y1 = np.arange(n * t, dtype=np.float32).reshape(n, t)
    y2 = np.arange(n, dtype=np.float32) * 10.0
    data = SimpleNamespace(n_samples=n, y={"y1": y1, "y2": y2})
    outputs = {"y1": y1 + 0.5, "y2": y2 + 0.5}
    obs, pred = _obs_pred_frames(data, outputs, ("y1", "y2"))
    assert len(obs) == n * t and len(pred) == n * t
    assert {"sample", "step", "y1", "y2"} <= set(obs.columns)
    # the per-sample target broadcasts across the window steps
    row = obs[(obs["sample"] == 2) & (obs["step"] == 1)]
    assert float(row["y2"].iloc[0]) == 20.0
    assert float(row["y1"].iloc[0]) == y1[2, 1]
    assert {"y1_pred", "y2_pred"} <= set(pred.columns)


def test_empty_val_split_clear_error_both_drivers(rbq10_model, rbq10_df):
    """Regression: the second-order driver lacked the empty-validation
    guard the optax path has — split_data_at=1.0 crashed with a bare
    ZeroDivisionError inside build_epoch_tensors."""
    with pytest.raises(ValueError, match="validation split is empty"):
        eh.train(rbq10_model, rbq10_df, nepochs=1, split_data_at=1.0,
                 show_progress=False)
    with pytest.raises(ValueError, match="validation split is empty"):
        eh.train(rbq10_model, rbq10_df, nepochs=1, split_data_at=1.0,
                 optimizer="lbfgs", full_batch=True, show_progress=False)
