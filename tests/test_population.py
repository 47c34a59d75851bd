"""Population training: K members vmapped into one program.

Reference counterpart: the tune/Hyperopt tutorials drive train() once per
configuration (tune.jl:27-44); the batched population is TPU-native
surplus, so the tests pin its own contract — member isolation, best-epoch
tracking, direction-aware monitors, and e2e recovery parity with the
sequential quick-start."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import easyhybrid_tpu as eh


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def _model(hidden=(8,)):
    return eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=list(hidden), activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )


def test_population_member_isolation_and_vmap_consistency():
    """Member j of a K=3 sweep is bit-identical to a K=1 run with the same
    hyperparams/seed/epoch keys — members can't contaminate each other,
    and a diverging-lr member doesn't corrupt its neighbors."""
    df = eh.gen_rbq10_data(600, seed=7)
    model = _model()
    common = dict(
        optimizer="adam", nepochs=30, batchsize=128, eval_every=5,
        seed=3, data_seed=0,
    )
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01, 0.002, 5.0]}, **common
    )
    solo = eh.population_train(
        model, df, hyper={"learning_rate": [0.002]}, **common
    )
    # pure sweeps share one shuffle key per eval block (round 4), so the
    # K=3 and K=1 runs see the SAME data order — but different vmap
    # lowering (different K) precludes cross-program bitwise equality, so
    # the bitwise check uses a K=3 re-run and the K=1 comparison stays
    # loose (see test_population_pure_sweep_shared_shuffle_order for the
    # tight cross-K check)
    pop2 = eh.population_train(
        model, df, hyper={"learning_rate": [0.01, 0.002, 5.0]}, **common
    )
    for a, b in zip(
        jax.tree.leaves(pop.best_params), jax.tree.leaves(pop2.best_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the lr=5.0 member may diverge, but the sane members stay finite:
    # the fast member fits, the slow member still IMPROVES monotonically
    # toward it (isolation: a diverging neighbor cannot corrupt them)
    assert np.isfinite(pop.best_losses[:2]).all()
    assert pop.best_losses[0] < 0.3
    hist1 = pop.val_history["mse"][:, 1]
    assert pop.best_losses[1] < hist1[0]
    # K=1 run converges like the matching population member
    assert np.isfinite(solo.best_losses).all()
    assert abs(solo.best_losses[0] - pop.best_losses[1]) < 0.5 * max(
        solo.best_losses[0], pop.best_losses[1]
    )


def test_population_lr_sweep_recovers_q10():
    """The population's best member matches sequential train() quality on
    the quick-start config, and member_params unstacks into a tree
    model.apply accepts."""
    df = eh.gen_rbq10_data(2000, seed=42)
    model = _model((16, 16))
    pop = eh.population_train(
        model, df,
        hyper={"learning_rate": [0.05, 0.01, 0.001]},
        optimizer="adam", nepochs=60, batchsize=512, eval_every=5,
        seed=11, data_seed=0,
    )
    assert pop.epoch_path == "population_vmap"
    assert pop.best_losses[pop.best_member] < 0.05
    best = pop.member_params(pop.best_member)
    q10 = float(np.asarray(
        eh.scale_param(best["globals"]["Q10"], 1.0, 4.0)
    ).ravel()[0])
    assert abs(q10 - 2.0) < 0.3
    # histories have one row per eval block, one column per member
    assert pop.val_history["mse"].shape == (12, 3)
    assert pop.epochs[-1] == 60
    # best_losses equals the columnwise minimum of the monitored history
    # (or the epoch-0 baseline if nothing improved)
    mins = pop.val_history["mse"].min(axis=0)
    assert (pop.best_losses <= mins + 1e-12).all()


def test_population_seed_ensemble_and_monitor_direction():
    """Seed ensembles give distinct members; a maximize-direction monitor
    (r2) tracks the columnwise MAX."""
    df = eh.gen_rbq10_data(600, seed=1)
    model = _model()
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01]}, seeds=[0, 1, 2, 3],
        optimizer="adam", nepochs=10, batchsize=128, eval_every=5,
        training_loss="mse", loss_types=("r2", "mse"), seed=5, data_seed=0,
    )
    assert pop.monitor == "r2"
    assert pop.seeds.shape == (4,)
    # distinct inits → distinct trajectories
    finals = pop.val_history["mse"][-1]
    assert len(np.unique(np.round(finals, 10))) > 1
    maxs = pop.val_history["r2"].max(axis=0)
    assert (pop.best_losses >= maxs - 1e-12).all()
    assert pop.best_member == int(np.argmax(pop.best_losses))


def test_population_validation_errors():
    df = eh.gen_rbq10_data(200, seed=0)
    model = _model()
    with pytest.raises(ValueError, match="counts disagree"):
        eh.population_train(
            model, df, hyper={"learning_rate": [0.1, 0.2]}, seeds=[0, 1, 2],
            nepochs=1,
        )
    with pytest.raises(ValueError, match="maximize"):
        eh.population_train(
            model, df, hyper={"learning_rate": [0.1]}, training_loss="r2",
            nepochs=1,
        )
    with pytest.raises(ValueError, match="unknown optimizer"):
        eh.population_train(
            model, df, hyper={"learning_rate": [0.1]}, optimizer="nope",
            nepochs=1,
        )


def test_population_multi_hyper_and_static():
    """Several injected hyperparams sweep together; static_hyper passes
    non-swept constructor kwargs through."""
    df = eh.gen_rbq10_data(400, seed=3)
    model = _model()
    pop = eh.population_train(
        model, df,
        hyper={"learning_rate": [0.02, 0.005], "b1": [0.9, 0.8]},
        static_hyper={"b2": 0.99},
        optimizer="adam", nepochs=6, batchsize=128, eval_every=3,
        seed=2, data_seed=0,
    )
    assert set(pop.hyper) == {"learning_rate", "b1"}
    assert np.isfinite(pop.best_losses).all()


def test_population_mesh_sharded_matches_single_device():
    """The member axis shards across an 8-device mesh (members are
    embarrassingly parallel — no inter-member collectives), and the
    trajectories match the unsharded run."""
    df = eh.gen_rbq10_data(600, seed=2)
    model = _model()
    kw = dict(
        hyper={"learning_rate": list(np.geomspace(0.001, 0.05, 8))},
        optimizer="adam", nepochs=10, batchsize=128, eval_every=5,
        seed=4, data_seed=0,
    )
    pop = eh.population_train(model, df, **kw)
    mesh = eh.make_mesh(8, axis_name="members")
    popm = eh.population_train(model, df, mesh=mesh, **kw)
    np.testing.assert_allclose(
        popm.val_history["mse"], pop.val_history["mse"], rtol=1e-5
    )
    assert popm.best_member == pop.best_member
    for a, b in zip(
        jax.tree.leaves(popm.best_params), jax.tree.leaves(pop.best_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    with pytest.raises(ValueError, match="divisible"):
        eh.population_train(
            model, df, mesh=mesh,
            hyper={"learning_rate": [0.01, 0.02, 0.03]}, nepochs=1,
        )


def test_population_epoch_budget_and_agg_parity_with_train():
    """Review fixes pinned: (1) the epoch budget floors to train()'s eval
    grid — nepochs=10 @ eval_every=3 runs 9 epochs, never 12; (2) a
    callable agg uses compute_loss's own key derivation (was KeyError);
    (3) nepochs < eval_every is an explicit error."""
    from easyhybrid_tpu.losses.specs import AGGREGATIONS

    df = eh.gen_rbq10_data(300, seed=5)
    model = _model()
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01]},
        nepochs=10, batchsize=128, eval_every=3, seed=1, data_seed=0,
    )
    assert list(pop.epochs) == [3, 6, 9]
    assert pop.val_history["mse"].shape == (3, 1)
    # callable agg resolved through LoggingLoss.agg_name (not __name__)
    pop2 = eh.population_train(
        model, df, hyper={"learning_rate": [0.01]}, agg=AGGREGATIONS["mean"],
        nepochs=3, batchsize=128, eval_every=3, seed=1, data_seed=0,
    )
    assert np.isfinite(pop2.best_losses).all()
    with pytest.raises(ValueError, match="no eval block"):
        eh.population_train(
            model, df, hyper={"learning_rate": [0.01]},
            nepochs=2, eval_every=5,
        )


def test_ensemble_predict_mean_and_spread():
    """ensemble_predict: one vmapped forward over members; the mean/std
    reduce over the member axis, a single-member ensemble has zero std,
    and a (stacked_params, stacked_state) tuple works directly."""
    df = eh.gen_rbq10_data(500, seed=8)
    model = _model()
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01]}, seeds=[0, 1, 2],
        nepochs=10, batchsize=128, eval_every=5, seed=6, data_seed=0,
    )
    out = eh.ensemble_predict(model, pop, df)
    n = len(np.asarray(df["ta"]))
    assert out["reco"].shape == (n,)
    assert out["reco_std"].shape == (n,)
    assert np.isfinite(out["reco"]).all()
    # distinct members -> nonzero spread somewhere
    assert out["reco_std"].max() > 0
    # single-member ensemble: std identically ~0, mean == its prediction
    one = jax.tree.map(lambda a: a[:1], pop.best_params)
    st1 = jax.tree.map(lambda a: a[:1], pop.state)
    out1 = eh.ensemble_predict(model, (one, st1), df)
    np.testing.assert_allclose(out1["reco_std"], 0.0, atol=1e-6)
    solo = eh.predict(
        model, pop.member_params(0),
        jax.tree.map(lambda a: a[0], pop.state), df,
    )
    np.testing.assert_allclose(out1["reco"], solo["reco"], atol=1e-5)


def test_population_lstm_sequence_model():
    """The population machinery composes with sequence/LSTM hybrids
    (windowed tensors, scan recurrence) unchanged."""
    df = eh.gen_rbq10_data(800, seed=3)
    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers={"lstm": 8}, input_batchnorm="static",
    )
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01, 0.003]},
        nepochs=6, batchsize=64, eval_every=3,
        sequence_kwargs=dict(input_window=6, output_window=2),
        seed=1, data_seed=0,
    )
    assert np.isfinite(pop.best_losses).all()
    assert pop.val_history["mse"].shape == (2, 2)


def test_population_fold_split():
    """The full split-config surface (folds/val_fold here) flows through
    to split_data, so populations run per-fold like train() does."""
    df = eh.gen_rbq10_data(400, seed=4)
    model = _model()
    folds = eh.make_folds(df, k=4, shuffle=True, seed=0)
    pops = [
        eh.population_train(
            model, df, hyper={"learning_rate": [0.01]}, folds=folds,
            val_fold=k, nepochs=4, batchsize=64, eval_every=2,
            seed=1, data_seed=0,
        )
        for k in (1, 2)
    ]
    for p in pops:
        assert np.isfinite(p.best_losses).all()
    # different folds → different validation sets → different histories
    assert not np.allclose(
        pops[0].val_history["mse"], pops[1].val_history["mse"]
    )


def test_population_cross_validate_matches_sequential_quality():
    """population_cross_validate: all k folds in ONE program. Scores are
    finite, per-fold validation sets genuinely differ, unequal folds are
    zero-mask padded exactly, and quality is in family with the
    sequential cross_validate driver on the same data."""
    from easyhybrid_tpu.training.tune import cross_validate

    df = eh.gen_rbq10_data(700, seed=9)  # 700 % 4 != 0: unequal folds
    model = _model()
    pop = eh.population_cross_validate(
        model, df, k=4, optimizer=("adam", 0.01),
        nepochs=20, batchsize=64, eval_every=5, seed=2, data_seed=0,
    )
    assert pop.epoch_path == "population_vmap_cv"
    assert pop.best_losses.shape == (4,)
    assert np.isfinite(pop.best_losses).all()
    assert list(pop.seeds) == [1, 2, 3, 4]
    # folds see different validation data
    finals = pop.val_history["mse"][-1]
    assert len(np.unique(np.round(finals, 10))) > 1
    # in family with the sequential driver (not bitwise: fold assignment
    # and shuffle keys differ) — same order of magnitude of val MSE
    scores, _ = cross_validate(
        model, df, k=4, seed=0, nepochs=20, batchsize=64,
        optimizer=("adam", 0.01), show_progress=False, patience=100,
    )
    assert np.isfinite(scores).all()
    assert pop.best_losses.mean() < 10 * np.mean(scores) + 1.0


def test_population_cross_validate_rejects_k1():
    """k=1 would leave a fold's train split empty — clear error, not a
    ZeroDivisionError from an empty batch build."""
    with pytest.raises(ValueError, match="k >= 2"):
        eh.population_cross_validate(
            _model(), eh.gen_rbq10_data(100, seed=0), k=1,
            optimizer=("adam", 0.01), nepochs=1,
        )


def test_population_cross_validate_mesh():
    """Fold axis sharded over the 8-device mesh; scores match the
    unsharded CV run."""
    df = eh.gen_rbq10_data(640, seed=2)
    model = _model()
    kw = dict(optimizer=("adam", 0.01), nepochs=6, batchsize=64,
              eval_every=3, seed=3, data_seed=0)
    pop = eh.population_cross_validate(model, df, k=8, **kw)
    mesh = eh.make_mesh(8, axis_name="folds")
    popm = eh.population_cross_validate(model, df, k=8, mesh=mesh, **kw)
    np.testing.assert_allclose(
        popm.val_history["mse"], pop.val_history["mse"], rtol=1e-5
    )


def test_population_cross_validate_sequence_windows():
    """Review fix pinned: CV folds are assigned over PREPARED samples, so
    sequence windowing composes (per-row fold ids used to mismatch the
    windowed count and raise). Data is prepared/windowed once, not k
    times."""
    df = eh.gen_rbq10_data(500, seed=6)
    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers={"lstm": 8}, input_batchnorm="static",
    )
    pop = eh.population_cross_validate(
        model, df, k=3, optimizer=("adam", 0.01),
        nepochs=4, batchsize=64, eval_every=2,
        sequence_kwargs=dict(input_window=5, output_window=1),
        seed=1, data_seed=0,
    )
    assert pop.best_losses.shape == (3,)
    assert np.isfinite(pop.best_losses).all()


def test_plot_population_renders(tmp_path):
    """plot_population renders headless and saves a file."""
    df = eh.gen_rbq10_data(300, seed=1)
    model = _model()
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.02, 0.005]},
        nepochs=4, batchsize=64, eval_every=2, seed=1, data_seed=0,
    )
    out = tmp_path / "pop.png"
    fig = eh.plot_population(pop, save=str(out))
    assert out.exists() and out.stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_param_spread_physical_units():
    """param_spread reports global-parameter mean±std across members, in
    physical units when the model is given (Q10 near the true 2.0 with a
    nonzero seed-ensemble spread)."""
    df = eh.gen_rbq10_data(2000, seed=42)
    model = _model((16, 16))
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01]}, seeds=[0, 1, 2],
        nepochs=40, batchsize=512, eval_every=5, seed=7, data_seed=0,
    )
    spread = pop.param_spread(model)
    mean, std = spread["Q10"]
    assert abs(float(mean) - 2.0) < 0.3
    assert float(std) > 0.0  # distinct seeds -> genuinely nonzero spread
    raw_mean, _ = pop.param_spread()["Q10"]
    # raw (pre-sigmoid) values are NOT in physical units
    assert abs(float(raw_mean) - float(mean)) > 1e-6


def test_population_2d_mesh_members_by_data():
    """Composed 2-D parallelism: a (members=2, data=4) mesh shards the
    member axis AND the in-batch sample axis; params replicate across the
    data axis so XLA psums per-member gradients over it. Numerics match
    the unsharded run."""
    from jax.sharding import Mesh
    import numpy as _np

    df = eh.gen_rbq10_data(600, seed=2)
    model = _model()
    kw = dict(
        hyper={"learning_rate": [0.01, 0.003]},
        optimizer="adam", nepochs=10, batchsize=128, eval_every=5,
        seed=4, data_seed=0,
    )
    pop = eh.population_train(model, df, **kw)
    devs = _np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("members", "data"))
    popm = eh.population_train(model, df, mesh=mesh2, **kw)
    np.testing.assert_allclose(
        popm.val_history["mse"], pop.val_history["mse"], rtol=2e-5
    )
    assert popm.best_member == pop.best_member


def test_population_fused_engine_interpret_mode(monkeypatch):
    """EASYHYBRID_PALLAS=1 honors train()'s env contract in the population
    paths too (backend gate skipped, exactness gate + vmapped self-check
    still run) — exercising the fused wiring off-TPU via the interpret
    kernel. Seed-ensemble trajectories match the XLA engine."""
    df = eh.gen_rbq10_data(300, seed=3)
    model = _model()
    kw = dict(seeds=[0, 1], nepochs=4, batchsize=64, eval_every=2,
              seed=2, data_seed=0)
    pop_xla = eh.population_train(model, df, **kw)
    assert pop_xla.epoch_path == "population_vmap"
    monkeypatch.setenv("EASYHYBRID_PALLAS", "1")
    monkeypatch.setenv("EASYHYBRID_GATE_CACHE", "0")
    pop_f = eh.population_train(model, df, **kw)
    assert pop_f.epoch_path == "population_vmap_fused", pop_f.epoch_path
    np.testing.assert_allclose(
        pop_f.val_history["mse"], pop_xla.val_history["mse"], rtol=2e-4
    )
    # CV variant: per-fold data vmaps through the same fused engine
    cv_f = eh.population_cross_validate(
        model, df, k=2, optimizer=("adam", 0.01),
        nepochs=4, batchsize=64, eval_every=2, seed=2, data_seed=0,
    )
    assert cv_f.epoch_path == "population_vmap_cv_fused", cv_f.epoch_path
    assert np.isfinite(cv_f.best_losses).all()


def test_population_mesh_composes_with_fused_engine(monkeypatch):
    """Round 4 (late): a 1-D member mesh COMPOSES with the fused Pallas
    engine — the vmapped kernel runs under shard_map over the member axis
    (a pallas_call is opaque to the SPMD partitioner, so the member
    assignment is explicit; zero collectives, shared data replicated).
    Ensemble, traced-hyper sweep, and CV trajectories all match their
    unsharded fused runs; a 2-D mesh still picks the XLA engine (in-member
    data parallelism needs the gradient psum before the in-kernel
    update)."""
    df = eh.gen_rbq10_data(300, seed=3)
    model = _model()
    monkeypatch.setenv("EASYHYBRID_PALLAS", "1")
    monkeypatch.setenv("EASYHYBRID_GATE_CACHE", "0")
    kw = dict(nepochs=4, batchsize=64, eval_every=2, seed=2, data_seed=0)
    mesh = eh.make_mesh(4, axis_name="members")

    ens = eh.population_train(model, df, seeds=[0, 1, 2, 3], **kw)
    ensm = eh.population_train(
        model, df, seeds=[0, 1, 2, 3], mesh=mesh, **kw
    )
    assert ensm.epoch_path == "population_vmap_fused", ensm.engine_reason
    assert "shard_map" in ensm.engine_reason
    np.testing.assert_allclose(
        ensm.val_history["mse"], ens.val_history["mse"], rtol=2e-5
    )

    lrs = {"learning_rate": [0.01, 0.005, 0.002, 0.001]}
    sw = eh.population_train(model, df, hyper=lrs, **kw)
    swm = eh.population_train(model, df, hyper=lrs, mesh=mesh, **kw)
    assert swm.epoch_path == "population_vmap_fused", swm.engine_reason
    np.testing.assert_allclose(
        swm.val_history["mse"], sw.val_history["mse"], rtol=2e-5
    )

    cvkw = dict(optimizer=("adam", 0.01), nepochs=4, batchsize=64,
                eval_every=2, seed=2, data_seed=0)
    cv = eh.population_cross_validate(model, df, k=4, **cvkw)
    cvm = eh.population_cross_validate(model, df, k=4, mesh=mesh, **cvkw)
    assert cvm.epoch_path == "population_vmap_cv_fused", cvm.engine_reason
    assert "shard_map" in cvm.engine_reason
    np.testing.assert_allclose(
        np.asarray(cvm.best_losses), np.asarray(cv.best_losses), rtol=2e-5
    )

    from jax.sharding import Mesh

    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                 ("members", "data"))
    pop2 = eh.population_train(
        model, df, seeds=[0, 1], mesh=mesh2, **kw
    )
    assert pop2.epoch_path == "population_vmap"
    assert "2-D mesh" in pop2.engine_reason


def _multisite_setup(S, T, seed=3):
    from easyhybrid_tpu.parallel.multisite import prepare_multisite_data

    base = _model()
    df = eh.gen_rbq10_data(S * T, seed=seed)
    df["site"] = np.repeat(np.arange(S), T)
    ms = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    return ms, prepare_multisite_data(base, df, "site")


def test_population_over_multisite_xla_engine():
    """Seed ensembles of a MultiSiteHybridModel run out of the box on the
    XLA vmap engine (CPU default) — per-member per-site params stack to
    (K, S, 1)."""
    ms, data = _multisite_setup(32, 10)
    pop = eh.population_train(
        ms, data, seeds=[0, 1, 2], optimizer="adam", nepochs=3,
        batchsize=32, split_data_at=0.75, eval_every=1,
    )
    assert pop.epoch_path == "population_vmap"
    assert np.isfinite(pop.best_losses).all()
    assert pop.params["globals"]["Q10"].shape == (3, 32, 1)


def test_population_over_multisite_fused_engine(monkeypatch):
    """Round 4: seed ensembles of a MultiSiteHybridModel vmap the
    DEDICATED multisite Pallas kernel (gated + self-checked), for both the
    full-site-batch and the 128-multiple minibatched (shuffle off)
    configurations."""
    monkeypatch.setenv("EASYHYBRID_PALLAS", "1")
    ms, data = _multisite_setup(256, 8)
    pop = eh.population_train(
        ms, data, seeds=[0, 1], optimizer="adam", nepochs=2,
        batchsize=256, split_data_at=0.75, eval_every=1,
    )
    assert pop.epoch_path == "population_vmap_fused", pop.engine_reason
    assert "multisite" in pop.engine_reason
    assert np.isfinite(pop.best_losses).all()
    # minibatched sites (128-multiple, shuffle off) stay fused
    pop_mb = eh.population_train(
        ms, data, seeds=[0, 1], optimizer="adam", nepochs=2,
        batchsize=128, shuffle_each_epoch=False, split_data_at=0.75,
        eval_every=1,
    )
    assert pop_mb.epoch_path == "population_vmap_fused", pop_mb.engine_reason
    # rmse joined the minibatched envelope late round 4 (batch-scoped
    # deferred factor): ensembles with training_loss="rmse" stay fused
    pop_rmse = eh.population_train(
        ms, data, seeds=[0, 1], optimizer="adam", nepochs=2,
        batchsize=128, shuffle_each_epoch=False, split_data_at=0.75,
        eval_every=1, training_loss="rmse", loss_types=["rmse"],
    )
    assert pop_rmse.epoch_path == "population_vmap_fused", (
        pop_rmse.engine_reason
    )
    assert np.isfinite(pop_rmse.best_losses).all()
    # round 5: shuffled minibatches stay fused (per-epoch slot-map
    # permutation around one launch per epoch)
    pop_sh = eh.population_train(
        ms, data, seeds=[0, 1], optimizer="adam", nepochs=2,
        batchsize=128, split_data_at=0.75, eval_every=1,
    )
    assert pop_sh.epoch_path == "population_vmap_fused", pop_sh.engine_reason
    assert np.isfinite(pop_sh.best_losses).all()
    # a 1-D member mesh composes with the multisite kernel too (round 4
    # late: shard_map over the member axis, shared site data replicated)
    pop_m = eh.population_train(
        ms, data, seeds=[0, 1], optimizer="adam", nepochs=2,
        batchsize=256, split_data_at=0.75, eval_every=1,
        mesh=eh.make_mesh(2, axis_name="members"),
    )
    assert pop_m.epoch_path == "population_vmap_fused", pop_m.engine_reason
    assert "shard_map" in pop_m.engine_reason
    np.testing.assert_allclose(
        pop_m.val_history["mse"], pop.val_history["mse"], rtol=2e-5
    )


def test_population_pure_sweep_shared_shuffle_order():
    """A PURE hyper sweep (uniform seeds) gives every member the SAME
    per-block shuffle key: members differ only by hyperparameter, never by
    batch order (reference tune loops train each config with one seed).
    Duplicate-lr members are bit-identical (same program, same data
    order), and a K=1 run with the same lr reproduces the matching member
    to float noise (different K → different vmap lowering, so cross-
    program bitwise equality is not guaranteed)."""
    df = eh.gen_rbq10_data(400, seed=1)
    model = _model()
    common = dict(
        optimizer="adam", nepochs=10, batchsize=64, eval_every=5,
        seed=3, data_seed=0,
    )
    pop = eh.population_train(
        model, df, hyper={"learning_rate": [0.01, 0.01, 0.002]}, **common
    )
    for a in jax.tree.leaves(pop.params):
        np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(a)[1])
    solo = eh.population_train(
        model, df, hyper={"learning_rate": [0.002]}, **common
    )
    for a, b in zip(jax.tree.leaves(pop.params), jax.tree.leaves(solo.params)):
        np.testing.assert_allclose(
            np.asarray(a)[2], np.asarray(b)[0], rtol=2e-4, atol=2e-5
        )
    # engine provenance: sweeps record why the XLA engine ran
    assert pop.engine_reason is not None
    # seed ENSEMBLES keep per-member shuffle streams (diversity):
    ens = eh.population_train(model, df, seeds=[3, 3], **common)
    leaves = jax.tree.leaves(ens.params)
    same = all(
        np.array_equal(np.asarray(a)[0], np.asarray(a)[1]) for a in leaves
    )
    assert not same or jax.default_backend() == "tpu"  # fused path may share


def test_population_fused_sweep_engine_interpret_mode(monkeypatch):
    """Hyperparameter SWEEPS run the fused kernel with streamed per-member
    optimizer scalars (round-4): the traced-hyper engine must match the
    XLA inject_hyperparams engine per member, select the fused path, and
    keep duplicate-hyper members bit-identical."""
    df = eh.gen_rbq10_data(300, seed=3)
    model = _model()
    kw = dict(
        hyper={"learning_rate": [0.02, 0.02, 0.005]},
        optimizer="adam", nepochs=4, batchsize=64, eval_every=2,
        seed=2, data_seed=0,
    )
    pop_xla = eh.population_train(model, df, **kw)
    assert pop_xla.epoch_path == "population_vmap"
    monkeypatch.setenv("EASYHYBRID_PALLAS", "1")
    monkeypatch.setenv("EASYHYBRID_GATE_CACHE", "0")
    pop_f = eh.population_train(model, df, **kw)
    assert pop_f.epoch_path == "population_vmap_fused", pop_f.engine_reason
    assert "sweep" in pop_f.engine_reason
    np.testing.assert_allclose(
        pop_f.val_history["mse"], pop_xla.val_history["mse"], rtol=2e-4
    )
    # duplicate-lr members are bit-identical inside ONE program
    for a in jax.tree.leaves(pop_f.params):
        np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(a)[1])
    # multi-hyper sweep (lr × b1) also fuses
    pop_m = eh.population_train(
        model, df,
        hyper={"learning_rate": [0.02, 0.005], "b1": [0.9, 0.95]},
        optimizer="adam", nepochs=4, batchsize=64, eval_every=2,
        seed=2, data_seed=0,
    )
    assert pop_m.epoch_path == "population_vmap_fused", pop_m.engine_reason
    assert np.isfinite(pop_m.best_losses).all()
    # round 5: noisy_sgd sweeps fuse too — the pre-generated optax noise
    # stream vmaps per member (same draws when eta/gamma aren't swept;
    # the traced lr rides the hyper tile)
    pop_n = eh.population_train(
        model, df, hyper={"learning_rate": [0.02, 0.005]},
        optimizer="noisy_sgd", nepochs=4, batchsize=64, eval_every=2,
        seed=2, data_seed=0,
    )
    assert pop_n.epoch_path == "population_vmap_fused", pop_n.engine_reason
    assert np.isfinite(pop_n.best_losses).all()
