"""Legacy models + custom factory (reference parity: LinearHM inline testset
in test/runtests.jl, projects/Linear_Regression, RbQ10 scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import easyhybrid_tpu as eh


def test_linear_hm_forward_and_train():
    df = eh.gen_linear_data(300, seed=1)
    m = eh.LinearHM(
        predictors=["x2", "x3"], forcing=["x1"], targets=["obs"], nn=[15, 15]
    )
    params, state = m.init(jax.random.PRNGKey(0))
    data = eh.prepare_data(m, df)
    out, _ = m.apply(params, state, (jnp.asarray(data.x), data.forcing))
    assert out["obs"].shape == (300,)
    assert "alpha" in out
    res = eh.train(m, df, nepochs=5, batchsize=64, show_progress=False,
                   optimizer=("adam", 0.05))
    assert res.best_loss < res.val_history[0]["mse"]["sum"]


def test_respiration_rb_q10():
    df = eh.gen_rbq10_data(300, seed=2)
    m = eh.RespirationRbQ10(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        q10=1.5, nn=[16, 16],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(params["Q10"]), [1.5])
    res = eh.train(m, df, nepochs=2, batchsize=64, show_progress=False,
                   tracked_params=["Q10"])
    assert np.isfinite(res.best_loss)
    assert "Q10" in res.tracked and len(res.tracked["Q10"]) == 3


def test_m_rb_q10_kernel():
    out = np.asarray(eh.m_rb_q10(2.0, 2.0, jnp.asarray([25.0]), 15.0))
    np.testing.assert_allclose(out, [4.0], rtol=1e-6)


def test_rs_components():
    m = eh.RsComponents(
        predictors=["p1", "p2"], forcing=["ta"], targets=["R_soil"], nn=[8]
    )
    params, state = m.init(jax.random.PRNGKey(0))
    n = 16
    out, _ = m.apply(
        params, state, (jnp.ones((n, 2)), {"ta": jnp.full(n, 20.0)})
    )
    np.testing.assert_allclose(
        np.asarray(out["R_soil"]),
        np.asarray(out["R_het"] + out["R_root"] + out["R_myc"]),
        rtol=1e-6,
    )


def test_rbq10_two_params_recovers_q10():
    """Pure 2-parameter PBM fits Q10 from clean synthetic data."""
    rng = np.random.default_rng(0)
    ta = rng.normal(10, 8, 512).astype(np.float32)
    reco = 2.5 * 2.0 ** (0.1 * ta)
    df = {"ta": ta, "reco": reco}
    m = eh.RbQ10TwoParams(forcing=["ta"], targets=["reco"], q10=1.5, rb=1.0)
    res = eh.train(
        m, df, nepochs=300, batchsize=None, optimizer=("adam", 0.05),
        show_progress=False, shuffle_each_epoch=False,
    )
    q10 = float(np.asarray(res.params["Q10"])[0])
    rb = float(np.asarray(res.params["Rb"])[0])
    assert abs(q10 - 2.0) < 0.1
    assert abs(rb - 2.5) < 0.2


def test_flux_part_model():
    rng = np.random.default_rng(0)
    n = 200
    df = {
        "rad1": rng.random(n).astype(np.float32),
        "temp1": rng.random(n).astype(np.float32),
        "SW_IN": (rng.random(n) * 500).astype(np.float32),
        "TA": rng.normal(12, 6, n).astype(np.float32),
        "NEE": rng.normal(0, 2, n).astype(np.float32),
    }
    m = eh.FluxPartModelQ10(
        rue_predictors=["rad1"], rb_predictors=["temp1"],
        rue_nn=[8], rb_nn=[8],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    data = eh.prepare_data(m, df)
    out, _ = m.apply(params, state, (data.x, data.forcing))
    np.testing.assert_allclose(
        np.asarray(out["NEE"]), np.asarray(out["RECO"] - out["GPP"]), rtol=1e-5
    )
    res = eh.train(m, df, nepochs=1, batchsize=64, show_progress=False)
    assert np.isfinite(res.best_loss)


def test_make_hybrid_factory():
    """@hybrid macro analog: custom params + user forward."""

    def forward(nn_out, forcing, params):
        rb = nn_out[..., 0]
        return {"resp": rb * params["Q10"] ** (0.1 * (forcing["ta"] - 15.0))}

    m = eh.make_hybrid(
        "MyRbQ10",
        predictors=["sw_pot"],
        forcing=["ta"],
        targets=["resp"],
        params={"Q10": 1.8},
        forward=forward,
        nn=[8],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    assert float(np.asarray(params["Q10"])[0]) == pytest.approx(1.8)
    out, _ = m.apply(params, state, (jnp.ones((4, 1)), {"ta": jnp.full(4, 25.0)}))
    assert out["resp"].shape == (4,)
    rng = np.random.default_rng(1)
    df = {
        "sw_pot": rng.random(100).astype(np.float32),
        "ta": rng.normal(15, 5, 100).astype(np.float32),
        "resp": rng.random(100).astype(np.float32) + 1,
    }
    res = eh.train(m, df, nepochs=1, batchsize=32, show_progress=False)
    assert np.isfinite(res.best_loss)
