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
    assert not supports_fused_epoch(model, {"nn": "adam"}, ll)  # per-branch
    assert not supports_fused_epoch(
        model, ("adam", 0.01), eh.LoggingLoss(extra_loss=eh.l2_extra_loss())
    )
    # trainable BN not supported
    m2 = eh.construct_hybrid_model(
        predictors=["sw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=model.mechanistic_model,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        input_batchnorm=True,
    )
    assert not supports_fused_epoch(m2, ("adam", 0.01), ll)


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

    # the fused kernel does not emit a loss (SMEM scalar store + autodiff
    # trips Mosaic); parameters are the ground truth here
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


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
