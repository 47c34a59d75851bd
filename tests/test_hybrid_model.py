"""Hybrid model construction / init / forward (reference parity:
test/test_generic_hybrid_model.jl:22-589)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import easyhybrid_tpu as eh


def mech(*, f, a, b, c):
    return {"t": a * f + b + c}


PARAMS = {"a": (1.0, 0.0, 2.0), "b": (0.5, 0.0, 1.0), "c": (0.1, 0.0, 0.2)}


def test_single_nn_construction():
    m = eh.construct_hybrid_model(
        predictors=["p1", "p2"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=["b"],
        hidden_layers=[8],
    )
    assert isinstance(m, eh.SingleNNHybridModel)
    assert m.fixed_param_names == ("c",)
    assert m.nn.in_dim == 2 and m.nn.out_dim == 1


def test_multi_nn_construction():
    m = eh.construct_hybrid_model(
        predictors={"a": ["p1", "p2"], "b": ["p3"]},
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        global_param_names=["c"],
        hidden_layers=[4],
    )
    assert isinstance(m, eh.MultiNNHybridModel)
    assert m.neural_param_names == ("a", "b")
    assert m.fixed_param_names == ()
    assert m.nn_dict["a"].in_dim == 2
    assert m.nn_dict["b"].in_dim == 1


def test_multi_nn_per_branch_hidden_layers():
    m = eh.construct_hybrid_model(
        predictors={"a": ["p1"], "b": ["p2"]},
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        global_param_names=["c"],
        hidden_layers={"a": [4], "b": [8, 8]},
        activation={"a": "tanh", "b": "relu"},
    )
    assert m.nn_dict["a"].hidden == (4,)
    assert m.nn_dict["b"].hidden == (8, 8)


def test_empty_predictors_no_nn():
    m = eh.construct_hybrid_model(
        predictors=[],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        neural_param_names=[],
        global_param_names=["a", "b", "c"],
    )
    assert m.nn is None
    params, state = m.init(jax.random.PRNGKey(0))
    assert "nn" not in params
    assert set(params["globals"]) == {"a", "b", "c"}


def test_construction_errors():
    with pytest.raises(ValueError):
        eh.construct_hybrid_model(
            predictors=["p"],
            forcing=["f"],
            targets=["t"],
            mechanistic_model=mech,
            parameters=PARAMS,
            neural_param_names=["zzz"],  # not in table
            global_param_names=[],
        )
    with pytest.raises(ValueError):
        eh.construct_hybrid_model(
            predictors=["p"],
            forcing=["f"],
            targets=["t"],
            mechanistic_model=mech,
            parameters=PARAMS,
            neural_param_names=["a"],
            global_param_names=["zzz"],
        )
    with pytest.raises(ValueError):
        eh.construct_hybrid_model(
            predictors=["p"], forcing=["f"], targets=["t"],
            mechanistic_model=None, parameters=PARAMS,
        )


def test_init_structure_and_default_seed():
    m = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=["b"],
        start_from_default=True,
    )
    params, state = m.init(jax.random.PRNGKey(0))
    assert set(params) == {"nn", "globals"}
    assert params["globals"]["b"].shape == (1,)
    # start_from_default: sigmoid-scaling the raw value recovers the default
    scaled = float(np.asarray(eh.scale_param(params["globals"]["b"], 0.0, 1.0))[0])
    np.testing.assert_allclose(scaled, 0.5, rtol=1e-5)
    # fixed params live in state at defaults
    np.testing.assert_allclose(np.asarray(state["fixed"]["c"])[0], 0.1, rtol=1e-6)


def test_init_random_start():
    m = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=["b"],
        start_from_default=False,
    )
    params, _ = m.init(jax.random.PRNGKey(1))
    raw = float(np.asarray(params["globals"]["b"])[0])
    assert 0.0 <= raw <= 1.0  # uniform random raw (reference :249-251)


def test_forward_outputs_and_semantics():
    m = eh.construct_hybrid_model(
        predictors=["p1", "p2"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=["b"],
        scale_nn_outputs=True,
    )
    params, state = m.init(jax.random.PRNGKey(0))
    n = 16
    x = jnp.ones((n, 2))
    f = jnp.arange(n, dtype=jnp.float32)
    out, new_state = m.apply(params, state, (x, {"f": f}))
    assert out["t"].shape == (n,)
    p = out["parameters"]
    assert set(p) == {"a", "b", "c"}
    assert p["a"].shape == (n,)          # per-sample neural param
    assert p["b"].shape == (1,)          # global scalar
    # scaled neural params inside bounds
    a = np.asarray(p["a"])
    assert np.all(a > 0.0) and np.all(a < 2.0)
    # manual recomposition matches the output
    manual = a * np.asarray(f) + np.asarray(p["b"]) + np.asarray(p["c"])
    np.testing.assert_allclose(np.asarray(out["t"]), manual, rtol=1e-5)


def test_forward_multi_nn():
    m = eh.construct_hybrid_model(
        predictors={"a": ["p1", "p2"], "b": ["p3"]},
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        global_param_names=["c"],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    n = 8
    x = {"a": jnp.ones((n, 2)), "b": jnp.zeros((n, 1))}
    out, _ = m.apply(params, state, (x, {"f": jnp.ones(n)}))
    assert out["t"].shape == (n,)
    assert set(out["nn_outputs"]) == {"a", "b"}


def test_mechanistic_kwarg_filtering():
    """Mechanistic fn of a subset of kwargs works; missing params raise."""

    def mech_subset(*, f, a):
        return {"t": a * f}

    m = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech_subset,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=["b"],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(params, state, (jnp.ones((4, 1)), {"f": jnp.ones(4)}))
    assert "t" in out

    def mech_missing(*, f, a, zzz):
        return {"t": a * f * zzz}

    m2 = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech_missing,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=[],
    )
    params2, state2 = m2.init(jax.random.PRNGKey(0))
    with pytest.raises(KeyError):
        m2.apply(params2, state2, (jnp.ones((4, 1)), {"f": jnp.ones(4)}))


def test_mechanistic_namedtuple_output():
    from collections import namedtuple

    Out = namedtuple("Out", ["t"])

    def mech_nt(*, f, a, b, c):
        return Out(t=a * f)

    m = eh.construct_hybrid_model(
        predictors=["p1"],
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech_nt,
        parameters=PARAMS,
        neural_param_names=["a"],
        global_param_names=[],
    )
    params, state = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(params, state, (jnp.ones((4, 1)), {"f": jnp.ones(4)}))
    assert "t" in out


def test_jit_grad_through_hybrid(rbq10_model):
    model = rbq10_model
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 2)), jnp.float32)
    f = jnp.asarray(np.random.default_rng(1).normal(10, 5, 32), jnp.float32)
    y = jnp.asarray(np.random.default_rng(2).normal(3, 1, 32), jnp.float32)

    @jax.jit
    def loss(p):
        out, _ = model.apply(p, state, (x, {"ta": f}), training=True)
        return jnp.mean((out["reco"] - y) ** 2)

    g = jax.grad(loss)(params)
    # gradient reaches both the NN weights and the global Q10
    q10_grad = np.asarray(g["globals"]["Q10"])
    assert np.all(np.isfinite(q10_grad)) and np.any(q10_grad != 0)
    nn_leaves = jax.tree.leaves(g["nn"])
    assert any(np.any(np.asarray(l) != 0) for l in nn_leaves)


def test_multi_nn_shared_lstm_spec():
    """Regression: a shared {'lstm': n} spec dict for a MultiNN model was
    indexed as a per-branch mapping, KeyError-ing on the branch name; it
    must apply to every branch (per-branch mappings still work — see
    test_multi_nn_per_branch_hidden_layers)."""
    from easyhybrid_tpu.models.nn import LSTMNet

    m = eh.construct_hybrid_model(
        predictors={"a": ["p1"], "b": ["p2"]},
        forcing=["f"],
        targets=["t"],
        mechanistic_model=mech,
        parameters=PARAMS,
        global_param_names=["c"],
        hidden_layers={"lstm": 4},
    )
    assert isinstance(m.nn_dict["a"], LSTMNet)
    assert isinstance(m.nn_dict["b"], LSTMNet)
    assert m.nn_dict["a"].hidden_size == 4
