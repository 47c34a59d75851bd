"""NN module tests (reference parity: NN-construction sections of
test/test_generic_hybrid_model.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyhybrid_tpu.models.nn import (
    MLP,
    BatchNorm,
    Dense,
    LSTMNet,
    construct_nn,
    get_activation,
)


def test_dense_shapes():
    d = Dense(3, 5, "relu")
    params, state = d.init(jax.random.PRNGKey(0))
    assert params["w"].shape == (3, 5)
    y, _ = d.apply(params, state, jnp.ones((7, 3)))
    assert y.shape == (7, 5)
    assert np.all(np.asarray(y) >= 0)  # relu applied


def test_mlp_shapes_and_broadcast():
    m = MLP(4, 2, hidden=(8, 8), activation="tanh")
    params, state = m.init(jax.random.PRNGKey(0))
    y, _ = m.apply(params, state, jnp.ones((10, 4)))
    assert y.shape == (10, 2)
    # sequences broadcast through the leading axes
    y3, _ = m.apply(params, state, jnp.ones((10, 6, 4)))
    assert y3.shape == (10, 6, 2)


def test_mlp_input_batchnorm_state():
    m = MLP(3, 1, hidden=(4,), input_batchnorm=True)
    params, state = m.init(jax.random.PRNGKey(0))
    assert "norm" in params and "norm" in state
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 10 + 5
    _, new_state = m.apply(params, state, x, training=True)
    # running stats moved toward batch stats
    assert not np.allclose(
        np.asarray(new_state["norm"]["mean"]), np.zeros(3)
    )
    # eval mode leaves state untouched
    _, st_eval = m.apply(params, new_state, x, training=False)
    np.testing.assert_array_equal(
        np.asarray(st_eval["norm"]["mean"]),
        np.asarray(new_state["norm"]["mean"]),
    )


def test_batchnorm_normalizes():
    bn = BatchNorm(2)
    params, state = bn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 2)) * 7 + 3
    y, _ = bn.apply(params, state, x, training=True)
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-2)


def test_lstm_shapes():
    net = LSTMNet(3, 2, hidden_size=8)
    params, state = net.init(jax.random.PRNGKey(0))
    x = jnp.ones((5, 12, 3))  # (batch, time, feat)
    y, _ = net.apply(params, state, x)
    assert y.shape == (5, 12, 2)
    with pytest.raises(ValueError):
        net.apply(params, state, jnp.ones((5, 3)))


def test_lstm_is_causal():
    """Changing a late timestep must not affect earlier outputs."""
    net = LSTMNet(1, 1, hidden_size=4)
    params, state = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 1)), jnp.float32)
    y1, _ = net.apply(params, state, x)
    x2 = x.at[0, -1, 0].set(99.0)
    y2, _ = net.apply(params, state, x2)
    np.testing.assert_allclose(
        np.asarray(y1)[0, :-1], np.asarray(y2)[0, :-1], atol=1e-6
    )
    assert not np.allclose(np.asarray(y1)[0, -1], np.asarray(y2)[0, -1])


def test_construct_nn_dispatch():
    assert isinstance(construct_nn([16, 16], 3, 2), MLP)
    assert isinstance(construct_nn({"lstm": 8}, 3, 1), LSTMNet)
    custom = MLP(3, 2, hidden=(5,))
    assert construct_nn(custom, 3, 2) is custom
    with pytest.raises(ValueError):
        construct_nn({"bogus": 1}, 3, 2)


def test_activations():
    x = jnp.array([-1.0, 0.0, 1.0])
    for name in ["tanh", "relu", "sigmoid", "swish", "gelu", "identity"]:
        y = get_activation(name)(x)
        assert y.shape == x.shape
    # custom callables pass through
    assert get_activation(lambda v: v * 2)(x)[2] == 2.0
    with pytest.raises(ValueError):
        get_activation("nope")


def test_jit_and_grad_through_mlp():
    m = MLP(3, 1, hidden=(4,))
    params, state = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((8, 3))

    @jax.jit
    def loss(p):
        y, _ = m.apply(p, state, x)
        return jnp.sum(y**2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)


def test_mixed_precision_compute():
    """compute_dtype=bfloat16: params stay f32, output f32, values close."""
    m32 = MLP(4, 2, hidden=(8,))
    mbf = MLP(4, 2, hidden=(8,), compute_dtype=jnp.bfloat16)
    params, state = m32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    y32, _ = m32.apply(params, state, x)
    ybf, _ = mbf.apply(params, state, x)
    assert ybf.dtype == jnp.float32  # f32 accumulation/output
    np.testing.assert_allclose(np.asarray(y32), np.asarray(ybf), atol=0.05)
    assert params["layers"][0]["w"].dtype == jnp.float32


def test_lstm_head_follows_param_dtype():
    """Regression: the LSTM output head initialized float32 regardless of
    the net's dtype, yielding a mixed-dtype parameter pytree."""
    import jax
    import jax.numpy as jnp

    net = LSTMNet(3, 2, hidden_size=4, dtype=jnp.bfloat16)
    params, _ = net.init(jax.random.PRNGKey(0))
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(params))


def test_construct_nn_rejects_compute_dtype_with_lstm():
    """Regression: compute_dtype was silently dropped for the
    {'lstm': n} spec — a bfloat16 request returned a float32 model."""
    import jax.numpy as jnp

    from easyhybrid_tpu.models.nn import construct_nn

    with pytest.raises(ValueError, match="compute_dtype"):
        construct_nn({"lstm": 8}, 3, 1, compute_dtype=jnp.bfloat16)
