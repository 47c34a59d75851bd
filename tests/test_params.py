"""Parameter container + bound transforms (reference parity:
test/test_generic_hybrid_model.jl parameter/scaling sections)."""

import numpy as np
import pytest

import easyhybrid_tpu as eh


def test_container_from_tuples():
    pc = eh.build_parameters({"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)})
    assert pc.names == ("rb", "Q10")
    assert pc.default_of("Q10") == 2.0
    assert pc.lower_of("rb") == 0.0
    assert pc.upper_of("rb") == 13.0
    assert len(pc) == 2
    assert "rb" in pc and "zzz" not in pc


def test_container_from_dicts_and_scalars():
    pc = eh.build_parameters(
        {"a": {"default": 1.0, "lower": 0.0, "upper": 2.0}, "b": 5.0}
    )
    assert pc.default_of("a") == 1.0
    # scalar spec gets a wide box containing the default
    assert pc.lower_of("b") < 5.0 < pc.upper_of("b")


def test_container_validation_errors():
    with pytest.raises(ValueError):
        eh.ParameterContainer(("x",), np.array([1.0]), np.array([2.0]), np.array([0.5]))
    with pytest.raises(ValueError):
        eh.build_parameters({"x": (10.0, 0.0, 5.0)})  # default outside bounds
    with pytest.raises(KeyError):
        eh.build_parameters({"x": (1.0, 0.0, 2.0)}).index("y")


def test_scale_unscale_roundtrip():
    lo, up = 1.0, 4.0
    raw = np.linspace(-3, 3, 11)
    scaled = np.asarray(eh.scale_param(raw, lo, up))
    assert np.all(scaled > lo) and np.all(scaled < up)
    back = np.asarray(eh.unscale_param(scaled, lo, up))
    np.testing.assert_allclose(back, raw, rtol=1e-4, atol=1e-4)  # f32 precision


def test_scale_default_gives_default():
    pc = eh.build_parameters({"Q10": (2.0, 1.0, 4.0)})
    raw = eh.unscale_param(2.0, 1.0, 4.0)
    np.testing.assert_allclose(float(eh.scale_param(raw, 1.0, 4.0)), 2.0, rtol=1e-6)


def test_hard_sigmoid():
    x = np.array([-10.0, -2.5, 0.0, 2.5, 10.0])
    y = np.asarray(eh.hard_sigmoid(x))
    np.testing.assert_allclose(y, [0.0, 0.0, 0.5, 1.0, 1.0])
    # inverse on the linear region
    np.testing.assert_allclose(float(eh.inv_hard_sigmoid(0.7)), 1.0, rtol=1e-6)


def test_subset_and_as_dict():
    pc = eh.build_parameters({"a": (1.0, 0.0, 2.0), "b": (3.0, 2.0, 4.0)})
    sub = pc.subset(["b"])
    assert sub.names == ("b",)
    d = pc.as_dict()
    assert d["a"]["upper"] == 2.0


def test_unscale_param_default_at_bound():
    """default == lower/upper pins the parameter (±inf raw) instead of
    raising math-domain errors on the host-scalar fast path."""
    import math

    raw = eh.unscale_param(0.0, 0.0, 13.0)
    assert raw == -math.inf
    assert float(eh.scale_param(raw, 0.0, 13.0)) == 0.0
    raw = eh.unscale_param(13.0, 0.0, 13.0)
    assert raw == math.inf
    assert float(eh.scale_param(raw, 0.0, 13.0)) == 13.0


def test_model_init_with_default_at_bound():
    """A model declaring a global default equal to its bound initializes
    (pinned) instead of crashing model.init."""
    import jax

    def mech(*, ta, rb, Q10):
        return {"reco": rb * Q10 ** (0.1 * (ta - 15.0))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=mech,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (1.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
    )
    params, state = model.init(jax.random.PRNGKey(0))
    assert float(params["globals"]["Q10"][0]) == float("-inf")
