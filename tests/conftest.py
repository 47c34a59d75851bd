"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (set BEFORE jax import)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU backend even when a TPU plugin (axon) is registered at
# interpreter startup — the env var alone is overridden by the plugin's
# jax_platforms hook, so set the config directly before any jax use.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def rbq10_model():
    """Small RbQ10 hybrid model (the reference book-chapter config)."""
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    return eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers=[8, 8],
        activation="tanh",
        scale_nn_outputs=True,
        input_batchnorm=True,
    )


@pytest.fixture
def rbq10_df():
    import easyhybrid_tpu as eh

    return eh.gen_rbq10_data(256, seed=7)
