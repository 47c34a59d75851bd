"""ExpoHybrid: exponential process model with NN-predicted parameters.

Parity with the reference project ``projects/ExpoHybrid/
ExpoHybridEstim.jl:26-121``: the MultiNN (NamedTuple-predictors) constructor
form — one NN per physical parameter — an exponential respiration model,
AdamW, NSE training loss, and post-hoc DataFrame inference.

Run: python examples/expo_hybrid.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import easyhybrid_tpu as eh


def expo_model(*, ta, rb, k):
    """reco = rb * exp(k * ta)."""
    return {"reco": rb * np.e ** (k * ta)}


def make_data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    ta = rng.normal(12.0, 6.0, n).astype(np.float32)
    sw_pot = np.abs(50 + 20 * rng.standard_normal(n)).astype(np.float32)
    moisture = rng.random(n).astype(np.float32)
    true_rb = 2.0 + 0.02 * (sw_pot - sw_pot.mean())
    true_k = 0.05 + 0.03 * moisture
    reco = true_rb * np.exp(true_k * ta) + 0.1 * rng.standard_normal(n)
    return pd.DataFrame(
        dict(ta=ta, sw_pot=sw_pot, moisture=moisture, reco=reco.astype(np.float32))
    )


def main():
    df = make_data()

    model = eh.construct_hybrid_model(
        predictors={"rb": ["sw_pot"], "k": ["moisture"]},  # one NN per param
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=expo_model,
        parameters={"rb": (2.0, 0.0, 8.0), "k": (0.05, 0.0, 0.2)},
        global_param_names=[],
        hidden_layers=[16, 16],
        activation="swish",
        scale_nn_outputs=True,
        input_batchnorm="static",
    )
    print(model)

    results = eh.train(
        model,
        df,
        nepochs=int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "100")),
        batchsize=256,
        optimizer=("adamw", 0.01),
        training_loss="nseLoss",
        loss_types=["nseLoss", "mse", "r2"],
        patience=30,
    )
    print(f"\nbest val nseLoss = {results.best_loss:.5f} @ epoch {results.best_epoch}")

    # post-hoc inference on a DataFrame (appends *_pred columns)
    pred_df = model.predict_df(
        results.params, results.state, df.head(10)
    )
    print(pred_df[["reco", "reco_pred", "rb_pred", "k_pred"]])
    return results


if __name__ == "__main__":
    main()
