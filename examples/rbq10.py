"""RbQ10 soil-respiration hybrid — the reference quick-start.

Parity with the reference README quick start (README.md:134-209) and
``projects/RbQ10/Q10.jl``: an MLP predicts base respiration ``rb`` from
radiation covariates; the temperature sensitivity ``Q10`` is a learned
global scalar; the mechanistic model is
``reco = rb * Q10^((ta - 15) / 10)``. The synthetic data has true Q10 = 2.

Run: python examples/rbq10.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh


def rbq10(*, ta, rb, Q10, tref=15.0):
    reco = rb * Q10 ** (0.1 * (ta - tref))
    return {"reco": reco}


def main():
    df = eh.gen_rbq10_data(20_000, seed=42)

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
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
        batchsize=512,
        optimizer=("rmsprop", 0.001),   # reference quick-start optimizer
        patience=30,
        tracked_params=["Q10"],
        loss_types=["mse", "r2"],
    )

    q10 = float(np.asarray(eh.scale_param(results.params["globals"]["Q10"], 1.0, 4.0))[0])
    print(f"\nlearned Q10 = {q10:.4f} (true 2.0)")
    print(f"best val mse = {results.best_loss:.5f} @ epoch {results.best_epoch}")
    return results


if __name__ == "__main__":
    main()
