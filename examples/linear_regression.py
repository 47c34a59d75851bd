"""Linear hybrid regression example.

Parity with the reference project ``projects/Linear_Regression/
linearRegression.jl:13-18``: the legacy ``LinearHM`` model
(``obs = alpha(x2, x3; NN) * x1 + beta``) on synthetic data where the true
``alpha = exp(-5 (x2 - 0.7)^2) + x3 / 10`` and ``beta = 2``.

Run: python examples/linear_regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh


def main():
    df = eh.gen_linear_data(1000)

    model = eh.LinearHM(
        predictors=["x2", "x3"], forcing=["x1"], targets=["obs"], nn=[15, 15]
    )

    results = eh.train(
        model,
        df,
        nepochs=int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "100")),
        batchsize=64,
        optimizer=("adam", 0.01),
        patience=20,
        loss_types=["mse", "r2"],
    )

    beta = float(np.asarray(results.params["beta"])[0])
    print(f"\nlearned beta = {beta:.3f} (true 2.0)")
    print(f"best val mse = {results.best_loss:.5f} @ epoch {results.best_epoch}")
    return results


if __name__ == "__main__":
    main()
