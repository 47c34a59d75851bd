"""Multi-output soil-respiration component training.

Parity with the reference project ``projects/RbQ10/
train_on_Rs_and_components.jl``: the 3-component respiration model trained
on the total flux AND its components simultaneously, with different losses
per target via ``PerTarget``.

Run: python examples/rs_components.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import easyhybrid_tpu as eh


def make_data(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    ta = rng.normal(12, 7, n).astype(np.float32)
    moisture = rng.random(n).astype(np.float32)
    litter = rng.random(n).astype(np.float32)
    rb_het = 1.5 + 1.0 * moisture
    rb_root = 1.0 + 0.8 * litter
    rb_myc = 0.5 + 0.3 * moisture * litter
    q = {"het": 1.8, "root": 2.4, "myc": 2.0}
    comp = {
        k: rb * q[k] ** (0.1 * (ta - 15.0))
        for k, rb in [("het", rb_het), ("root", rb_root), ("myc", rb_myc)]
    }
    noise = lambda: 0.05 * rng.standard_normal(n)
    return pd.DataFrame(
        dict(
            ta=ta,
            moisture=moisture,
            litter=litter,
            R_het=(comp["het"] + noise()).astype(np.float32),
            R_root=(comp["root"] + noise()).astype(np.float32),
            R_soil=(comp["het"] + comp["root"] + comp["myc"] + noise()).astype(
                np.float32
            ),
        )
    )


def main():
    df = make_data()

    model = eh.RsComponents(
        predictors=["moisture", "litter"],
        forcing=["ta"],
        targets=["R_soil", "R_het", "R_root"],   # myc is unobserved
        nn=[16, 16],
    )

    results = eh.train(
        model,
        df,
        nepochs=int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "60")),
        batchsize=256,
        optimizer=("adam", 0.01),
        training_loss=eh.PerTarget(["mse", "mse", "mae"]),
        loss_types=["mse", "r2"],
        tracked_params=["Q10_het", "Q10_root", "Q10_myc"],
        patience=20,
        show_progress=False,
    )

    print(f"best val loss {results.best_loss:.4f} @ epoch {results.best_epoch}")
    for name, truth in [("Q10_het", 1.8), ("Q10_root", 2.4), ("Q10_myc", 2.0)]:
        learned = results.tracked[name][-1]
        print(f"{name}: learned {learned:.3f} (true {truth})")
    # the unobserved mycorrhizal component is still predicted
    print("R_myc prediction available:", "R_myc" in (results.val_diffs or {}))
    return results


if __name__ == "__main__":
    main()
