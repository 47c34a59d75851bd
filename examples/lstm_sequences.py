"""LSTM hybrid on windowed sequences.

Parity with the reference tutorial
``docs/literate/tutorials/example_synthetic_lstm.jl``: a feed-forward and an
LSTM hybrid trained on the same synthetic respiration data; the LSTM
consumes sliding windows and the per-timestep outputs become the per-sample
``rb`` series.

Run: python examples/lstm_sequences.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh


def rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build(hidden):
    return eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers=hidden,
        scale_nn_outputs=True,
        input_batchnorm="static",
    )


def main():
    df = eh.gen_rbq10_data(4000, seed=7)
    common = dict(
        nepochs=int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "30")),
        batchsize=128,
        optimizer=("adam", 0.01),
        training_loss="nseLoss",
        loss_types=["nseLoss", "mse"],
        show_progress=False,
    )

    ff = eh.train(build([16, 16]), df, **common)
    print(f"feed-forward best val nseLoss: {ff.best_loss:.4f}")

    lstm = eh.train(
        build({"lstm": 16}),
        df,
        sequence_kwargs=dict(input_window=10, output_window=1, lead_time=0),
        **common,
    )
    print(f"LSTM         best val nseLoss: {lstm.best_loss:.4f}")
    print("(reference tutorial expectation: 'close enough' — both small)")
    return ff, lstm


if __name__ == "__main__":
    main()
