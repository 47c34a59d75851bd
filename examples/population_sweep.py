"""Population training: a whole lr sweep + a seed ensemble in ONE program.

The reference tunes hyperparameters with sequential ``train()`` loops
(src/training/tune.jl:27-44 + the Hyperopt tutorials). TPU-native
populations instead vmap K members into a single compiled program — and
on TPU hardware the fused Pallas epoch kernel serves the whole sweep,
each member's optimizer scalars streamed in as a traced operand
(``pop.epoch_path == "population_vmap_fused"``; ``pop.engine_reason``
says which engine ran and why). A 16-member sweep costs roughly ONE
member's wall-clock.

Run: python examples/population_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh


def rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def main():
    nepochs = int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "60"))
    eval_every = max(1, min(5, nepochs))
    df = eh.gen_rbq10_data(8_000, seed=42)

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

    # ---- learning-rate sweep: 8 members, one program ------------------
    # pure sweeps (no `seeds`) train every member with the SAME shuffle
    # stream, so members differ ONLY by learning rate
    pop = eh.population_train(
        model, df,
        hyper={"learning_rate": list(np.geomspace(1e-3, 5e-2, 8))},
        optimizer="adam",
        nepochs=nepochs, batchsize=512, eval_every=eval_every,
        seed=11, data_seed=0,
    )
    best_lr = float(pop.hyper["learning_rate"][pop.best_member])
    print(f"sweep engine: {pop.epoch_path} ({pop.engine_reason})")
    print(
        f"best member {pop.best_member}: lr={best_lr:.4g}, "
        f"val mse={pop.best_losses[pop.best_member]:.5f} "
        f"@ epoch {int(pop.best_epochs[pop.best_member])}"
    )

    # ---- seed ensemble at the winning lr: parameter uncertainty -------
    ens = eh.population_train(
        model, df,
        hyper={"learning_rate": [best_lr]},
        seeds=list(range(8)),
        optimizer="adam",
        nepochs=nepochs, batchsize=512, eval_every=eval_every,
        seed=11, data_seed=0,
    )
    q10_mean, q10_std = ens.param_spread(model)["Q10"]
    print(
        f"ensemble Q10 = {float(q10_mean):.3f} ± {float(q10_std):.3f} "
        "(true 2.0)"
    )

    # ---- ensemble prediction with predictive uncertainty --------------
    out = eh.ensemble_predict(model, ens, df.head(1000))
    assert "reco" in out and "reco_std" in out
    print(
        f"ensemble predictions: mean reco {np.nanmean(out['reco']):.3f}, "
        f"mean member spread {np.nanmean(out['reco_std']):.4f}"
    )
    return pop, ens


if __name__ == "__main__":
    main()
