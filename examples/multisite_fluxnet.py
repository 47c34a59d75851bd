"""Multi-site hybrid training: one shared NN + per-site physical parameters.

The FLUXNET-style setup — hundreds/thousands of eddy-covariance sites, one
shared respiration NN, one Q10 learned PER SITE — has no reference analog
(EasyHybrid.jl is single-series; SURVEY.md §2.10). TPU-native multisite
training vmaps the shared model over a site axis:

* ``prepare_multisite_data`` turns a long table with a site column into
  site-major ``(S, N, F)`` arrays (ragged sites NaN-padded + masked);
* ``MultiSiteHybridModel(base, n_sites=S, share_nn=True)`` shares the NN
  weights and stacks each global physical parameter to ``(S, 1)``;
* on TPU the dedicated fused multisite Pallas kernel runs ALL epochs in
  one launch (``TrainResults.epoch_path == "fused_pallas_multisite"``):
  VMEM-resident packed per-site parameters, 128-site chunks, every
  ``parse_opt_spec`` optimizer. Minibatched sites keep the kernel at ANY
  ``batchsize`` and shuffle in (True, False, "batches") since round 5 —
  shuffled epochs run one launch per epoch with the site permutation
  composed into the kernel's slot map; ``TrainResults.engine_reason``
  names whatever flag decides the engine.

Here each site's TRUE Q10 differs (drawn from [1.4, 2.8]) — the test is
whether per-site Q10s are recovered jointly with one shared rb-NN.

Run: python examples/multisite_fluxnet.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh
from easyhybrid_tpu.parallel.multisite import (
    MultiSiteHybridModel,
    prepare_multisite_data,
)


def rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def make_sites(n_sites: int, n_obs: int, seed: int = 7):
    """Long table: n_sites sites × n_obs rows each, per-site true Q10."""
    rng = np.random.default_rng(seed)
    q10_true = rng.uniform(1.4, 2.8, n_sites)
    frames = {"site": [], "sw_pot": [], "dsw_pot": [], "ta": [], "reco": []}
    for s in range(n_sites):
        df = eh.gen_rbq10_data(
            n_obs, seed=seed + s, true_q10=float(q10_true[s])
        )
        frames["site"].append(np.full(n_obs, s, np.int32))
        for c in ("sw_pot", "dsw_pot", "ta", "reco"):
            frames[c].append(np.asarray(df[c]))
    import pandas as pd

    return (
        pd.DataFrame({k: np.concatenate(v) for k, v in frames.items()}),
        q10_true,
    )


def main():
    nepochs = int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "60"))
    eval_every = max(1, min(5, nepochs))
    S, N = 64, 200
    df, q10_true = make_sites(S, N)

    base = eh.construct_hybrid_model(
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
    model = MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    data = prepare_multisite_data(base, df, site_column="site")

    # full-site batches: the standard multisite setup (batch >= n_sites).
    # On TPU this selects the fused multisite kernel after the runtime
    # exactness gate; off-TPU it runs the XLA scan epoch.
    res = eh.train(
        model, data,
        nepochs=nepochs, batchsize=S, eval_every=eval_every,
        optimizer=("adam", 0.01), split_data_at=0.8,
        shuffle_each_epoch=False, show_progress=False,
    )
    print(f"engine: {res.epoch_path} ({res.engine_reason})")

    q10_hat = np.asarray(
        eh.scale_param(res.params["globals"]["Q10"], 1.0, 4.0)
    ).ravel()
    err = np.abs(q10_hat - q10_true)
    corr = float(np.corrcoef(q10_hat, q10_true)[0, 1])
    print(
        f"per-site Q10 recovery over {S} sites: mean |err| = "
        f"{err.mean():.3f}, max = {err.max():.3f}, corr = {corr:.3f}"
    )
    print(f"val loss: {res.best_loss:.5f} @ epoch {res.best_epoch}")
    if nepochs >= 50:
        assert corr > 0.8, "per-site Q10s should track the truth"

    # seed-ensemble over the SAME multisite model: K members in one
    # vmapped program (on TPU the members vmap the multisite kernel —
    # pop.engine_reason reports 'multisite kernel: ...')
    ens = eh.population_train(
        model, data, seeds=[0, 1, 2, 3],
        optimizer="adam", nepochs=nepochs, batchsize=S,
        eval_every=eval_every, split_data_at=0.8, seed=5,
    )
    print(f"ensemble engine: {ens.epoch_path} ({ens.engine_reason})")
    q10_members = np.asarray(
        eh.scale_param(ens.best_params["globals"]["Q10"], 1.0, 4.0)
    )  # (K, S, 1)
    spread = q10_members.std(axis=0).ravel()
    print(
        f"ensemble per-site Q10 spread: mean {spread.mean():.4f}, "
        f"max {spread.max():.4f} (seed-to-seed identifiability)"
    )
    return res, ens


if __name__ == "__main__":
    main()
