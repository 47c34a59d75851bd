"""On-chip A/B: fused-vmap vs XLA-vmap population engines by regime.

Round-5 VERDICT item #6 (measured decision rule): ``jax.vmap`` of the
fused Pallas kernel lowers the member axis to an outer GRID dimension, so
K members run SEQUENTIALLY on one core — sweep wall ~ K x one-member
compute. The XLA engine's vmapped members instead batch into wider
matmuls, which a latency-bound tiny-MLP step absorbs almost for free —
sweep wall ~ one-member wall. Each engine therefore wins a different
regime on a single chip:

* overhead/eval-dominated walls (few epochs): fused wins (round-4 row:
  15.9x amplification, both walls ~14 s);
* compute-dominated walls (many epochs x members): XLA-vmap can win once
  K x (fused step time) exceeds the vmapped-XLA step time.

This script measures both engines at several (K, nepochs) points on the
real TPU and prints the crossover table that
``docs/tutorials/scaling_tpu.md`` quotes. Run on an idle rig (the TPU
tunnel is single-client).

Usage: python tools/validate_population_engines_onchip.py [K ...]
       (default K sweep: 4 16; nepochs fixed at 4096 — compute-dominated
        but affordable; EASYHYBRID_PALLAS=0 forces the XLA engine)
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def build():
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    return model, df


def timed_pop(model, df, K, nepochs, force_xla):
    import easyhybrid_tpu as eh

    kw = dict(
        optimizer="adam", nepochs=nepochs, batchsize=512,
        eval_every=max(1, nepochs // 8), seed=11, data_seed=0,
        shuffle_each_epoch=False,
    )
    lrs = list(np.geomspace(1e-3, 1e-2, K))
    env_before = os.environ.get("EASYHYBRID_PALLAS")
    if force_xla:
        os.environ["EASYHYBRID_PALLAS"] = "0"
    try:
        eh.population_train(model, df, hyper={"learning_rate": lrs}, **kw)
        t0 = time.perf_counter()
        pop = eh.population_train(
            model, df, hyper={"learning_rate": lrs}, **kw
        )
        wall = time.perf_counter() - t0
    finally:
        if force_xla:
            if env_before is None:
                os.environ.pop("EASYHYBRID_PALLAS", None)
            else:
                os.environ["EASYHYBRID_PALLAS"] = env_before
    return wall, pop.epoch_path


def main():
    ks = [int(a) for a in sys.argv[1:]] or [4, 16]
    nepochs = int(os.environ.get("POP_ENGINE_EPOCHS", "4096"))
    model, df = build()
    import jax

    print(f"backend: {jax.default_backend()} | nepochs={nepochs} "
          f"(31 batches/epoch)")
    rows = []
    for K in ks:
        w_fused, path_fused = timed_pop(model, df, K, nepochs, False)
        w_xla, path_xla = timed_pop(model, df, K, nepochs, True)
        winner = "fused" if w_fused < w_xla else "xla"
        rows.append((K, w_fused, path_fused, w_xla, path_xla, winner))
        print(f"K={K:3d}  fused {w_fused:7.2f}s ({path_fused})  "
              f"xla {w_xla:7.2f}s ({path_xla})  -> {winner}")
    print("\nmarkdown for docs/tutorials/scaling_tpu.md:")
    print("| K | fused-vmap wall | XLA-vmap wall | winner |")
    print("|---|---|---|---|")
    for K, wf, pf, wx, px, win in rows:
        print(f"| {K} | {wf:.1f} s (`{pf}`) | {wx:.1f} s (`{px}`) "
              f"| {win} |")


if __name__ == "__main__":
    main()
