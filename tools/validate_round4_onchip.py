"""On-chip validation of the round-4 kernel extensions (1x TPU).

Reruns, as one reproducible script, the gate evidence quoted in PARITY.md
and BASELINE.md for the round-4 work:

1. traced-hyper fused kernel (population sweeps): vmapped member parity
   against static kernels + XLA, via the production population gates;
2. fused LSTM checkpointed-recompute BPTT at T = 10 / 20 / 32
   (the old save-all-gates body cliffed Mosaic compile at T=6);
3. batch-chunked fused kernel at the [1024,512,256,128,64] x b1024 shape
   (opt-in; gate-exact but measured slower than XLA — prints both rates);
4. multisite deferred-rmse at 10k sites.

Run on the chip:  python tools/validate_round4_onchip.py
Each section prints PASS/FAIL + the gate diff; exits nonzero on any FAIL.
First run compiles (minutes); verdicts are disk-cached after.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402
import numpy as np  # noqa: E402

failures = []


def section(name):
    print(f"\n=== {name} ===", flush=True)


def report(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        failures.append(name)


def rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def quickstart_model(hidden=(16, 16), **kw):
    import easyhybrid_tpu as eh

    return eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=list(hidden) if not isinstance(hidden, dict) else hidden,
        activation="swish", scale_nn_outputs=True,
        input_batchnorm="static", **kw,
    )


def main() -> int:
    import easyhybrid_tpu as eh
    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.data.split import split_data
    from easyhybrid_tpu.losses.specs import LoggingLoss
    from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check
    from easyhybrid_tpu.training.train import fit_input_norm

    print("backend:", jax.default_backend())

    # ---- 1. traced-hyper fused sweep ---------------------------------
    section("traced-hyper fused sweep (16-member lr sweep)")
    df = eh.gen_rbq10_data(2000, seed=42)
    model = quickstart_model()
    pop = eh.population_train(
        model, df,
        hyper={"learning_rate": list(np.geomspace(1e-3, 5e-2, 16))},
        optimizer="adam", nepochs=20, batchsize=512, eval_every=10,
        seed=11, data_seed=0,
    )
    report(
        "sweep engine", pop.epoch_path == "population_vmap_fused",
        f"epoch_path={pop.epoch_path} reason={pop.engine_reason!r}",
    )
    report("sweep finite", bool(np.isfinite(pop.best_losses).all()))

    # ---- 2. fused LSTM at T=10/20/32 ----------------------------------
    section("fused LSTM checkpointed-recompute BPTT")
    lstm_model = quickstart_model(hidden={"lstm": 16})
    for T in (10, 20, 32):
        dfl = eh.gen_rbq10_data(4000 + 100 * T, seed=42)
        seq = dict(input_window=T, output_window=1, output_shift=1,
                   lead_time=1)
        tr, _ = split_data(dfl, lstm_model, split_data_at=0.8,
                           sequence_kwargs=seq)
        tens = jax.device_put(build_epoch_tensors(tr, 256))
        ll = LoggingLoss(training_loss="mse", loss_types=("mse",))
        params, state = lstm_model.init(jax.random.PRNGKey(0))
        state = fit_input_norm(lstm_model, state, tr)
        t0 = time.perf_counter()
        ok, diff = fused_exactness_check(
            lstm_model, params, state, ("adam", 0.01), ll, tens,
            epochs_per_call=4, shuffle=True,
        )
        report(f"lstm T={T} gate", ok,
               f"diff={diff:.2e} wall={time.perf_counter()-t0:.1f}s")

    # ---- 3. batch-chunked kernel at b1024 ------------------------------
    section("batch-chunked kernel (opt-in) at [1024..64] x b1024")
    os.environ["EASYHYBRID_FUSED_MAX_VMEM_MB"] = "31"
    os.environ["EASYHYBRID_FUSED_CHUNKED"] = "1"
    big = quickstart_model(hidden=(1024, 512, 256, 128, 64))
    dfb = eh.gen_rbq10_data(16 * 1024, seed=42)
    trb, _ = split_data(dfb, big, split_data_at=0.8)
    tensb = jax.device_put(build_epoch_tensors(trb, 1024))
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))
    params, state = big.init(jax.random.PRNGKey(0))
    state = fit_input_norm(big, state, trb)
    ok, diff = fused_exactness_check(
        big, params, state, ("adam", 0.01), ll, tensb,
        epochs_per_call=4, shuffle=True,
    )
    report("chunked b1024 gate", ok, f"diff={diff:.2e}")
    del os.environ["EASYHYBRID_FUSED_MAX_VMEM_MB"]
    del os.environ["EASYHYBRID_FUSED_CHUNKED"]

    # ---- 4. multisite deferred-rmse at 10k sites -----------------------
    section("multisite deferred-rmse (10k sites)")
    from easyhybrid_tpu.data.prepare import HybridData

    base = quickstart_model()
    S, N = 10_000, 64
    ms = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    rng = np.random.default_rng(0)
    y = (2 + rng.random((S, N))).astype(np.float32)
    y[rng.random((S, N)) < 0.1] = np.nan
    data = HybridData(
        x=rng.random((S, N, 2)).astype(np.float32),
        forcing={"ta": (10 + 10 * rng.random((S, N))).astype(np.float32)},
        y={"reco": y},
    )
    params, state = ms.init(jax.random.PRNGKey(3))
    tens = jax.device_put(build_epoch_tensors(data, S))
    ll = LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    ok, diff = fused_exactness_check(
        ms, params, state, ("adam", 0.01), ll, tens,
        epochs_per_call=4, shuffle=False,
    )
    report("multisite rmse gate", ok, f"diff={diff:.2e}")

    print(
        "\nALL PASS" if not failures else f"\nFAILURES: {failures}",
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
