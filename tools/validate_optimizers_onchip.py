"""On-chip validation of the late-round-3 optimizer widening.

Runs the runtime exactness gate (fused Pallas epoch vs the XLA/optax path)
on the REAL TPU for the two-slot-state optimizers added to the kernel:
adagrad (rsqrt + where of the shifted accumulator), lion (sign chain),
adamax (abs/max infinity moment + guarded divide), nadam (Nesterov
double-bias-correction exp/log scalar DAG). These lower new Mosaic
elementwise patterns inside the update step, and this rig's Mosaic build
has a history of silent pattern-localized miscompiles, so interpret-mode
parity is not enough. One multisite case proves the shared
``make_update_leaf`` path in the chunked kernel too.

Single-client tunnel: run alone, never concurrently with another chip
process.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.data.prepare import HybridData  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check  # noqa: E402
from easyhybrid_tpu.training.train import fit_input_norm  # noqa: E402


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build_single():
    m = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(4096, seed=42, nan_frac=0.2)
    data = eh.prepare_data(m, df)
    tensors = jax.device_put(build_epoch_tensors(data, 512))
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(m, state, data)
    return m, params, state, tensors


def build_multisite(S=512, N=32):
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish", scale_nn_outputs=True,
    )
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    rng = np.random.default_rng(0)
    data = HybridData(
        x=rng.random((S, N, 2)).astype(np.float32),
        forcing={"ta": (10 + 10 * rng.random((S, N))).astype(np.float32)},
        y={"reco": (2 + rng.random((S, N))).astype(np.float32)},
    )
    params, state = model.init(jax.random.PRNGKey(0))
    tensors = jax.device_put(build_epoch_tensors(data, S))
    return model, params, state, tensors


def main():
    # optional case filter: substrings of case labels (e.g. "noisy")
    filters = [a.lower() for a in sys.argv[1:]]
    print("backend:", jax.default_backend())
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))

    cases = [
        ("adagrad", ("adagrad", 0.02)),
        ("lion", ("lion", 0.003)),
        ("adamax", ("adamax", 0.01)),
        ("nadam", ("nadam", 0.01)),
        ("sgd+momentum", ("sgd", 0.02, 0.9)),
        ("sgd+nesterov", ("sgd", 0.02, 0.9, True)),
        # final-session widening: adadelta (two EMAs on (m, v); dual-sqrt
        # ratio chain) and amsgrad (third carried u buffer set + in-kernel
        # elementwise max accumulator) — plus a mixed 3-slot/2-slot branch
        # dict exercising the uniform update protocol
        ("adadelta", ("adadelta", 0.5)),
        ("amsgrad", ("amsgrad", 0.01)),
        ("radam", ("radam", 0.02)),
        ("branch-mix", {"nn": ("amsgrad", 0.01), "globals": ("adam", 0.02)}),
        # lamb: per-leaf trust ratio — in-update tile-norm dots + scalar
        # sqrt/compare chains are their own Mosaic surface
        ("lamb", ("lamb", 0.01)),
        ("lamb+wd", ("lamb", {"learning_rate": 0.01, "weight_decay": 0.02})),
        # round 5: noisy_sgd — the pre-generated optax noise stream rides
        # a per-leaf per-step operand tile; the gate's XLA reference is
        # UNFLATTENED optax.noisy_sgd (same jax.random.key(0) chain)
        ("noisy_sgd", ("noisy_sgd", 0.02)),
        ("noisy_sgd+h", ("noisy_sgd", 0.02, 0.05, 0.3)),
    ]
    if filters:
        cases = [c for c in cases if any(f in c[0].lower() for f in filters)]
    results = []
    m, params, state, tensors = build_single()
    for label, opt in cases:
        t0 = time.perf_counter()
        ok, d = fused_exactness_check(
            m, params, state, opt, ll, tensors,
            epochs_per_call=4, shuffle=True,
        )
        dt = time.perf_counter() - t0
        print(f"{label:14s} gate: ok={ok} rel={d:.2e} ({dt:.0f}s)", flush=True)
        results.append((label, ok, d))

    ms_cases = [("ms/lion", ("lion", 0.003)),
                ("ms/nadam", ("nadam", 0.01)),
                ("ms/adadelta", ("adadelta", 0.5))]
    if filters:
        ms_cases = [c for c in ms_cases
                    if any(f in c[0].lower() for f in filters)]
    if ms_cases:
        ms, ps, st, ts = build_multisite()
    for label, opt in ms_cases:
        t0 = time.perf_counter()
        ok, d = fused_exactness_check(
            ms, ps, st, opt, ll, ts, epochs_per_call=4, shuffle=True,
        )
        dt = time.perf_counter() - t0
        print(f"{label:14s} gate: ok={ok} rel={d:.2e} ({dt:.0f}s)", flush=True)
        results.append((label, ok, d))

    bad = [r for r in results if not r[1]]
    print("ALL PASS" if not bad else f"FAILURES: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
