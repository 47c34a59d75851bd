"""On-chip validation of the multisite-kernel loss widening (round 3 late).

Runs the runtime exactness gate (multisite fused Pallas kernel vs the XLA
scan epoch, per-leaf implied-gradient comparison) on the REAL TPU for the
chunk-local losses added to the multisite envelope: nseLoss (mse math with
the precomputed target-only SST scale) and declarative ElementwiseLoss
(pinball/huber, forward-mode jvp of the pointwise penalty inside the
chunked kernel). The generic-kernel versions of these paths were validated
on-chip earlier (tools/validate_losses_onchip.py); the multisite kernel
lowers DIFFERENT Mosaic patterns (chunked (N_pad,128) tiles, masked
sublane row selects, unrolled sub-chunk loops), and this rig's Mosaic
build has a history of silent pattern-localized miscompiles, so each
kernel's paths must be proven separately.

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
from easyhybrid_tpu.ops.fused_multisite import (  # noqa: E402
    supports_fused_multisite,
)


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build(S, N, nan_frac=0.15):
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish", scale_nn_outputs=True,
    )
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    rng = np.random.default_rng(0)
    y = (2 + rng.random((S, N))).astype(np.float32)
    y[rng.random((S, N)) < nan_frac] = np.nan
    data = HybridData(
        x=rng.random((S, N, 2)).astype(np.float32),
        forcing={"ta": (10 + 10 * rng.random((S, N))).astype(np.float32)},
        y={"reco": y},
    )
    params, state = model.init(jax.random.PRNGKey(0))
    tensors = jax.device_put(build_epoch_tensors(data, S))
    return model, params, state, tensors


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print("backend:", jax.default_backend(), "| S =", S, "N =", N)
    model, params, state, tensors = build(S, N)

    specs = [
        ("nseLoss", "nseLoss"),
        ("pinball(0.9)", eh.pinball(0.9)),
        ("pinball(0.3)", eh.pinball(0.3)),
        ("huber(1.0)", eh.huber(1.0)),
        ("huber(0.5,sum)", eh.huber(0.5, normalize="sum")),
    ]
    results = []
    for label, spec in specs:
        ll = LoggingLoss(training_loss=spec, loss_types=("mse",))
        assert supports_fused_multisite(model, ("adam", 0.01), ll, tensors)
        t0 = time.perf_counter()
        ok, d = fused_exactness_check(
            model, params, state, ("adam", 0.01), ll, tensors,
            epochs_per_call=4, shuffle=True,
        )
        dt = time.perf_counter() - t0
        print(f"{label:16s} gate: ok={ok} rel={d:.2e} ({dt:.0f}s)", flush=True)
        results.append((label, ok, d))

    bad = [r for r in results if not r[1]]
    print("ALL PASS" if not bad else f"FAILURES: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
