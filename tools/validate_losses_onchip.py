"""On-chip validation of the round-3 fused-kernel loss widening.

Runs the runtime exactness gate (fused Pallas epoch vs the XLA scan epoch,
per-leaf implied-gradient comparison) on the REAL TPU for the loss specs
added late in round 3: nseLoss (hand-written per-batch SSE/SST cotangent)
and declarative ElementwiseLoss (pinball/huber, forward-mode jvp of the
user's pointwise penalty in-kernel). These exercise new Mosaic code
patterns — sign/max/select chains from the pinball jvp and an extra
reduction pair for the NSE denominator — and this rig's Mosaic build has a
history of SILENT miscompiles localized to specific patterns (see
ops/fused_epoch.py docstring), so interpret-mode parity is not enough.

Single-client tunnel: run alone, never concurrently with another chip
process.
"""

import sys
import time

import jax

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check  # noqa: E402
from easyhybrid_tpu.training.train import fit_input_norm  # noqa: E402


def main():
    print("backend:", jax.default_backend())

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    m = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
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

    specs = [
        ("nseLoss", "nseLoss"),
        ("pinball(0.9)", eh.pinball(0.9)),
        ("pinball(0.3)", eh.pinball(0.3)),
        ("huber(1.0)", eh.huber(1.0)),
        ("huber(0.5,sum)", eh.huber(0.5, normalize="sum")),
        # batch-statistic losses (centered sufficient statistics + scalar
        # jvp partials — new scalar-DAG Mosaic patterns)
        ("pearsonLoss", "pearsonLoss"),
        ("kgeLoss", "kgeLoss"),
        ("pbkgeLoss", "pbkgeLoss"),
    ]
    results = []
    for label, spec in specs:
        ll = LoggingLoss(training_loss=spec, loss_types=("mse",))
        t0 = time.perf_counter()
        ok, d = fused_exactness_check(
            m, params, state, ("adam", 0.01), ll, tensors,
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
