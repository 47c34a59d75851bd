"""On-chip validation of the bf16 mixed-precision fused-kernel path.

``compute_dtype=bfloat16`` makes the kernel's dots contract bf16 operands
with f32 accumulation (forward) and run the backward's cast-VJP bf16
round-trips — mixed-dtype `lax.dot_general` inside a Pallas body is a NEW
Mosaic lowering pattern on this build, and this rig's Mosaic has a history
of silent pattern-localized miscompiles (see ops/fused_epoch.py docstring),
so interpret-mode parity is not enough. Runs the full two-phase runtime
exactness gate (gradient content + production variant) on the REAL chip
for adam and sgd+momentum, single-NN and MultiNN.

Single-client tunnel: run alone, never concurrently with another chip
process.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import fused_exactness_check  # noqa: E402
from easyhybrid_tpu.training.train import fit_input_norm  # noqa: E402


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build(compute_dtype, multi=False):
    kw = dict(
        forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
        compute_dtype=compute_dtype,
        global_param_names=["Q10"],
    )
    if multi:
        # MultiNN: per-parameter predictor sets (one MLP per neural param)
        kw["predictors"] = {"rb": ["sw_pot", "dsw_pot"], "Q10": ["sw_pot"]}
        kw["global_param_names"] = []
    else:
        kw["predictors"] = ["sw_pot", "dsw_pot"]
        kw["neural_param_names"] = ["rb"]
    m = eh.construct_hybrid_model(**kw)
    df = eh.gen_rbq10_data(4096, seed=42, nan_frac=0.2)
    data = eh.prepare_data(m, df)
    tensors = jax.device_put(build_epoch_tensors(data, 512))
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(m, state, data)
    return m, params, state, tensors


def main():
    print("backend:", jax.default_backend())
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))

    cases = [
        ("bf16/adam", False, ("adam", 0.01)),
        ("bf16/sgd+mom", False, ("sgd", 0.02, 0.9)),
        ("bf16/multinn", True, ("adam", 0.01)),
    ]
    results = []
    for label, multi, opt in cases:
        m, params, state, tensors = build(jnp.bfloat16, multi=multi)
        t0 = time.perf_counter()
        ok, d = fused_exactness_check(
            m, params, state, opt, ll, tensors,
            epochs_per_call=4, shuffle=True,
        )
        dt = time.perf_counter() - t0
        print(f"{label:14s} gate: ok={ok} rel={d:.2e} ({dt:.0f}s)", flush=True)
        results.append((label, ok, d))

    bad = [r for r in results if not r[1]]
    print("ALL PASS" if not bad else f"FAILURES: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
