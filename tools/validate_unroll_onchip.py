"""On-chip validation + perf readout of the round-3 sub-batch unroll.

The generic fused epoch kernel now processes EASYHYBRID_FUSED_UNROLL
sequential SGD steps per grid step (ops/fused_epoch.py), amortizing the
~3 µs per-grid-step sequencing overhead that dominates tiny-MLP step time.
The loop introduces two new in-kernel patterns on this rig's Mosaic build:
static leading-dim indexing of (k_sub, ...) data blocks (the LSTM body's
validated timestep pattern) and carried param/moment VALUES flowing through
a static Python loop between ref read and write. Interpret-mode parity is
proven in tests/test_fused.py::test_fused_sub_batch_unroll_parity; this
script proves the REAL-chip compilation is exact (the runtime exactness
gate: implied-gradient phase A + production-config phase B) and measures
the marginal-rate win per unroll factor on the headline RbQ10 config.

RESULT (2026-08-17 on-chip): gate-exact at unroll 1/4/8 (gdiff 3.6e-4),
but perf-NEUTRAL — 250-300k marginal steps/s at every factor (bench.py
methodology, machine idle). Consecutive SGD steps are a true dependency
chain, so the ~3.3 µs/step floor is chain latency, not grid sequencing
overhead; contrast the multisite kernel's independent sub-chunks (1.6×
from the same trick). Default stays EASYHYBRID_FUSED_UNROLL=1.

Single-client tunnel: run alone, never concurrently with another chip
process.
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import (  # noqa: E402
    fused_exactness_check,
    init_fused_opt_state,
    make_fused_epoch,
)
from easyhybrid_tpu.training.train import fit_input_norm  # noqa: E402


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build_headline():
    """The BENCH rbq10 config: 20k rows, MLP [16,16], batch 512."""
    m = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    data = eh.prepare_data(m, df)
    tensors = jax.device_put(build_epoch_tensors(data, 512))
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(m, state, data)
    return m, params, state, tensors


def marginal_rate(model, params, state, tensors, ll, unroll, e_small=8,
                  e_big=64, reps=5):
    import jax.numpy as jnp

    copy_tree = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    nb = int(tensors.weight.shape[0])

    def timed(E):
        fn = make_fused_epoch(
            model, state, ("adam", 0.01), ll, shuffle=True,
            epochs_per_call=E, unroll=unroll,
        )
        p, o, s = copy_tree((params, init_fused_opt_state(params), state))
        p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(0))
        _ = float(loss)  # warm + force real completion (buffered dispatch)
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(1 + r))
            _ = float(loss)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_s, t_b = timed(e_small), timed(e_big)
    dd = t_b - t_s
    marg = (e_big - e_small) * nb / dd if dd > 0 else e_big * nb / t_b
    return marg, e_big * nb / t_b


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the real chip, got {jax.default_backend()}"
    )
    model, params, state, tensors = build_headline()
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))
    nb = int(tensors.weight.shape[0])
    print(f"headline rbq10: {nb} batches/epoch, backend={jax.default_backend()}")

    results = {}
    for k in (1, 4, 8):
        os.environ["EASYHYBRID_FUSED_UNROLL"] = str(k)
        t0 = time.time()
        ok, gd = fused_exactness_check(
            model, params, state, ("adam", 0.01), ll, tensors,
            epochs_per_call=64, shuffle=True,
        )
        gate_s = time.time() - t0
        print(f"unroll={k}: gate ok={ok} gdiff={gd:.3e} ({gate_s:.0f}s)",
              flush=True)
        if not ok:
            results[k] = ("GATE FAIL", gd)
            continue
        marg, sust = marginal_rate(model, params, state, tensors, ll, k)
        results[k] = (marg, sust)
        print(f"unroll={k}: marginal {marg:,.0f} steps/s, "
              f"sustained {sust:,.0f} steps/s", flush=True)

    print("\nsummary:")
    for k, v in results.items():
        print(f"  unroll={k}: {v}")


if __name__ == "__main__":
    main()
