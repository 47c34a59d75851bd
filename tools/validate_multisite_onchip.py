"""On-chip validation + perf A/B of the multisite fused kernel.

Runs on the real TPU: exactness gate (production config) at a moderate site
count, then read-forced marginal perf fused-vs-XLA at the bench scale.

Usage: python tools/validate_multisite_onchip.py [S] [N] [E_small] [E_big]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.data.prepare import HybridData  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import (  # noqa: E402
    fused_exactness_check,
    init_fused_opt_state,
)
from easyhybrid_tpu.ops.fused_multisite import (  # noqa: E402
    make_fused_multisite_epoch,
    supports_fused_multisite,
)


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def build(S, N):
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
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    e_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    e_big = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    print("backend:", jax.default_backend(), "| S =", S, "N =", N)
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    model, params, state, tensors = build(S, N)
    assert supports_fused_multisite(model, ("adam", 0.01), logging, tensors)

    t0 = time.perf_counter()
    ok, diff = fused_exactness_check(
        model, params, state, ("adam", 0.01), logging, tensors,
        epochs_per_call=4, shuffle=True,
    )
    print(f"gate: ok={ok} worst_rel={diff:.3e}  ({time.perf_counter()-t0:.1f}s)")
    if not ok:
        print("GATE FAILED — kernel must not be enabled on this chip")
        return

    # read-forced marginal perf, fused vs XLA
    import optax

    from easyhybrid_tpu.training.epoch import make_train_epoch

    def timed(builder, E, reps=3):
        fn = builder(E)
        if builder is fused_builder:
            o0 = init_fused_opt_state(params)
        else:
            o0 = opt_flat.init(params)
        copy = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        p, o, s = copy((params, o0, state))
        p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(0))
        _ = float(loss)
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(1 + r))
            _ = float(loss)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    opt_flat = optax.flatten(optax.adam(0.01))

    def fused_builder(E):
        return make_fused_multisite_epoch(
            model, state, ("adam", 0.01), logging, shuffle=True,
            epochs_per_call=E,
        )

    def xla_builder(E):
        return make_train_epoch(
            model, logging, opt_flat, shuffle=True, epochs_per_call=E,
        )

    for name, b in (("fused", fused_builder), ("xla", xla_builder)):
        ts = timed(b, e_small)
        tb = timed(b, e_big)
        d = tb - ts
        marginal = (e_big - e_small) / d if d > 0 else float("nan")
        sustained = e_big / tb
        print(
            f"{name}: t({e_small})={ts*1e3:.1f}ms t({e_big})={tb*1e3:.1f}ms "
            f"marginal={marginal:.1f} steps/s sustained={sustained:.1f} "
            f"steps/s ({marginal*S:.0f} site-steps/s marginal)"
        )


if __name__ == "__main__":
    main()
