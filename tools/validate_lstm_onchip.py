"""On-chip validation + perf A/B of the fused LSTM sequence kernel."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402
from easyhybrid_tpu.data.loaders import build_epoch_tensors  # noqa: E402
from easyhybrid_tpu.data.sequences import split_into_sequences  # noqa: E402
from easyhybrid_tpu.losses.specs import LoggingLoss  # noqa: E402
from easyhybrid_tpu.ops.fused_epoch import (  # noqa: E402
    fused_exactness_check,
    init_fused_opt_state,
    make_fused_epoch,
)
from easyhybrid_tpu.training.epoch import make_train_epoch  # noqa: E402
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
        hidden_layers={"lstm": 16}, scale_nn_outputs=True,
        input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(4000, seed=42)
    data = split_into_sequences(
        eh.prepare_data(m, df), input_window=10, output_window=1
    )
    tensors = jax.device_put(build_epoch_tensors(data, 512))
    params, state = jax.jit(m.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(m, state, data)
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))
    t0 = time.perf_counter()
    ok, d = fused_exactness_check(
        m, params, state, ("adam", 0.01), ll, tensors,
        epochs_per_call=4, shuffle=True,
    )
    print(f"LSTM gate: ok={ok} rel={d:.2e} ({time.perf_counter()-t0:.0f}s)")
    if not ok:
        return
    nb = int(tensors.weight.shape[0])
    copy = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    def timed(builder, o0_fn, E, reps=3):
        fn = builder(E)
        p, o, s = copy((params, o0_fn(), state))
        p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(0))
        _ = float(loss)
        ts = []
        for r in range(reps):
            t1 = time.perf_counter()
            p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(1 + r))
            _ = float(loss)
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts))

    def fb(E):
        return make_fused_epoch(
            m, state, ("adam", 0.01), ll, shuffle=True, epochs_per_call=E
        )

    opt = optax.flatten(optax.adam(0.01))

    def xb(E):
        return make_train_epoch(m, ll, opt, shuffle=True, epochs_per_call=E)

    for name, b, o0 in (
        ("fused", fb, lambda: init_fused_opt_state(params)),
        ("xla", xb, lambda: opt.init(params)),
    ):
        ts_, tb_ = timed(b, o0, 8), timed(b, o0, 128)
        marg = (128 - 8) * nb / (tb_ - ts_) if tb_ > ts_ else float("nan")
        print(
            f"{name}: t(8)={ts_*1e3:.1f}ms t(128)={tb_*1e3:.1f}ms "
            f"marginal={marg:.0f} steps/s sustained={128*nb/tb_:.0f}"
        )


if __name__ == "__main__":
    main()
