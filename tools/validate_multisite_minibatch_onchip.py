"""On-chip validation + perf A/B of MINIBATCHED multisite fused epochs.

Round-4 envelope widening: several site batches per epoch run the fused
kernel with per-batch deferred whole-tile updates (out-of-batch packed rows
get optax's zero-grad moment decay). This script runs on the real TPU:

1. the production exactness gate (``fused_exactness_check``) on the
   minibatched config (it slices to 2 batches — the packed tiles still
   cover every site, update-only rows beyond the sliced data);
2. a direct few-epoch parity run fused-vs-XLA on the FULL batched data
   (worst per-leaf relative divergence);
3. read-forced marginal perf fused vs XLA at the requested scale.

Usage: python tools/validate_multisite_minibatch_onchip.py \
           [S] [N] [batch] [E_small] [E_big] [loss] [shuffle]

``loss`` defaults to mse; pass ``rmse`` to drive the late-round-4
batch-scoped deferred-factor path (per-batch SSE reset + factor at each
batch's last group). ``shuffle`` in {off (default), on, batches} — "on"
drives the round-5 per-epoch slot-map permutation path (one launch per
epoch, packed tiles gathered/scattered around it); a non-128-multiple
``batch`` additionally exercises the round-5 per-batch padding relayout.
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


def build(S, N, batch):
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish", scale_nn_outputs=True,
    )
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    # shared fixture builder (identity _site_idx — the layout the fused
    # kernel's chunk<->packed-row check requires)
    from easyhybrid_tpu.data.synthetic import gen_multisite_arrays

    data = gen_multisite_arrays(S, N, seed=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tensors = jax.device_put(build_epoch_tensors(data, batch))
    return model, params, state, tensors


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    e_small = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    e_big = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    loss_name = sys.argv[6] if len(sys.argv) > 6 else "mse"
    shuffle_arg = sys.argv[7] if len(sys.argv) > 7 else "off"
    shuffle = {"off": False, "on": True, "batches": "batches"}.get(shuffle_arg)
    if shuffle is None:
        sys.exit(f"shuffle {shuffle_arg!r} must be off/on/batches")
    from easyhybrid_tpu.ops.fused_multisite import _MS_LOSSES, _ms_loss_kind

    if _ms_loss_kind(loss_name) is None:
        # fail at the usage message, not deep inside kernel construction
        sys.exit(
            f"loss {loss_name!r} is outside the multisite fused envelope "
            f"(supported: {', '.join(_MS_LOSSES)}). Usage: python "
            "tools/validate_multisite_minibatch_onchip.py "
            "[S] [N] [batch] [E_small] [E_big] [loss] [shuffle off|on|batches]"
        )
    logging = LoggingLoss(training_loss=loss_name, loss_types=(loss_name,))
    model, params, state, tensors = build(S, N, batch)
    nb = int(tensors.weight.shape[0])
    print(
        "backend:", jax.default_backend(),
        f"| S={S} N={N} batch={batch} nb={nb} shuffle={shuffle!r}",
    )
    assert nb > 1, "pick batch < S to exercise the minibatched path"
    assert supports_fused_multisite(
        model, ("adam", 0.01), logging, tensors, shuffle=shuffle
    )

    t0 = time.perf_counter()
    ok, diff = fused_exactness_check(
        model, params, state, ("adam", 0.01), logging, tensors,
        epochs_per_call=4, shuffle=shuffle,
    )
    print(f"gate: ok={ok} worst_rel={diff:.3e}  ({time.perf_counter()-t0:.1f}s)")
    if not ok:
        print("GATE FAILED — kernel must not be enabled on this chip")
        return

    import optax

    from easyhybrid_tpu.training.epoch import make_train_epoch

    opt_flat = optax.flatten(optax.adam(0.01))

    def fused_builder(E):
        return make_fused_multisite_epoch(
            model, state, ("adam", 0.01), logging, shuffle=shuffle,
            epochs_per_call=E,
        )

    def xla_builder(E):
        return make_train_epoch(
            model, logging, opt_flat, shuffle=shuffle, epochs_per_call=E,
        )

    # ---- direct full-data parity (3 epochs on the real chip) -------------
    E_par = 3
    fused = fused_builder(E_par)
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    xla = xla_builder(E_par)
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), opt_flat.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    worst = 0.0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b) / np.maximum(np.max(np.abs(b)), 1e-6))
        worst = max(worst, float(rel))
    print(
        f"full-data parity ({E_par} epochs, {nb} batches/epoch): "
        f"loss fused={float(loss_f):.6f} xla={float(loss_x):.6f} "
        f"worst param rel={worst:.3e} t_fused={int(o_f['t'][0])} "
        f"(expect {E_par*nb})"
    )

    # ---- read-forced marginal perf ---------------------------------------
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

    for name, b in (("fused", fused_builder), ("xla", xla_builder)):
        ts = timed(b, e_small)
        tb = timed(b, e_big)
        d = tb - ts
        marginal = (e_big - e_small) / d if d > 0 else float("nan")
        sustained = e_big / tb
        print(
            f"{name}: t({e_small})={ts*1e3:.1f}ms t({e_big})={tb*1e3:.1f}ms "
            f"marginal={marginal:.1f} epochs/s sustained={sustained:.1f} "
            f"epochs/s ({marginal*nb:.0f} steps/s marginal)"
        )


if __name__ == "__main__":
    main()
