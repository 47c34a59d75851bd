"""Attainable-ceiling probe for the b1024 MFU flagship (round-5 VERDICT
item #2): is ~30% MFU the wall, or is there headroom?

Measurements on the real TPU, same tower as ``bench.py``'s
``large_mlp_b1024`` row ([2→1024→512→256→128→64→1] at batch 1024):

1. **Bare matmul-chain ceiling** — fwd chain + explicit transposed
   backward, dot_generals only (no activations, no loss, no framework):
   the hard upper bound XLA reaches for this shape sequence. If this
   lands near 35-45% rather than 80%, the tower ITSELF cannot reach the
   round-3 40% target — the trailing small layers (128×64, 64×1) and the
   B=1024 grain leave MXU pipelines underfed regardless of scheduling.
2. **Bare training step** — the same chain with swish activations, mse
   loss, and an SGD apply, still framework-free: adds the unavoidable
   elementwise/VPU traffic of a real optimizer step.
3. **Fused-kernel w=512 attempt** (pass ``w512``) — the round-4 auto-pick
   runs width-256 chunks (~33% MFU); w=512 crashed the Mosaic AOT helper
   at a 43 MB scoped-vmem estimate. Retry behind a raised
   EASYHYBRID_FUSED_MAX_VMEM_MB; a compile crash is caught and reported.

Timing discipline (docs/tpu_notes.md): K steps run INSIDE one jitted
program (lax.fori_loop), rates are read-forced MARGINALS between two
program sizes — per-call dispatch on this tunnel costs ~32 ms and would
swamp the measurement.

Single-client tunnel: run alone.

Usage: python tools/probe_b1024_ceiling.py [w512]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

DIMS = [2, 1024, 512, 256, 128, 64, 1]
B = 1024
PEAK = 197e12  # v5e bf16 peak FLOP/s


def flops_per_step() -> float:
    # fwd 2BIO + bwd 4BIO per dense pass
    return float(sum(6.0 * B * i * o for i, o in zip(DIMS[:-1], DIMS[1:])))


def _params(seed0=0):
    ws = [
        jnp.asarray(
            np.random.default_rng(seed0 + i).standard_normal((i_d, o_d)),
            jnp.float32,
        ) * 0.02
        for i, (i_d, o_d) in enumerate(zip(DIMS[:-1], DIMS[1:]))
    ]
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, DIMS[0])), jnp.float32
    )
    y = jnp.asarray(
        np.random.default_rng(10).standard_normal((B, 1)), jnp.float32
    )
    return ws, x, y


def _marginal_rate(make_prog, k_small=512, k_big=4096, reps=5):
    """READ-FORCED marginal steps/s between two in-program step counts.
    On this tunnel ``block_until_ready`` does NOT force execution — only a
    readback drains the queue (docs/tpu_notes.md §2), so the timer brackets
    a float() of the program's scalar output."""
    progs = {k: make_prog(k) for k in (k_small, k_big)}

    def run(k):
        return float(progs[k]())

    run(k_small)  # compile both
    run(k_big)
    ts = {k: [] for k in progs}
    for _ in range(reps):
        for k in progs:
            t0 = time.perf_counter()
            run(k)
            ts[k].append(time.perf_counter() - t0)
    d = np.median(ts[k_big]) - np.median(ts[k_small])
    return (k_big - k_small) / d if d > 0 else float("nan")


def bare_matmul_chain():
    ws, x, _ = _params()

    def one_step(ws_):
        hs = [x]
        h = x
        for w in ws_:
            h = h @ w
            hs.append(h)
        d = h
        gws = []
        for w, hin in zip(reversed(ws_), reversed(hs[:-1])):
            gws.append(hin.T @ d)   # wgrad
            d = d @ w.T             # dgrad
        # fold grads back so the loop carries a real dependency (no DCE)
        return [w - 1e-12 * g for w, g in zip(ws_, reversed(gws))]

    def make_prog(k):
        @jax.jit
        def prog():
            out = jax.lax.fori_loop(
                0, k, lambda _, c: one_step(c), ws
            )
            return out[0].sum()

        return prog

    return _marginal_rate(make_prog)


def bare_train_step():
    ws, x, y = _params()
    bs = [jnp.zeros((o,), jnp.float32) for o in DIMS[1:]]

    def loss(params):
        ws_, bs_ = params
        h = x
        for k, (w, b) in enumerate(zip(ws_, bs_)):
            h = h @ w + b
            if k < len(ws_) - 1:
                h = h * jax.nn.sigmoid(h)  # swish
        return jnp.mean((h - y) ** 2)

    def one_step(params):
        g = jax.grad(loss)(params)
        return jax.tree.map(lambda p, gg: p - 1e-4 * gg, params, g)

    def make_prog(k):
        @jax.jit
        def prog():
            out = jax.lax.fori_loop(
                0, k, lambda _, c: one_step(c), (ws, bs)
            )
            return out[0][0].sum()

        return prog

    return _marginal_rate(make_prog)


def bare_adam_step(flatten: bool):
    """The swish train step with optax.adam — optionally wrapped in
    optax.flatten (the framework's elementwise fast path): at 1.2M params
    flatten ravels + concatenates + splits the whole tree EVERY step,
    which is pure HBM traffic the update math doesn't need."""
    import optax

    ws, x, y = _params()
    bs = [jnp.zeros((o,), jnp.float32) for o in DIMS[1:]]
    opt = optax.adam(1e-4)
    if flatten:
        opt = optax.flatten(opt)

    def loss(params):
        ws_, bs_ = params
        h = x
        for k, (w, b) in enumerate(zip(ws_, bs_)):
            h = h @ w + b
            if k < len(ws_) - 1:
                h = h * jax.nn.sigmoid(h)
        return jnp.mean((h - y) ** 2)

    def one_step(carry):
        params, ost = carry
        g = jax.grad(loss)(params)
        upd, ost = opt.update(g, ost, params)
        return optax.apply_updates(params, upd), ost

    ost0 = opt.init((ws, bs))

    def make_prog(k):
        @jax.jit
        def prog():
            out = jax.lax.fori_loop(
                0, k, lambda _, c: one_step(c), ((ws, bs), ost0)
            )
            return out[0][0][0].sum()

        return prog

    return _marginal_rate(make_prog)


def fused_w512():
    """Retry the width-512 chunked fused kernel behind a raised VMEM cap.
    Returns marginal steps/s or an error string."""
    import os

    os.environ["EASYHYBRID_FUSED_CHUNKED"] = "1"
    os.environ["EASYHYBRID_FUSED_MAX_VMEM_MB"] = "45"
    import easyhybrid_tpu as eh
    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.losses.specs import LoggingLoss
    from easyhybrid_tpu.ops.fused_epoch import (
        _pick_batch_chunks,
        init_fused_opt_state,
        make_fused_epoch,
    )
    from easyhybrid_tpu.training.train import fit_input_norm

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=DIMS[1:-1], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(16 * 1024, seed=42)
    data = eh.prepare_data(model, df)
    tensors = jax.device_put(build_epoch_tensors(data, B))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    ll = LoggingLoss(training_loss="mse", loss_types=("mse",))
    c = _pick_batch_chunks(model, [model.nn], tensors, ll)
    print(f"w512 probe: _pick_batch_chunks -> {c} "
          f"(chunk width {B // c if c else '—'})", flush=True)
    try:
        fused = make_fused_epoch(
            model, state, ("adam", 0.01), ll, shuffle=False,
            epochs_per_call=8,
        )
        t0 = time.perf_counter()
        p, o, s, loss = fused(
            jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
            state, tensors, jax.random.PRNGKey(1),
        )
        _ = float(loss)
        print(f"w512 compile+first-run: {time.perf_counter()-t0:.0f}s "
              f"loss={float(loss):.5f}", flush=True)
        nb = int(tensors.weight.shape[0])
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            p, o, s, loss = fused(p, o, s, tensors, jax.random.PRNGKey(2 + r))
            _ = float(loss)
            ts.append(time.perf_counter() - t0)
        return 8 * nb / float(np.median(ts))
    except Exception as e:  # Mosaic compile crashes land here
        return f"{type(e).__name__}: {str(e)[:300]}"


def main():
    fps = flops_per_step()
    print(f"backend: {jax.default_backend()} | tower {DIMS} x B={B} | "
          f"{fps/1e6:.2f} MFLOP/step | v5e bf16 peak {PEAK/1e12:.0f} TF/s",
          flush=True)

    r1 = bare_matmul_chain()
    print(f"bare matmul chain : {r1:10.1f} steps/s  "
          f"{r1*fps/1e12:6.2f} TF/s  {100*r1*fps/PEAK:5.2f}% MFU",
          flush=True)
    r2 = bare_train_step()
    print(f"bare train step   : {r2:10.1f} steps/s  "
          f"{r2*fps/1e12:6.2f} TF/s  {100*r2*fps/PEAK:5.2f}% MFU",
          flush=True)
    r3 = bare_adam_step(flatten=False)
    print(f"bare adam step    : {r3:10.1f} steps/s  "
          f"{r3*fps/1e12:6.2f} TF/s  {100*r3*fps/PEAK:5.2f}% MFU",
          flush=True)
    r4 = bare_adam_step(flatten=True)
    print(f"bare adam+flatten : {r4:10.1f} steps/s  "
          f"{r4*fps/1e12:6.2f} TF/s  {100*r4*fps/PEAK:5.2f}% MFU",
          flush=True)
    print("(bench.py large_mlp_b1024 fused w=256 reference: ~13-15k "
          "steps/s, 29-33% MFU)")

    if "w512" in sys.argv[1:]:
        r3 = fused_w512()
        if isinstance(r3, float):
            print(f"fused w=512       : {r3:10.1f} steps/s  "
                  f"{r3*fps/1e12:6.2f} TF/s  {100*r3*fps/PEAK:5.2f}% MFU")
        else:
            print(f"fused w=512 FAILED: {r3}")


if __name__ == "__main__":
    main()
