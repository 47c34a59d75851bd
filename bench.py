"""Benchmark scoreboard: every BASELINE.json config, pinned methodology.

Headline (printed as the single JSON line's ``value``): RbQ10 hybrid
grad-steps/sec — 20k synthetic rows, MLP [16,16] swish, batch 512, Adam;
one grad step = fused forward (NN + sigmoid bound scaling + Q10 mechanistic
model) + backward + optimizer update (BASELINE.md / reference README
quick-start). The ``configs`` field carries the full scoreboard:

* ``rbq10``        — single-series headline config (torch-CPU baseline;
                     round 3: TRAINABLE input BatchNorm, matching both
                     the reference quick-start and the torch baseline's
                     train-mode BatchNorm1d — the fused kernel now
                     carries the EMA stats in-kernel)
* ``multi_target`` — 2-target hybrid, per-target masked MSE, 10% NaNs
                     (torch-CPU baseline)
* ``large_mlp``    — reference GPU-tutorial config [1024,512,256,128,64],
                     batch 64, 5k rows (torch-CPU baseline)
* ``large_mlp_bf16`` — the same config with ``compute_dtype=bfloat16``
                     (MXU-native mixed precision; vs the same f32 CPU pin;
                     honestly perf-NEUTRAL — see its docstring)
* ``large_mlp_b1024`` — the MFU flagship: same tower at batch 1024 /
                     16k rows, the throughput-bound shape (~33 % MFU via
                     the FUSED kernel's width-256 batch chunks, round-4
                     late — beats the XLA epoch's 26-31 %; no CPU row)
* ``large_mlp_b1024_bf16`` — the same shape with explicit bf16 operands
                     (XLA by measurement: bf16 chunks lose to the casts;
                     ~29-30 % MFU; no CPU row)
* ``multisite``    — 10k vmapped sites × 64 obs, shared NN + per-site Q10
                     (no reference counterpart; framework-only)
* ``multisite_minibatch`` — 10,240 sites in 2,560-site batches (nb=4,
                     shuffle ON — the reference's default loader
                     semantics, fused round 5); per-BATCH steps/s
                     (no CPU row)
* ``lstm``         — sequence config: 4k rows, 10-step windows, LSTM(16)
                     (reference Q10_lstm.jl analog; torch-CPU baseline;
                     round 4: fused Pallas — recompute BPTT lifted the cap)
* ``population_sweep`` — 16-member lr sweep as ONE vmapped fused-kernel
                     program (round 4; value = sweep throughput
                     amplification vs 16 sequential one-member runs)
* ``inference``    — serving throughput (ROWS/s): the compiled fixed-shape
                     predictor on 131k rows incl. device→host fetch, vs
                     the same forward in torch CPU

Methodology (pinned): torch baselines run on ONE CPU thread
(``torch.set_num_threads(1)`` — the reference's Julia loop is
single-threaded); each side reports the MEDIAN of ``REPEATS`` timed blocks;
absolute ms/step is emitted for both sides so the ratio can be re-derived.
The framework path is timed READ-FORCED (every timed call ends with a
``float(loss)`` fetch — on this deployment ``block_until_ready`` does not
guarantee execution, docs/tpu_notes.md); the headline is the MARGINAL rate
between a small and a large epochs-per-program run, i.e. the per-grad-step
chip cost with per-program tunnel overhead differenced out (the CPU
baseline also pays no per-call overhead), and the sustained through-tunnel
rate + per-program overhead are reported alongside. Compile/warmup excluded
on both sides.

Chip anchoring (round-3): each config also reports an analytic
``gflops_per_step`` (dense-layer MACs × 2 for the forward, ×3 for
fwd+dgrad+wgrad — elementwise physics excluded), the achieved
``tflops`` at the marginal rate, and ``mfu_pct`` against the v5e bf16 MXU
peak (197 TFLOP/s; the kernels compute in float32 so this is a
conservative upper bound — f32 MXU throughput is lower). The CPU baselines
are PINNED (``_PINNED_BASELINES``, measured 2026-08-17, BENCH_r02): the
ratio uses the pinned value; the live re-measurement is reported as
``baseline_drift`` and only warns when it moves ±30%. The marginal rate
carries an error bar: ``steps_per_s_spread`` is [min, max] over per-rep
pairings of the small/large block timings.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "configs": {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

REPEATS = 3

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _median_rate(run_block, steps_per_block: int, repeats: int = REPEATS):
    """Median steps/sec over ``repeats`` timed blocks (block pre-warmed)."""
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_block()
        dt = time.perf_counter() - t0
        rates.append(steps_per_block / dt)
    return statistics.median(rates)


# --------------------------------------------------------------------------
# framework side
# --------------------------------------------------------------------------

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak; kernels run f32 → conservative
V5E_HBM_BW = 819e9  # bytes/s, v5e HBM bandwidth


V5E_MXU_MACS = V5E_PEAK_FLOPS / 2.0  # MAC slots/s at full 128-lane tiles
# VPU f32 FMA peak, assumed (8,128) lanes × 4 ALUs × 940 MHz: tiny
# contractions (K,N ≤ ~32) are CHEAPER as full-lane broadcast-FMAs on the
# VPU than as 128-padded MXU passes, and Mosaic lowers them there
V5E_VPU_MACS = 8 * 128 * 4 * 940e6


def _attainable_bounds(
    passes, flops_per_step: float, bytes_per_step: float,
):
    """Shape-specific ATTAINABLE roofline for one training config (round-5
    VERDICT item #2): the 197 TFLOP/s MXU peak assumes every contraction
    fills all 128 lanes × 128 columns, which small-feature hybrid models
    structurally cannot. Model: each dense pass ``(B, K, N)`` (B = streamed
    rows, K = contraction, N = output columns) costs the CHEAPER of
    - MXU: ``pad(B,8)·pad(K,128)·pad(N,128)`` MAC slots at 98.5e12 slots/s
      (TPU (8,128) tiling; f32 contractions run as bf16 MXU passes at
      default precision, so the bf16 peak is the right capacity), or
    - VPU: ``B·K·N`` full-lane broadcast-FMAs at ~3.85e12 MACs/s
    — the compiler's choice, assumed perfect. The per-step compute time is
    the sum over passes (no MXU/VPU overlap assumed within a pass chain),
    jointly bounded by HBM bytes/step against the 819 GB/s v5e bandwidth:
    ``t = max(Σ t_pass, t_hbm)``. The bound EXCLUDES elementwise work
    (activations, physics, optimizer), layout changes, and loop overheads —
    i.e. it is optimistic, a true upper bound on steps/s.

    Validated against round-4 measurements: the multisite kernel ([16,16]
    features, 640k streamed samples) measures 4.77 TFLOP/s — 62% of its
    7.7 TFLOP/s VPU-bound attainable — while its "MFU" reads 2.4%; the gap
    between those two numbers is exactly what this field exists to explain.
    """
    def pad(v, m):
        return -(-int(v) // m) * m

    t_compute = 0.0
    mxu_macs = 0
    for b, k, n in passes:
        t_mxu = pad(b, 8) * pad(k, 128) * pad(n, 128) / V5E_MXU_MACS
        t_vpu = b * k * n / V5E_VPU_MACS
        t_compute += min(t_mxu, t_vpu)
        if t_mxu <= t_vpu:
            mxu_macs += b * k * n
    t_hbm = bytes_per_step / V5E_HBM_BW
    t = max(t_compute, t_hbm)
    steps = 1.0 / t
    return {
        "attainable_tflops": round(flops_per_step * steps / 1e12, 3),
        "attainable_steps_per_s": round(steps, 1),
        "attainable_bound": "compute" if t_compute >= t_hbm else "hbm",
        "attainable_mxu_flop_share_pct": round(
            100.0 * 2.0 * mxu_macs / flops_per_step, 1
        ),
        "hbm_bytes_per_step": int(bytes_per_step),
    }


def _mlp_passes(hidden, n_features: int, batch: int, n_out: int = 1):
    """The dense passes of one MLP grad step, in ``_attainable_bounds``
    (B, K, N) form: fwd [B,K]@[K,N], dgrad [B,N]@[N,K], wgrad [K,B]@[B,N]
    (streamed rows, contraction, output columns)."""
    dims = [n_features, *hidden, n_out]
    passes = []
    for k, n in zip(dims[:-1], dims[1:]):
        passes += [(batch, k, n), (batch, n, k), (k, batch, n)]
    return passes

_PINNED_BASELINES = {
    # torch-CPU 1-thread steps/s; re-measured each run only as a drift
    # check. RE-PINNED late round 3 (2026-08-17): the original pins were
    # measured while concurrent session work loaded the host CPU and
    # understated true single-thread speed by 1.4-2.2x (flagged by this
    # file's own drift check on an idle machine). Each pin is now the MAX
    # across all clean idle-machine measurements — the conservative choice
    # that yields the LOWEST honest TPU-vs-CPU ratio.
    "rbq10": 1147.7,
    "multi_target": 784.0,
    "large_mlp": 175.0,
    # same pin as large_mlp: the reference/torch baseline computes f32 (CPU
    # bf16 would be slower, so the f32 pin is the conservative denominator)
    "large_mlp_bf16": 175.0,
    "lstm": 285.0,
    # forward-only ROWS/s (the inference row's unit). ROOT-CAUSED and
    # re-pinned 2026-08-19 (round 5): this rig's single vCPU is BIMODAL
    # across time — the same hot-loop protocol reads ~13M rows/s in one
    # process invocation and ~22.6M in another (burst-then-throttle /
    # host-core placement; measured 12.4-14.6M idle-cold, 15.1-22.6M in a
    # burst window, 13.0-13.6M in two immediately-following runs after the
    # burst was spent). Every historical "drift" flag (1.39x, 1.707x) was
    # this bimodality, not measurement error. No fixed pin can hold a
    # +/-30% band on such a host, so the pin is the FASTEST clean
    # measurement ever observed (max-of-medians over 5 rounds x 7 blocks,
    # CPU pre-spun hot 8 s, idle load<0.1) and `entry()` computes
    # vs_baseline against max(pin, live) — the published ratio can never
    # overstate, whichever mode the host is in. Protocol:
    # tools/measure_inference_baseline.py.
    "inference": 22_573_000.0,
}


def _mlp_flops_per_step(hidden, n_features: int, batch: int,
                        n_out: int = 1) -> float:
    """Analytic training FLOPs of one grad step of an MLP hybrid: dense
    MACs × 2 (fwd) × 3 (fwd + input-grad + weight-grad)."""
    dims = [n_features, *hidden, n_out]
    macs = sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    return 6.0 * macs * batch


def _epoch_bench(
    model,
    data,
    batch: int,
    epochs_per_call: int,
    loss_types=("mse",),
    e_small: int = 8,
    flops_per_step: float = None,
    shuffle=True,
    attainable_passes=None,
    bytes_per_step: float = None,
    bound_note: str = None,
):
    """Honest read-forced grad-steps/sec of the epoch program.

    On the target deployment `block_until_ready` does NOT guarantee the
    work has actually executed (async dispatch is buffered until the first
    device->host read; docs/tpu_notes.md), so every timed call here ends
    with `float(loss)` — a forced read. Two program sizes are timed
    (E=e_small and E=epochs_per_call epochs per program, one program call
    each) and the MARGINAL rate between them is the chip number — the
    per-grad-step cost with the per-program tunnel/launch overhead
    differenced out, which is the apples-to-apples comparison against the
    CPU baseline (also overhead-free per step). The sustained rate of the
    big program (steps / wall time incl. one program overhead) is reported
    alongside as what a remote-tunnel user actually gets per dispatch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import easyhybrid_tpu as eh
    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.training.epoch import can_skip_empty_guard, make_train_epoch
    from easyhybrid_tpu.training.train import fit_input_norm

    host_tensors = build_epoch_tensors(data, batch)
    skip_guard = can_skip_empty_guard(host_tensors)  # on HOST arrays: free
    tensors = jax.device_put(host_tensors)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    logging_loss = eh.LoggingLoss(training_loss="mse", loss_types=loss_types)

    from easyhybrid_tpu.ops.fused_epoch import (
        _fused_builder,
        fused_exactness_check,
        init_fused_opt_state,
        supports_fused_epoch,
    )
    from easyhybrid_tpu.ops.fused_multisite import supports_fused_multisite

    opt_spec = ("adam", 0.01)
    is_ms = supports_fused_multisite(
        model, opt_spec, logging_loss, tensors, shuffle=shuffle
    )
    use_fused = (
        jax.default_backend() == "tpu"
        and (
            supports_fused_epoch(model, opt_spec, logging_loss, tensors)
            or is_ms
        )
        and fused_exactness_check(
            model, params, state, opt_spec, logging_loss, tensors,
            epochs_per_call=epochs_per_call, shuffle=shuffle,
        )[0]
    )

    copy_tree = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    def build(E):
        if use_fused:
            fn = _fused_builder(model)(
                model, state, opt_spec, logging_loss, shuffle=shuffle,
                epochs_per_call=E,
            )
            return fn, init_fused_opt_state(params)
        optimizer = optax.flatten(optax.adam(0.01))
        fn = make_train_epoch(
            model, logging_loss, optimizer, shuffle=shuffle,
            epochs_per_call=E, skip_empty_guard=skip_guard,
        )
        return fn, optimizer.init(params)

    nb = int(host_tensors.weight.shape[0])

    def timed(E, reps: int = REPEATS + 2):
        fn, o0 = build(E)
        # rebind ALL carried arrays from the return: the XLA epoch donates
        # (params, opt_state, state), so reusing a donated buffer across
        # calls raises "Array has been deleted" on TPU/GPU
        p, o, s = copy_tree((params, o0, state))
        p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(0))
        _ = float(loss)  # warm + force real completion
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            p, o, s, loss = fn(p, o, s, tensors, jax.random.PRNGKey(1 + r))
            _ = float(loss)  # forced read: honest end-to-end completion
            ts.append(time.perf_counter() - t0)
        return ts

    e_big = max(epochs_per_call, e_small * 4)
    ts_small = timed(e_small)
    ts_big = timed(e_big)
    t_small = float(np.median(ts_small))
    t_big = float(np.median(ts_big))

    def _marginal(tb, ts):
        dd = tb - ts
        return (e_big - e_small) * nb / dd if dd > 0 else e_big * nb / tb

    marginal = _marginal(t_big, t_small)
    # error bar: all per-rep pairings of the two block sizes
    pairings = [
        _marginal(tb, ts) for tb in ts_big for ts in ts_small
    ]
    sustained = e_big * nb / t_big
    per_program_ms = max(0.0, (t_small - e_small * nb / marginal) * 1e3)
    extras = {
        "steps_per_s_spread": [
            round(min(pairings), 2), round(max(pairings), 2)
        ],
        "sustained_steps_per_s": round(sustained, 2),
        "per_program_overhead_ms": round(per_program_ms, 1),
        "epochs_per_program": e_big,
    }
    if flops_per_step:
        achieved = flops_per_step * marginal
        extras["gflops_per_step"] = round(flops_per_step / 1e9, 4)
        extras["tflops"] = round(achieved / 1e12, 3)
        extras["mfu_pct"] = round(100.0 * achieved / V5E_PEAK_FLOPS, 3)
        if attainable_passes is not None:
            bounds = _attainable_bounds(
                attainable_passes, flops_per_step,
                bytes_per_step if bytes_per_step is not None else 0.0,
            )
            extras.update(bounds)
            extras["pct_of_attainable"] = round(
                100.0 * marginal / bounds["attainable_steps_per_s"], 2
            )
            if bound_note:
                extras["bound_note"] = bound_note
    path = (
        ("fused_pallas_multisite" if is_ms else "fused_pallas")
        if use_fused else "xla_scan"
    )
    return marginal, path, extras


def bench_rbq10() -> float:
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        # 1024 epochs/program: at ~3.4 us/step the 36 ms tunnel dispatch
        # still costs ~30% of a 256-epoch program; 1024 drops it under 10%
        # so SUSTAINED approaches the marginal rate (the number through-
        # tunnel users actually see per dispatch)
        model, data, batch=512, epochs_per_call=1024,
        flops_per_step=_mlp_flops_per_step([16, 16], 2, 512),
        attainable_passes=_mlp_passes([16, 16], 2, 512),
        # per-step tile reads: 512 rows × (2 x + ta + y + w) f32, ×3 for
        # the shuffled copy's gather write+read
        bytes_per_step=512 * 5 * 4 * 3,
        bound_note=(
            "dependency-bound: the in-kernel SGD chain floors at ~3.3 "
            "us/step (tpu_notes 4b; the unroll experiment proved grid "
            "sequencing is not the cost) — the compute bound is not the "
            "binding constraint at this tiny shape"
        ),
    )


def bench_multi_target() -> float:
    """2-target hybrid + per-target masked MSE with 10% NaN targets."""
    import jax.numpy as jnp

    import easyhybrid_tpu as eh

    def mech(*, ta, rb, gpp_max, Q10):
        reco = rb * Q10 ** (0.1 * (ta - 15.0))
        gpp = gpp_max * (1.0 - jnp.exp(-0.1 * ta))
        return {"reco": reco, "nee": reco - gpp}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"],
        targets=["reco", "nee"],
        mechanistic_model=mech,
        parameters={
            "rb": (3.0, 0.0, 13.0),
            "gpp_max": (5.0, 0.0, 20.0),
            "Q10": (2.0, 1.0, 4.0),
        },
        neural_param_names=["rb", "gpp_max"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(20_000, seed=7)
    rng = np.random.default_rng(0)
    reco = np.asarray(df["reco"], np.float32)
    nee = reco - 5.0 * (1.0 - np.exp(-0.1 * np.asarray(df["ta"], np.float32)))
    for col, vals in (("reco", reco.copy()), ("nee", nee)):
        vals = np.asarray(vals, np.float32)
        vals[rng.random(len(vals)) < 0.1] = np.nan
        df[col] = vals
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        model, data, batch=512, epochs_per_call=1024,  # see bench_rbq10
        flops_per_step=_mlp_flops_per_step([16, 16], 2, 512, n_out=2),
        attainable_passes=_mlp_passes([16, 16], 2, 512, n_out=2),
        bytes_per_step=512 * 7 * 4 * 3,  # 2 x + ta + 2 y + 2 w, shuffled
        bound_note="dependency-bound, see rbq10",
    )


def bench_large_mlp() -> float:
    """Reference GPU-tutorial config: [1024,512,256,128,64], batch 64, 5k rows."""
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[1024, 512, 256, 128, 64], activation="swish",
        scale_nn_outputs=True, input_batchnorm=True,
    )
    df = eh.gen_rbq10_data(5_000, seed=42)
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        model, data, batch=64, epochs_per_call=64,
        flops_per_step=_mlp_flops_per_step(
            [1024, 512, 256, 128, 64], 2, 64
        ),
        attainable_passes=_mlp_passes([1024, 512, 256, 128, 64], 2, 64),
        bytes_per_step=64 * 5 * 4 * 3,
        bound_note=(
            "batch 64 fills only half an (8,128)-sublane group per MXU "
            "pass and is latency-bound; the b1024 row is the "
            "throughput-bound shape"
        ),
    )


def bench_large_mlp_bf16() -> float:
    """``large_mlp`` with ``compute_dtype=bfloat16``: the kernel's dots
    contract bf16 operands with f32 accumulation (MXU-native). Static
    input norm (bf16 + trainable-BN batch stats would re-quantize the
    normalizer every step for no benchmark-relevant reason).

    Measured HONESTLY NEUTRAL vs f32 at this config (73k vs 79k marginal
    steps/s, within spread, 2026-08-17): JAX's DEFAULT matmul precision on
    TPU already runs f32 matmuls as bf16 MXU passes, so explicit bf16
    operands add cast VPU work without raising MXU throughput at these
    model sizes — the row exists as an envelope proof and regression
    canary for the mixed-precision kernel path, not as a speedup claim."""
    import jax.numpy as jnp

    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[1024, 512, 256, 128, 64], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
        compute_dtype=jnp.bfloat16,
    )
    df = eh.gen_rbq10_data(5_000, seed=42)
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        model, data, batch=64, epochs_per_call=64,
        flops_per_step=_mlp_flops_per_step(
            [1024, 512, 256, 128, 64], 2, 64
        ),
        attainable_passes=_mlp_passes([1024, 512, 256, 128, 64], 2, 64),
        bytes_per_step=64 * 5 * 4 * 3,
        bound_note="see large_mlp; bf16 operands do not change the bound "
        "(f32 contractions already run as bf16 MXU passes)",
    )


def bench_large_mlp_b1024() -> float:
    """MFU flagship: the large-MLP tower at batch 1024 / 16k rows — the
    throughput-bound shape (batch 64 leaves half the 128-lane MXU tiles
    empty and is latency-bound). Round 4, late: runs the FUSED kernel
    with width-256 batch chunks — 15.1k marginal steps/s / ~33 % MFU vs
    the XLA epoch's 12.8-14k / 26-31 % (2026-08-18). Width matters: the
    first chunked attempt used width-128 chunks and LOST to XLA (8.0k /
    17.5 % — narrow matmuls sacrifice MXU lane utilization), so
    auto-selection only enables f32 chunks of width >= 256
    (ops/fused_epoch.py::_pick_batch_chunks). No CPU row: the torch
    baseline at this batch is bound by the same single thread, so the
    ratio would just restate rbq10's."""
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[1024, 512, 256, 128, 64], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(16 * 1024, seed=42)
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        model, data, batch=1024, epochs_per_call=64,
        flops_per_step=_mlp_flops_per_step(
            [1024, 512, 256, 128, 64], 2, 1024
        ),
        attainable_passes=_mlp_passes([1024, 512, 256, 128, 64], 2, 1024),
        bytes_per_step=1024 * 5 * 4 * 3,
    )


def bench_population() -> float:
    """TPU-native population row: a 16-member geometric lr sweep as ONE
    vmapped program through the fused Pallas engine with streamed
    per-member hyperparameters (round 4). The headline value is
    member-sweep throughput amplification: (16 x one-member wall) /
    sweep wall, both measured in-process on their SECOND call (compiles
    and gates excluded; the reference's tune loop pays one train() per
    configuration, i.e. the sequential baseline by construction). Extras
    carry the raw walls and the engine that ran."""
    import time as _time

    import numpy as np

    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    kw = dict(
        optimizer="adam", nepochs=50, batchsize=512, eval_every=5,
        seed=11, data_seed=0,
    )
    lrs = list(np.geomspace(1e-3, 5e-2, 16))

    def timed(hyper):
        eh.population_train(model, df, hyper=hyper, **kw)  # warm
        t0 = _time.perf_counter()
        pop = eh.population_train(model, df, hyper=hyper, **kw)
        return _time.perf_counter() - t0, pop

    t_sweep, pop = timed({"learning_rate": lrs})
    t_one, _ = timed({"learning_rate": [lrs[0]]})
    amplification = 16.0 * t_one / t_sweep
    return amplification, pop.epoch_path, {
        "members": 16,
        "sweep_wall_s": round(t_sweep, 2),
        "one_member_wall_s": round(t_one, 2),
        "best_val_mse": round(
            float(pop.best_losses[pop.best_member]), 5
        ),
        "unit_note": "value = (16 x one-member wall) / sweep wall",
    }


def bench_population_heavy() -> float:
    """COMPUTE-BOUND population row (round-5 VERDICT item #4): the round-4
    ``population_sweep`` row measured 15.9× amplification in a regime where
    both walls were dispatch/eval-dominated (sweep 14.5 s vs ONE member
    14.9 s), so the number was honest but trivially achievable. This row
    makes the walls device-compute dominated: quick-start members at 65,536
    epochs (≈2.56M grad steps per member ≈ 10 s of fused-kernel compute),
    K=4 lr-sweep members, ``shuffle_each_epoch=False`` (keeps the fused
    kernel in single-launch mode with zero per-epoch data copies; both
    sides of the ratio use the same setting). EXPECTED to land well below
    K and reported honestly: ``jax.vmap`` of a ``pallas_call`` lowers the
    member axis to an outer GRID dimension — members run sequentially on
    the one core — so compute-bound fused populations amplify only by
    overhead amortization (the parallel win at this regime needs a
    member-sharded mesh, or the XLA engine whose vmapped members batch
    into wider matmuls: the measured crossover lives in
    docs/tutorials/scaling_tpu.md and tools/validate_population_engines_onchip.py)."""
    import time as _time

    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    K, nepochs = 4, 65_536
    kw = dict(
        optimizer="adam", nepochs=nepochs, batchsize=512,
        eval_every=nepochs // 8, seed=11, data_seed=0,
        shuffle_each_epoch=False,
    )
    lrs = list(np.geomspace(1e-3, 1e-2, K))

    def timed(hyper):
        eh.population_train(model, df, hyper=hyper, **kw)  # warm
        t0 = _time.perf_counter()
        pop = eh.population_train(model, df, hyper=hyper, **kw)
        return _time.perf_counter() - t0, pop

    t_one, _ = timed({"learning_rate": [lrs[0]]})
    t_sweep, pop = timed({"learning_rate": lrs})
    amplification = K * t_one / t_sweep
    # split_data_at=0.8 default: 16k train rows -> 31 batches/epoch
    steps_per_member = nepochs * (16_000 // 512)
    return amplification, pop.epoch_path, {
        "members": K,
        "epochs_per_member": nepochs,
        "grad_steps_per_member": steps_per_member,
        "sweep_wall_s": round(t_sweep, 2),
        "one_member_wall_s": round(t_one, 2),
        "unit_note": (
            f"value = ({K} x one-member wall) / sweep wall; walls are "
            "device-compute dominated (vmapped fused members run as "
            "sequential grid steps on one chip — amplification ~1x is the "
            "honest single-chip answer here; see scaling_tpu.md for the "
            "XLA-engine / member-mesh alternatives)"
        ),
    }


def bench_inference() -> float:
    """Serving throughput on the quick-start model, ROWS/s. The headline is
    the CHIP number: read-forced MARGINAL rows/s between two scanned
    forward-program sizes with device-resident inputs (the same
    overhead-differencing methodology as the training rows — a serving
    deployment feeds the chip from co-located memory/infeed, not from this
    rig's HTTP dev tunnel). The end-to-end `make_inference_fn(df)` number
    THROUGH the tunnel (host DataFrame in → numpy predictions out) is
    reported alongside as `tunnel_rows_per_s`; on this deployment it is
    transfer-bound and lands ~20× BELOW the single-thread torch CPU
    forward — an honest property of remote serving over HTTP, not of the
    chip (CPU wins the ratio only against that tunnel number)."""
    import jax
    import jax.numpy as jnp

    import easyhybrid_tpu as eh
    from easyhybrid_tpu.training.train import _full_batch, fit_input_norm

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(131_072, seed=42)
    data = eh.prepare_data(model, df)
    n = data.n_samples
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    state = fit_input_norm(model, state, data)
    inputs, _ = jax.device_put(_full_batch(data))

    def make_scan(E):
        @jax.jit
        def run(params, state, inputs):
            x, forcing = inputs

            def body(acc, i):
                # i·1e-12 is exactly absorbed by f32 addition at these
                # magnitudes (numerics unchanged) but keeps the forward
                # loop-VARIANT so XLA cannot hoist it out of the scan
                xi = x + i * jnp.float32(1e-12)
                out, _st = model.apply(
                    params, state, (xi, forcing), training=False
                )
                return acc + jnp.sum(out["reco"]), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(E, dtype=jnp.float32)
            )
            return acc

        return run

    def timed(E, reps=REPEATS):
        fn = make_scan(E)
        _ = float(fn(params, state, inputs))  # warm + force
        ts = []
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(fn(params, state, inputs))  # read-forced
            ts.append(time.perf_counter() - t0)
        return ts

    # the forward is ~20 us/pass: a 4-vs-64 pass delta (~1 ms) sits inside
    # the ~30 ms tunnel dispatch noise and once produced a nonsense 7.9e15
    # rows/s marginal — the pass counts must make the compute delta
    # UNMISSABLE relative to dispatch jitter (3840 passes ~ 80 ms)
    e_small_p, e_big_p = 256, 4096
    ts_small, ts_big = timed(e_small_p), timed(e_big_p)
    dd = max(float(np.median(ts_big)) - float(np.median(ts_small)), 1e-9)
    marginal = (e_big_p - e_small_p) * n / dd
    # error bar: the marginal is a DIFFERENCE of two tunnel-dominated
    # timings, so report min/max over all per-rep pairings (same spread
    # convention as the training rows' steps_per_s_spread). Non-positive
    # pairings (a big-pass rep faster than a small-pass rep — pure
    # dispatch jitter) are DROPPED, not clamped: a clamp would report an
    # absurd ~5e17 rows/s spread max, the exact fiction this block's
    # pass counts were raised to avoid.
    pair_rates = [
        (e_big_p - e_small_p) * n / (tb - tsm)
        for tb in ts_big
        for tsm in ts_small
        if tb - tsm > 0
    ] or [marginal]
    # analytic roofline sanity bound: dense fwd MACs of MLP [16,16] on 2
    # features + 1 output = 304 MACs → 608 FLOPs/row; the MXU-peak row
    # rate bounds any honest rows/s claim from above
    flops_per_row = 2.0 * (2 * 16 + 16 * 16 + 16 * 1)
    roofline_rows = V5E_PEAK_FLOPS / flops_per_row

    # end-to-end through the tunnel: DataFrame in, numpy predictions out
    predict = eh.make_inference_fn(model, params, state, batch_size=65_536)
    out = predict(df)  # warm + compile
    assert np.isfinite(np.asarray(out["reco"])).all()
    tunnel = _median_rate(lambda: predict(df), n)
    return marginal, "inference_jit", {
        "rows": int(n),
        "rows_per_s_spread": [round(min(pair_rates), 0),
                              round(max(pair_rates), 0)],
        "flops_per_row": flops_per_row,
        "roofline_rows_per_s": round(roofline_rows, 0),
        "pct_of_roofline": round(100.0 * marginal / roofline_rows, 2),
        "tunnel_rows_per_s": round(tunnel, 0),
    }


def baseline_inference(n_rows=131_072, rounds=5, blocks=7,
                       spin_s=8.0) -> float:
    """torch-CPU forward-only rows/s for the same model shape, under the
    PINNED protocol (round 5): the CPU is pre-spun hot for ``spin_s``
    seconds (the forward block is only ~10 ms — far too short to ramp a
    frequency governor by itself, unlike the self-warming training
    baselines), then ``rounds`` rounds of median-of-``blocks`` are taken
    and the MAX of the round medians is returned — the fastest clean
    reading, i.e. the conservative (lowest-ratio) denominator. The rig's
    vCPU is bimodal across invocations (see ``_PINNED_BASELINES``), so a
    single invocation may still land in the slow mode; ``entry()`` guards
    the ratio with max(pin, live) regardless."""
    import statistics

    torch = _torch_setup()
    g = torch.Generator().manual_seed(0)
    x = torch.randn(n_rows, 2, generator=g)
    ta = torch.randn(n_rows, generator=g) * 8 + 10

    net = torch.nn.Sequential(
        torch.nn.BatchNorm1d(2),
        torch.nn.Linear(2, 16), torch.nn.SiLU(),
        torch.nn.Linear(16, 16), torch.nn.SiLU(),
        torch.nn.Linear(16, 1),
    )
    net.eval()
    raw_q10 = torch.zeros(1)

    def block():
        with torch.no_grad():
            rb = 13.0 * torch.sigmoid(net(x).squeeze(-1))
            q10 = 1.0 + 3.0 * torch.sigmoid(raw_q10)
            pred = rb * q10 ** (0.1 * (ta - 15.0))
            _ = pred.numpy()

    for _ in range(3):
        block()  # warmup
    a = torch.randn(512, 512)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < spin_s:  # ramp the CPU hot
        a = a @ a * 1e-3 + 1.0
    medians = []
    for _ in range(rounds):
        rates = []
        for _ in range(blocks):
            t0 = time.perf_counter()
            block()
            rates.append(n_rows / (time.perf_counter() - t0))
        medians.append(statistics.median(rates))
    return max(medians)


def bench_large_mlp_b1024_bf16() -> float:
    """``large_mlp_b1024`` with ``compute_dtype=bfloat16`` — the shape
    where explicit bf16 could in principle buy MXU throughput (FLOPs-bound,
    full 128-lane tiles). Measured (2026-08-18): 13.4k marginal steps/s /
    29.1 % MFU vs f32's 12.8k / 27.8 % — a small real edge with overlapping
    spreads, confirming at the FLOPs-bound shape what batch 64 showed:
    JAX's default matmul precision already runs f32 contractions as bf16
    MXU passes, so explicit bf16 operands mostly trade cast VPU work for
    marginal MXU headroom. XLA path by measurement: bf16 batch-CHUNKS lose
    at every width (w=256: 7.8k — the per-layer casts dominate once the
    batch splits), so auto-chunking is f32-only and this row stays XLA
    (see ``bench_large_mlp_b1024`` / ``_pick_batch_chunks``)."""
    import jax.numpy as jnp

    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[1024, 512, 256, 128, 64], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
        compute_dtype=jnp.bfloat16,
    )
    df = eh.gen_rbq10_data(16 * 1024, seed=42)
    data = eh.prepare_data(model, df)
    return _epoch_bench(
        model, data, batch=1024, epochs_per_call=64,
        flops_per_step=_mlp_flops_per_step(
            [1024, 512, 256, 128, 64], 2, 1024
        ),
        attainable_passes=_mlp_passes([1024, 512, 256, 128, 64], 2, 1024),
        bytes_per_step=1024 * 5 * 4 * 3,
        bound_note="see large_mlp_b1024; the bound is unchanged by bf16 "
        "operands",
    )


def bench_multisite() -> float:
    """10k vmapped sites × 64 obs (shared NN + per-site Q10): grad steps/s
    over the full site batch (640k samples per step)."""
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True,
    )
    S, N = 10_000, 64
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    rng = np.random.default_rng(0)
    from easyhybrid_tpu.data.prepare import HybridData

    data = HybridData(
        x=rng.random((S, N, 2)).astype(np.float32),
        forcing={"ta": (10 + 10 * rng.random((S, N))).astype(np.float32)},
        y={"reco": (2 + rng.random((S, N))).astype(np.float32)},
    )
    return _epoch_bench(
        # 1024 epochs/program: no shuffle on the full-site batch, so the
        # longer grid costs zero extra memory and sustained approaches
        # marginal (the ~34 ms dispatch amortizes 4x further)
        model, data, batch=S, epochs_per_call=1024, e_small=8,
        flops_per_step=_mlp_flops_per_step([16, 16], 2, S * N),
        attainable_passes=_mlp_passes([16, 16], 2, S * N),
        # full-site step, no shuffle: every (site, obs) tile read once
        bytes_per_step=S * N * 5 * 4,
        bound_note=(
            "VPU-bound by shape: [16,16] contractions cannot fill 128-lane "
            "MXU tiles, so the attainable bound is the full-lane VPU FMA "
            "rate — 'mfu_pct' vs the 197 TFLOP/s MXU peak is structurally "
            "~2.4% here and NOT the headroom"
        ),
    )


def bench_multisite_minibatch() -> float:
    """Minibatched multisite: 10,240 sites × 64 obs trained in 2,560-site
    batches (nb=4) with ``shuffle_each_epoch=True`` — the reference's
    DEFAULT loader semantics (loaders.jl shuffle=true), fused since round
    5 via the per-epoch slot-map permutation (one kernel launch per epoch,
    packed tiles gathered/scattered around it). Reports per-BATCH
    optimizer steps/s. The round-4 shuffle-off single-launch mode measured
    3.3× the XLA epoch's marginal at this shape class; the shuffled mode
    pays per-epoch launches + gathers, so its margin is the honest
    headline for reference-default configs."""
    import easyhybrid_tpu as eh

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True,
    )
    S, N, B = 10_240, 64, 2_560
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    # shared fixture builder: carries the identity _site_idx selector the
    # fused kernel's chunk<->packed-row check requires
    from easyhybrid_tpu.data.synthetic import gen_multisite_arrays

    data = gen_multisite_arrays(S, N, seed=0)
    return _epoch_bench(
        model, data, batch=B, epochs_per_call=256, e_small=8,
        flops_per_step=_mlp_flops_per_step([16, 16], 2, B * N),
        shuffle=True,
        attainable_passes=_mlp_passes([16, 16], 2, B * N),
        # per-epoch permuted copy: gather write + read on top of the
        # stream read (the rbq10 row's shuffled-copy accounting)
        bytes_per_step=B * N * 5 * 4 * 3,
        bound_note="VPU-bound by shape, see multisite",
    )


def bench_lstm() -> float:
    """Sequence config (reference Q10_lstm.jl analog): 4k rows, 10-step
    input windows, LSTM(16). Round 4: runs the FUSED Pallas kernel — the
    checkpointed-recompute BPTT removed the T=6 Mosaic compile cliff, so
    10-step windows fit the fused envelope (136k vs 39k marginal steps/s
    on the XLA scan, 2026-08-18)."""
    import easyhybrid_tpu as eh
    from easyhybrid_tpu.data.sequences import split_into_sequences

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers={"lstm": 16}, activation="swish",
        scale_nn_outputs=True, input_batchnorm=False,
    )
    df = eh.gen_rbq10_data(4_000, seed=42)
    data = split_into_sequences(
        eh.prepare_data(model, df), input_window=10, output_window=1,
    )
    T, H, F, B = 10, 16, 2, 512
    lstm_flops = 6.0 * T * 4 * (F + H) * H * B  # 4 gates, fwd+bwd
    # per timestep: gate fwd [B,F+H]@[F+H,4H], dgrad, wgrad (head excluded,
    # matching lstm_flops)
    gate_passes = [
        (B, F + H, 4 * H), (B, 4 * H, F + H), (F + H, B, 4 * H),
    ] * T
    return _epoch_bench(
        model, data, batch=B, epochs_per_call=1024,  # see bench_rbq10
        flops_per_step=lstm_flops,
        attainable_passes=gate_passes,
        # window tiles: B × (T·F x + ta + y + w) f32, ×3 shuffled copy
        bytes_per_step=B * (T * 2 + 3) * 4 * 3,
        bound_note=(
            "sequential T-step chain; checkpointed-recompute BPTT "
            "recomputes the gate forward (~+1 pass not in the analytic "
            "FLOPs), so the true attainable is ~3/4 of this bound"
        ),
    )


# --------------------------------------------------------------------------
# torch-CPU baselines (reference stand-in: same model + grad step; the
# reference is Julia/Lux on CPU, not installed here)
# --------------------------------------------------------------------------

def _torch_setup():
    import torch

    torch.set_num_threads(1)  # pinned: single-thread CPU baseline
    torch.manual_seed(0)
    return torch


def _torch_bench(step, num_batches: int, block_steps: int):
    for w in range(num_batches):  # warmup
        step(w)

    def block():
        for i in range(block_steps):
            step(i % num_batches)

    return _median_rate(block, block_steps)


def baseline_rbq10(hidden=(16, 16), n_rows=20_000, batch=512, steps=120) -> float:
    torch = _torch_setup()
    g = torch.Generator().manual_seed(0)
    x = torch.randn(n_rows, 2, generator=g)
    ta = torch.randn(n_rows, generator=g) * 8 + 10
    y = torch.randn(n_rows, generator=g) + 3

    layers, prev = [torch.nn.BatchNorm1d(2)], 2
    for h in hidden:
        layers += [torch.nn.Linear(prev, h), torch.nn.SiLU()]
        prev = h
    layers += [torch.nn.Linear(prev, 1)]
    net = torch.nn.Sequential(*layers)
    raw_q10 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam(list(net.parameters()) + [raw_q10], lr=0.01)
    num_batches = n_rows // batch

    def step(i):
        sl = slice(i * batch, (i + 1) * batch)
        rb = 13.0 * torch.sigmoid(net(x[sl]).squeeze(-1))
        q10 = 1.0 + 3.0 * torch.sigmoid(raw_q10)
        pred = rb * q10 ** (0.1 * (ta[sl] - 15.0))
        loss = torch.mean((pred - y[sl]) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()

    return _torch_bench(step, num_batches, steps)


def baseline_multi_target(n_rows=20_000, batch=512, steps=120) -> float:
    torch = _torch_setup()
    g = torch.Generator().manual_seed(0)
    x = torch.randn(n_rows, 2, generator=g)
    ta = torch.randn(n_rows, generator=g) * 8 + 10
    y1 = torch.randn(n_rows, generator=g) + 3
    y2 = torch.randn(n_rows, generator=g)
    m1 = (torch.rand(n_rows, generator=g) > 0.1).float()
    m2 = (torch.rand(n_rows, generator=g) > 0.1).float()

    net = torch.nn.Sequential(
        torch.nn.BatchNorm1d(2),
        torch.nn.Linear(2, 16), torch.nn.SiLU(),
        torch.nn.Linear(16, 16), torch.nn.SiLU(),
        torch.nn.Linear(16, 2),
    )
    raw_q10 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam(list(net.parameters()) + [raw_q10], lr=0.01)
    num_batches = n_rows // batch

    def step(i):
        sl = slice(i * batch, (i + 1) * batch)
        out = net(x[sl])
        rb = 13.0 * torch.sigmoid(out[:, 0])
        gpp_max = 20.0 * torch.sigmoid(out[:, 1])
        q10 = 1.0 + 3.0 * torch.sigmoid(raw_q10)
        reco = rb * q10 ** (0.1 * (ta[sl] - 15.0))
        nee = reco - gpp_max * (1.0 - torch.exp(-0.1 * ta[sl]))
        l1 = ((reco - y1[sl]) ** 2 * m1[sl]).sum() / m1[sl].sum()
        l2 = ((nee - y2[sl]) ** 2 * m2[sl]).sum() / m2[sl].sum()
        loss = l1 + l2
        opt.zero_grad()
        loss.backward()
        opt.step()

    return _torch_bench(step, num_batches, steps)


def baseline_large_mlp(steps=30) -> float:
    return baseline_rbq10(
        hidden=(1024, 512, 256, 128, 64), n_rows=5_000, batch=64, steps=steps
    )


def baseline_lstm(n_rows=4_000, window=10, batch=512, steps=60) -> float:
    """torch-CPU 1-thread LSTM(16) stand-in for the sequence config."""
    torch = _torch_setup()
    g = torch.Generator().manual_seed(0)
    n_win = n_rows - window + 1
    x = torch.randn(n_win, window, 2, generator=g)
    ta = torch.randn(n_win, generator=g) * 8 + 10
    y = torch.randn(n_win, generator=g) + 3

    lstm = torch.nn.LSTM(2, 16, batch_first=True)
    head = torch.nn.Linear(16, 1)
    raw_q10 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam(
        list(lstm.parameters()) + list(head.parameters()) + [raw_q10],
        lr=0.01,
    )
    num_batches = n_win // batch

    def step(i):
        sl = slice(i * batch, (i + 1) * batch)
        out, _ = lstm(x[sl])
        rb = 13.0 * torch.sigmoid(head(out[:, -1]).squeeze(-1))
        q10 = 1.0 + 3.0 * torch.sigmoid(raw_q10)
        pred = rb * q10 ** (0.1 * (ta[sl] - 15.0))
        loss = torch.mean((pred - y[sl]) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()

    return _torch_bench(step, num_batches, steps)


def main():
    # persistent compilation cache (same one train() uses): repeated bench
    # runs skip the Mosaic/XLA compiles, which dominate a cold run
    from easyhybrid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    verbose = os.environ.get("BENCH_VERBOSE") == "1"
    configs = {}

    def entry(name, fw_fn, base_fn):
        t0 = time.perf_counter()
        try:
            fw = fw_fn()
        except Exception as e:  # one broken config must not lose the run
            print(f"# ERROR {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            configs[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            return configs[name]
        if verbose:
            print(f"# {name}: fw bench {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        path = None
        extras = None
        if isinstance(fw, tuple):
            if len(fw) == 3:
                fw, path, extras = fw
            else:
                fw, path = fw
        measured = float("nan")
        if base_fn is not None:
            try:
                t0 = time.perf_counter()
                measured = base_fn()
                if verbose:
                    print(
                        f"# {name}: baseline {time.perf_counter() - t0:.1f}s",
                        file=sys.stderr,
                    )
            except Exception:
                pass
        row = {
            "steps_per_s": round(fw, 2),
            "ms_per_step": round(1000.0 / fw, 4),
        }
        if path is not None:
            row["epoch_path"] = path
        if extras:
            row.update(extras)
        pinned = _PINNED_BASELINES.get(name)
        base = pinned if pinned is not None else measured
        if pinned is not None and measured == measured:
            # the ratio denominator is the FASTEST CPU evidence available
            # (pin or live re-measurement) — the published ratio can never
            # overstate, whichever speed mode the host is in (round 5; the
            # rig's vCPU is bimodal, see _PINNED_BASELINES)
            base = max(pinned, measured)
        if base == base:  # not NaN
            row["baseline_steps_per_s"] = round(base, 2)
            row["baseline_ms_per_step"] = round(1000.0 / base, 4)
            row["baseline_pinned"] = pinned is not None
            row["vs_baseline"] = round(fw / base, 2)
            if pinned is not None and measured == measured:
                drift = measured / pinned
                row["baseline_drift"] = round(drift, 3)
                if drift > 1.3:
                    # the pin UNDERSTATES the live CPU: the pin itself is
                    # stale and must be re-measured. The ratio above
                    # already uses the live value (no overstatement), but
                    # the row self-flags so a violated pin can never ship
                    # silently again (round-5 VERDICT item #1).
                    row["invalid"] = True
                    row["pin_status"] = "understated_pin"
                    print(
                        f"# ERROR {name}: live CPU baseline {measured:.1f} "
                        f"exceeds the pin {pinned:.1f} by {drift:.2f}x — "
                        "row marked invalid; raise the pin "
                        "(tools/measure_inference_baseline.py)",
                        file=sys.stderr,
                    )
                elif drift < 0.7:
                    # the live reading is in the host's SLOW mode: the
                    # ratio keeps the (faster) pin as denominator — the
                    # conservative claim — and the row says why the drift
                    # band was exceeded.
                    row["pin_status"] = "host_slow_mode"
                    print(
                        f"# NOTE {name}: live CPU baseline {measured:.1f} "
                        f"is {drift:.2f}x the pin {pinned:.1f} (host slow "
                        "mode); ratio uses the pin — conservative",
                        file=sys.stderr,
                    )
                else:
                    row["pin_status"] = "in_band"
        configs[name] = row
        return row

    headline = entry("rbq10", bench_rbq10, baseline_rbq10)
    entry("multi_target", bench_multi_target, baseline_multi_target)
    entry("large_mlp", bench_large_mlp, baseline_large_mlp)
    entry("large_mlp_bf16", bench_large_mlp_bf16, None)
    entry("large_mlp_b1024", bench_large_mlp_b1024, None)
    entry("large_mlp_b1024_bf16", bench_large_mlp_b1024_bf16, None)
    entry("multisite", bench_multisite, None)
    entry("multisite_minibatch", bench_multisite_minibatch, None)
    entry("lstm", bench_lstm, baseline_lstm)
    entry("population_sweep", bench_population, None)
    entry("population_sweep_heavy", bench_population_heavy, None)
    entry("inference", bench_inference, baseline_inference)

    if "steps_per_s" in configs["multisite"]:  # absent on an error row
        configs["multisite"]["site_steps_per_s"] = round(
            configs["multisite"]["steps_per_s"] * 10_000, 0
        )

    # Full per-config detail goes to a local file + stderr; stdout's FINAL
    # line stays a compact headline so the driver's tail buffer can always
    # parse it (round-3 lesson: the all-in-one line outgrew the buffer and
    # BENCH_r03.json recorded "parsed": null).
    full = {
        "metric": "rbq10_grad_steps_per_sec",
        "value": headline.get("steps_per_s"),
        "unit": "grad steps/s (batch 512, 20k rows, MLP[16,16]; "
        f"baseline: torch CPU 1 thread, median of {REPEATS})",
        "vs_baseline": headline.get("vs_baseline"),
        "configs": configs,
    }
    try:
        results_path = os.path.join(os.path.dirname(__file__), "bench_results.json")
        with open(results_path, "w") as fh:
            json.dump(full, fh, indent=1)
        print(f"# full per-config results: {results_path}", file=sys.stderr)
    except OSError:
        pass
    print("# configs: " + json.dumps(configs), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "rbq10_grad_steps_per_sec",
                "value": headline.get("steps_per_s"),
                "unit": "grad steps/s (batch 512, MLP[16,16], vs torch CPU)",
                "vs_baseline": headline.get("vs_baseline"),
                "mfu_pct": headline.get("mfu_pct"),
            }
        )
    )


if __name__ == "__main__":
    main()
