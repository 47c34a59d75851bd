"""Headline benchmark: RbQ10 hybrid grad-steps/sec.

Config (BASELINE.md / reference README quick-start): 20k synthetic rows,
MLP [16,16] swish, batch 512, Adam — one grad step = fused forward (NN +
sigmoid bound scaling + Q10 mechanistic model) + backward + optimizer update.

Framework path: one jitted lax.scan epoch over device-resident padded batch
tensors (39 grad steps per program) — the per-step cost is pure compute, no
dispatch. Baseline: the same model/step implemented in torch on CPU
(the reference is Julia/Lux on CPU, which is not installed here; torch-CPU
is the closest available stand-in and is measured fresh on this machine).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_ROWS = 20_000
BATCH = 512
HIDDEN = (16, 16)
TIMED_EPOCHS = 20


def bench_framework() -> float:
    import jax
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import easyhybrid_tpu as eh
    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.training.epoch import can_skip_empty_guard, make_train_epoch

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers=list(HIDDEN),
        activation="swish",
        scale_nn_outputs=True,
        input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(N_ROWS, seed=42)
    data = eh.prepare_data(model, df)
    tensors = build_epoch_tensors(data, BATCH)
    tensors = jax.device_put(tensors)
    num_batches = tensors.num_batches

    params, state = model.init(jax.random.PRNGKey(0))
    from easyhybrid_tpu.training.train import fit_input_norm

    state = fit_input_norm(model, state, data)
    optimizer = optax.flatten(optax.adam(0.01))
    opt_state = optimizer.init(params)
    logging_loss = eh.LoggingLoss(training_loss="mse", loss_types=("mse",))
    epoch_fn = make_train_epoch(
        model, logging_loss, optimizer, shuffle=True,
        epochs_per_call=TIMED_EPOCHS,
        skip_empty_guard=can_skip_empty_guard(tensors),
    )

    key = jax.random.PRNGKey(1)
    # warmup/compile
    params, opt_state, state, loss = epoch_fn(params, opt_state, state, tensors, key)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    params, opt_state, state, loss = epoch_fn(
        params, opt_state, state, tensors, jax.random.PRNGKey(2)
    )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    steps = TIMED_EPOCHS * num_batches
    return steps / dt


def bench_torch_cpu_baseline(max_seconds: float = 20.0) -> float:
    """Same model + grad step in torch on CPU (reference-equivalent stand-in)."""
    import torch

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(0)
    x = torch.randn(N_ROWS, 2, generator=g)
    ta = torch.randn(N_ROWS, generator=g) * 8 + 10
    y = torch.randn(N_ROWS, generator=g) + 3

    net = torch.nn.Sequential(
        torch.nn.BatchNorm1d(2),
        torch.nn.Linear(2, HIDDEN[0]),
        torch.nn.SiLU(),
        torch.nn.Linear(HIDDEN[0], HIDDEN[1]),
        torch.nn.SiLU(),
        torch.nn.Linear(HIDDEN[1], 1),
    )
    raw_q10 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam(list(net.parameters()) + [raw_q10], lr=0.01)

    num_batches = N_ROWS // BATCH

    def step(i):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        xb, tab, yb = x[sl], ta[sl], y[sl]
        rb = 13.0 * torch.sigmoid(net(xb).squeeze(-1))
        q10 = 1.0 + 3.0 * torch.sigmoid(raw_q10)
        pred = rb * q10 ** (0.1 * (tab - 15.0))
        loss = torch.mean((pred - yb) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()

    for w in range(num_batches):  # warmup epoch (allocator, kernels)
        step(w)
    steps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_seconds and steps < 10 * num_batches:
        step(steps % num_batches)
        steps += 1
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    value = bench_framework()
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception:
        baseline = float("nan")
    vs = value / baseline if baseline == baseline else float("nan")
    print(
        json.dumps(
            {
                "metric": "rbq10_grad_steps_per_sec",
                "value": round(value, 2),
                "unit": "grad steps/s (batch 512, 20k rows, MLP[16,16])",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
