"""Mesh-structure A/B for population training: 1-D members vs 2-D
members×data, on the 8-virtual-device CPU mesh.

Round-5 VERDICT item #6, mesh half. The question users face on a pod
slice: with K ensemble/sweep members and D devices, shard the MEMBER axis
only (1-D mesh — zero collectives, composes with the fused kernels via
shard_map) or also split each member's batch over a data axis (2-D mesh —
in-member DP with a per-member grad psum, XLA engine only)? Both engines
here run the XLA epoch (the fused kernel on CPU would be interpret-mode,
whose timing is meaningless), so the measured RATIO isolates the MESH
STRUCTURE: the collectives + partitioning cost vs the idle-device cost.
The single-chip fused-vs-XLA ENGINE crossover is measured separately by
tools/validate_population_engines_onchip.py on the real TPU.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/validate_population_mesh_cpu.py [K ...]
(default K sweep: 2 4 8 16; the CPU platform is forced internally)
"""

import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, ".")

import easyhybrid_tpu as eh  # noqa: E402


def build():
    hidden = [
        int(h) for h in os.environ.get("POP_MESH_HIDDEN", "64,64").split(",")
    ]

    def rbq10(*, ta, rb, Q10, tref=15.0):
        return {"reco": rb * Q10 ** (0.1 * (ta - tref))}

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=hidden, activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )
    df = eh.gen_rbq10_data(20_000, seed=42)
    return model, df


def timed(model, df, K, mesh, nepochs):
    lrs = list(np.geomspace(1e-3, 1e-2, K))
    kw = dict(
        optimizer="adam", nepochs=nepochs,
        batchsize=int(os.environ.get("POP_MESH_BATCH", "512")),
        eval_every=max(1, nepochs // 4), seed=11, data_seed=0,
        mesh=mesh,
    )
    eh.population_train(model, df, hyper={"learning_rate": lrs}, **kw)
    t0 = time.perf_counter()
    pop = eh.population_train(model, df, hyper={"learning_rate": lrs}, **kw)
    return time.perf_counter() - t0, pop.epoch_path


def main():
    ks = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]
    nepochs = int(os.environ.get("POP_MESH_EPOCHS", "40"))
    devs = jax.devices()
    assert len(devs) >= 8, "needs xla_force_host_platform_device_count=8"
    model, df = build()
    print(
        f"devices: {len(devs)} cpu | nepochs={nepochs} | hidden "
        f"{os.environ.get('POP_MESH_HIDDEN', '64,64')} | batch "
        f"{os.environ.get('POP_MESH_BATCH', '512')} | both runs XLA "
        "engine (mesh-structure ratio)"
    )
    rows = []
    for K in ks:
        m = min(K, 8)
        d = max(1, 8 // m)
        mesh1 = Mesh(np.array(devs[:m]), ("members",))
        wall1, path1 = timed(model, df, K, mesh1, nepochs)
        if d > 1:
            mesh2 = Mesh(np.array(devs[: m * d]).reshape(m, d),
                         ("members", "data"))
            wall2, path2 = timed(model, df, K, mesh2, nepochs)
        else:
            wall2, path2 = float("nan"), "n/a (members fill the mesh)"
        winner = (
            "1-D" if not (wall2 == wall2) or wall1 < wall2 else "2-D"
        )
        rows.append((K, m, d, wall1, wall2, winner))
        print(f"K={K:3d}  1-D ({m} members-dev) {wall1:6.2f}s  "
              f"2-D ({m}x{d}) {wall2:6.2f}s  -> {winner}")
    print("\nmarkdown for docs/tutorials/scaling_tpu.md:")
    print("| K | 1-D mesh wall | 2-D members×data wall | winner |")
    print("|---|---|---|---|")
    for K, m, d, w1, w2, win in rows:
        w2s = f"{w2:.2f} s ({m}×{d})" if w2 == w2 else "—"
        print(f"| {K} | {w1:.2f} s ({m} dev) | {w2s} | {win} |")


if __name__ == "__main__":
    main()
