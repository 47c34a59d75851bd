"""Execute every ```python code block in docs/ — executable documentation.

The reference's docs site runs its tutorials at build time (Literate →
``@example`` blocks, docs/make.jl:3,12-30,46-85), so documentation that
rots fails the build. This is the same guarantee for the markdown docs
here: all python blocks in one file execute top-to-bottom in a SHARED
namespace (like a tutorial notebook); any exception fails the run.

Blocks can be annotated on the fence line:
    ```python skip     — illustrative fragment, not executed
Heavy epochs are clamped via the same EASYHYBRID_EXAMPLE_EPOCHS knob the
examples use (train() calls are monkey-patched to cap nepochs).

Run: python tools/run_doc_snippets.py [epochs]
"""

import os
import re
import sys
import time

MAX_EPOCHS = int(
    os.environ.get(
        "EASYHYBRID_EXAMPLE_EPOCHS", sys.argv[1] if len(sys.argv) > 1 else "3"
    )
)
os.environ.setdefault("MPLBACKEND", "Agg")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# force CPU even when a TPU plugin registers (env var alone is overridden)
jax.config.update("jax_platforms", "cpu")

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import easyhybrid_tpu as eh  # noqa: E402

# cap training lengths so the doc run stays quick
_train = eh.train


def _train_capped(*args, **kw):
    kw["nepochs"] = min(int(kw.get("nepochs", 100)), MAX_EPOCHS)
    kw.setdefault("show_progress", False)
    return _train(*args, **kw)


eh.train = _train_capped


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def _quickstart_model():
    return eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[16, 16], activation="swish",
        scale_nn_outputs=True, input_batchnorm="static",
    )


def _df():
    return eh.gen_rbq10_data(2000, seed=42)


FENCE = re.compile(r"^```python([^\n]*)\n(.*?)^```", re.M | re.S)

failures = []
for root, _, files in os.walk(os.path.join(repo, "docs")):
    for name in sorted(files):
        if not name.endswith(".md"):
            continue
        path = os.path.join(root, name)
        rel = os.path.relpath(path, repo)
        blocks = FENCE.findall(open(path).read())
        runnable = [(i, b) for i, (ann, b) in enumerate(blocks)
                    if "skip" not in ann]
        if not runnable:
            continue
        # tutorials share the quick-start preamble (docs/get_started.md):
        # imports plus the RbQ10 model/df every page builds on
        import jax.numpy as jnp

        import numpy as np
        import optax

        ns = {
            "__name__": f"doc_{name[:-3]}",
            "eh": eh, "np": np, "jax": jax, "jnp": jnp, "optax": optax,
            "rbq10": _rbq10, "model": _quickstart_model(), "df": _df(),
        }
        t0 = time.perf_counter()
        print(f"=== {rel} ({len(runnable)} blocks) ===", flush=True)
        for i, block in runnable:
            try:
                exec(compile(block, f"{rel}#block{i}", "exec"), ns)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{rel}#block{i}")
                print(f"--- {rel}#block{i} FAILED: "
                      f"{type(e).__name__}: {e} ---", flush=True)
                break
        else:
            print(f"=== {rel} OK ({time.perf_counter() - t0:.1f}s) ===",
                  flush=True)

if failures:
    print("FAILED doc snippets:", ", ".join(failures))
    sys.exit(1)
print("all doc snippets OK")
