"""Execute every example end-to-end on the CPU backend.

The reference's docs build EXECUTES its tutorials (Literate → ``@example``
blocks, docs/make.jl:12-30), so a rotted tutorial fails the build. This is
the same guarantee for ``examples/``: CI runs them all with a small epoch
knob (``EASYHYBRID_EXAMPLE_EPOCHS``); any exception fails the job.

Run: python tools/run_examples.py [epochs]
"""

import os
import runpy
import sys
import time

os.environ.setdefault("EASYHYBRID_EXAMPLE_EPOCHS", sys.argv[1] if len(sys.argv) > 1 else "3")
os.environ.setdefault("MPLBACKEND", "Agg")

import jax

# force CPU even when a TPU plugin registers (env var alone is overridden)
jax.config.update("jax_platforms", "cpu")

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ex_dir = os.path.join(repo, "examples")
failures = []
for name in sorted(os.listdir(ex_dir)):
    if not name.endswith(".py"):
        continue
    path = os.path.join(ex_dir, name)
    t0 = time.perf_counter()
    print(f"=== {name} ===", flush=True)
    try:
        runpy.run_path(path, run_name="__main__")
        print(f"=== {name} OK ({time.perf_counter() - t0:.1f}s) ===", flush=True)
    except SystemExit as e:
        if e.code not in (0, None):
            failures.append(name)
            print(f"=== {name} FAILED (exit {e.code}) ===", flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(name)
        print(f"=== {name} FAILED: {type(e).__name__}: {e} ===", flush=True)

if failures:
    print("FAILED examples:", ", ".join(failures))
    sys.exit(1)
print(f"all examples OK")
