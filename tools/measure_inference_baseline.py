"""Reproducible protocol for (re-)pinning the torch-CPU inference baseline.

The serving row's denominator (``bench.py::_PINNED_BASELINES['inference']``)
is the FASTEST clean CPU measurement ever observed, because this rig's
single vCPU is bimodal across process invocations (~13M vs ~22.6M rows/s —
burst-then-throttle / host-core placement; root-caused 2026-08-19). The
protocol, in one invocation:

1. refuse to measure unless the 1-minute load average is < 0.5 (idle check);
2. pre-spin the CPU hot for 8 s (the ~10 ms forward block cannot ramp a
   frequency governor by itself);
3. take 5 rounds of median-of-7 timed blocks and report the max-of-medians
   (plus the full distribution so a slow-mode invocation is recognizable).

Run it SEVERAL times across a few minutes; the pin is the maximum of the
reported ``max_of_medians`` values. ``bench.py`` guards the published ratio
with max(pin, live) regardless, so an understated pin can only ever flag
the row invalid — never inflate the ratio.

Usage: python tools/measure_inference_baseline.py [runs]
"""

import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _PINNED_BASELINES, baseline_inference  # noqa: E402


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    load = os.getloadavg()[0]
    if load >= 0.5:
        sys.exit(f"machine not idle (load {load:.2f} >= 0.5) — aborting; "
                 "a loaded host understates the CPU and would inflate the "
                 "ratio")
    pin = _PINNED_BASELINES["inference"]
    maxima = []
    for r in range(runs):
        m = baseline_inference()
        maxima.append(m)
        print(f"run {r}: max_of_medians {m / 1e6:.3f}M rows/s "
              f"(load {os.getloadavg()[0]:.2f})")
    best = max(maxima)
    print(f"fastest clean measurement: {best / 1e6:.3f}M rows/s")
    print(f"current pin:               {pin / 1e6:.3f}M rows/s")
    if best > pin:
        print(f"=> RAISE the pin to {best:.1f} "
              "(bench.py::_PINNED_BASELINES['inference'])")
    else:
        print("=> pin stands (this invocation may be in the host's slow "
              "mode; re-run later to confirm)")
    print("all runs (M rows/s):",
          [round(m / 1e6, 3) for m in sorted(maxima)],
          "| median", round(statistics.median(maxima) / 1e6, 3))


if __name__ == "__main__":
    main()
