"""Fixed-work host-speed canary: normalizes bench walls across host drift.

This sandbox is a shared VM whose effective CPU speed moves between
sessions (BASELINE.md documents ±20-40% run-to-run variance; on
2026-08-20 the SAME flagship code measured 2.3x slower walls than the
previous day, while a commit-level A/B on the slow box confirmed the
code itself had gotten 1.9x FASTER — see BASELINE.md round 4).

``probe()`` runs a fixed amount of single-thread work (a seeded
2000x2000 float64 matmul x3 — ~48 GFLOP through the same BLAS numpy
uses in the pipelines) and returns its wall seconds. Bench JSON lines
carry it as ``host_probe_s`` so two rounds' absolute walls can be
compared in probe-relative units: ``wall / host_probe_s`` is stable
when only the host changed. Single-thread on purpose: it measures
per-core speed (what every Ray task sees) independent of load on the
other cores, and it costs ~2-6 s, not a full-machine burn.
"""

from __future__ import annotations

import time


def probe() -> float:
    """Seconds for the fixed single-thread probe workload (seeded, no I/O)."""
    import numpy as np

    a = np.random.RandomState(0).rand(2000, 2000)
    t0 = time.time()
    for _ in range(3):
        a @ a
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    print(probe())
