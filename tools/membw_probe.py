"""Memory-bandwidth scaling probe — evidence for BASELINE.md's scaling analysis.

Measures how two synthetic Ray workloads scale from a low to a high CPU count
on THIS machine:

* ``cpu``  — pure integer arithmetic in a tight loop (no memory traffic
  beyond L1). On real silicon this scales ~linearly with cores.
* ``mem``  — streaming passes over a buffer far larger than LLC (numpy
  element-wise ops), i.e. the memory-access profile of hashing / shuffling /
  Arrow kernel work that dominates the dedup pipelines.

If ``mem`` stops scaling while ``cpu`` keeps scaling, the machine's DRAM
bandwidth saturates below the tested parallelism — an environment ceiling
that no per-stage code change can lift. That distinction matters for the
north rule's N→4N criterion: on a real multi-node cluster every added node
brings its own memory controllers, so node-count scaling adds bandwidth
proportionally; same-box CPU-count scaling does not.

Usage: python tools/membw_probe.py [--levels 2,8,32] [--trials 3]
Prints one JSON line with per-level per-task mean seconds and speedups.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

TASKS_PER_CPU = 2  # enough waves to amortize scheduling, short enough to run fast


def _child(kind: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")

    @ray.remote(num_cpus=1)
    def cpu_task() -> float:
        t0 = time.time()
        x = 0
        for i in range(20_000_000):
            x = (x * 1103515245 + i) & 0xFFFFFFFF
        return time.time() - t0

    @ray.remote(num_cpus=1)
    def mem_task() -> float:
        import numpy as np

        # ~512 MB of streaming traffic per pass, 4 passes
        a = np.arange(64_000_000, dtype=np.uint64)
        t0 = time.time()
        for _ in range(4):
            a = a * np.uint64(0x9E3779B97F4A7C15)
            a ^= a >> np.uint64(29)
        return time.time() - t0

    fn = cpu_task if kind == "cpu" else mem_task
    n_tasks = num_cpus * TASKS_PER_CPU
    t0 = time.time()
    per_task = ray.get([fn.remote() for _ in range(n_tasks)])
    wall = time.time() - t0
    ray.shutdown()
    return {
        "kind": kind,
        "num_cpus": num_cpus,
        "tasks": n_tasks,
        "wall_s": round(wall, 2),
        "task_mean_s": round(sum(per_task) / len(per_task), 3),
        "tasks_per_s": round(n_tasks / wall, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--child", nargs=2, metavar=("KIND", "CPUS"))
    args = ap.parse_args()

    if args.child:
        print(json.dumps(_child(args.child[0], int(args.child[1]))))
        return

    levels = [int(x) for x in args.levels.split(",")]
    out: dict = {"levels": levels, "results": {}}
    for kind in ("cpu", "mem"):
        out["results"][kind] = {}
        for cpus in levels:
            best = None
            for _ in range(args.trials):
                subprocess.run(["ray", "stop", "--force"], capture_output=True,
                               timeout=120)
                time.sleep(1)
                proc = subprocess.run(
                    [sys.executable, __file__, "--child", kind, str(cpus)],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [l for l in proc.stdout.splitlines()
                        if l.startswith("{")][-1]
                r = json.loads(line)
                if best is None or r["tasks_per_s"] > best["tasks_per_s"]:
                    best = r
            out["results"][kind][str(cpus)] = best
    for kind in ("cpu", "mem"):
        rs = out["results"][kind]
        lo, hi = str(levels[0]), str(levels[-1])
        speedup = rs[hi]["tasks_per_s"] / rs[lo]["tasks_per_s"]
        out["results"][kind]["speedup"] = round(speedup, 2)
        out["results"][kind]["efficiency"] = round(
            speedup / (levels[-1] / levels[0]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
