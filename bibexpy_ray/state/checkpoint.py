"""Run directory: stage-boundary checkpoints, lineage manifest, metrics.

The scaled-up analog of the reference's analysis-folder + skip-if-fresh
pattern (/root/reference/apps/api/services/analyses.py:26-101,
converter.py:103-111): each pipeline run owns a directory

    run_dir/
      manifest.json              run config + stage lineage
      metrics.jsonl              one record per completed stage (counts, seconds)
      stage=<name>/ ...parquet   materialized stage output
      stage=<name>/_DONE         atomic completion marker

``RunDir.materialize`` is the resume primitive: if a stage's ``_DONE`` marker
exists the parquet is read back and the compute closure never runs — a
restarted job skips every finished stage byte-identically (all stages are
deterministic: fixed seeds, order-free canonical choices).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray.data as rd


class RunDir:
    def __init__(self, path: str, config: dict | None = None):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._manifest_path = os.path.join(path, "manifest.json")
        if not os.path.exists(self._manifest_path):
            self._write_manifest({"config": config or {}, "stages": []})
        elif config:
            m = self.manifest()
            if m.get("config") and m["config"] != config:
                raise ValueError(
                    "run dir %s was created with a different config; refusing to resume"
                    % path
                )

    def manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.path, f"stage={name}")

    def is_done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.stage_dir(name), "_DONE"))

    def mark_done(self, name: str, metrics: dict | None = None) -> None:
        marker = os.path.join(self.stage_dir(name), "_DONE")
        os.makedirs(self.stage_dir(name), exist_ok=True)
        with open(marker + ".tmp", "w") as f:
            json.dump(metrics or {}, f)
        os.replace(marker + ".tmp", marker)
        m = self.manifest()
        if name not in m["stages"]:
            m["stages"].append(name)
            self._write_manifest(m)
        if metrics is not None:
            with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps({"stage": name, **metrics}) + "\n")

    def materialize(
        self, name: str, compute: Callable[[], "rd.Dataset"], metrics_fn=None
    ) -> "rd.Dataset":
        """Stage-boundary checkpoint: compute -> write parquet -> _DONE, or read
        back if already done. The write goes to a temp dir renamed into place so
        a mid-write crash never leaves a half-stage that looks complete."""
        sdir = self.stage_dir(name)
        if self.is_done(name):
            return rd.read_parquet(sdir)
        t0 = time.time()
        ds = compute()
        tmp = sdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        if os.path.exists(sdir):
            shutil.rmtree(sdir)
        os.replace(tmp, sdir)
        out = rd.read_parquet(sdir)
        metrics = {"seconds": round(time.time() - t0, 3), "rows": out.count()}
        if metrics_fn:
            metrics.update(metrics_fn(out))
        self.mark_done(name, metrics)
        return out

    def metrics(self) -> list[dict]:
        p = os.path.join(self.path, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
