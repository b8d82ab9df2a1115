"""Run directory: stage-boundary checkpoints, lineage manifest, metrics.

The scaled-up analog of the reference's analysis-folder + skip-if-fresh
pattern (/root/reference/apps/api/services/analyses.py:26-101,
converter.py:103-111): each pipeline run owns a directory

    run_dir/
      manifest.json              run config + stage lineage
      metrics.jsonl              one record per completed stage (counts, seconds)
      stage=<name>/ ...parquet   materialized stage output
      stage=<name>/_DONE         atomic completion marker
      stage=<name>/part-<key>/   per-partition output + _DONE lineage record
                                 (``materialize_partitioned`` stages only)

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
            # lineage (per-part input-file lists) lives in the _DONE marker
            # for resume validation; the append-only metrics log doesn't
            # need a copy per run
            slim = {k: v for k, v in metrics.items() if k != "lineage"}
            with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps({"stage": name, **slim}) + "\n")

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

    def invalidate_from(self, name: str) -> None:
        """Drop completion markers for ``name`` and every stage recorded
        after it (manifest order = pipeline completion order). Used when a
        completed stage's INPUTS changed between runs: every downstream
        checkpoint derives from the stale output, so resuming from any of
        them would silently serve results for the old inputs."""
        m = self.manifest()
        stages = m.get("stages", [])
        if name not in stages:
            return
        idx = stages.index(name)
        for later in stages[idx:]:
            marker = os.path.join(self.stage_dir(later), "_DONE")
            if os.path.exists(marker):
                os.remove(marker)
        m["stages"] = stages[:idx]
        self._write_manifest(m)

    def materialize_partitioned(
        self,
        name: str,
        partitions: list[tuple[str, list[str]]],
        compute_part: Callable[[list[str]], "rd.Dataset"],
    ) -> "rd.Dataset":
        """Partition-granular checkpoint for embarrassingly-parallel stages.

        ``partitions`` is ``[(key, inputs)]`` — ``key`` names the partition
        (filesystem-safe, stable across restarts) and ``inputs`` is its
        lineage (the input files it derives from). Each partition writes

            stage=<name>/part-<key>/ ...parquet
            stage=<name>/part-<key>/_DONE   {"inputs": [...], "rows": n,
                                             "seconds": s}

        via a temp-dir rename (the ``_DONE`` lineage record rides inside the
        renamed dir, so a partition is visible-complete atomically). A
        restarted run recomputes ONLY partitions missing their marker — at
        100 TB a stage is hours of work and stage-granular resume would
        discard all of it on a mid-stage crash. Each partition's compute is
        itself a parallel Ray Data job (parallel across its row groups), so
        the driver-side loop costs scheduling only.

        Lineage is validated, not trusted: a partition resumes only if its
        ``_DONE`` record's ``inputs`` equal the partition's current input
        list, and the stage-level fast path only fires when the whole
        partitioning (keys + inputs) matches what the stage completed with —
        a corpus whose file list changed between runs (new shard landed,
        re-sharded) recomputes exactly the reassigned partitions instead of
        silently serving features for the old assignment. Read-back targets
        the CURRENT partition dirs explicitly, so stale ``part-*`` dirs from
        an older partitioning (or orphaned ``.tmp`` dirs) never leak rows
        into the result; completion prunes them.

        Directory names use ``part-<key>`` (no ``=``) so parquet dataset
        discovery never hive-infers a partition column.
        """
        sdir = self.stage_dir(name)

        def _sig(path: str) -> list:
            # content fingerprint: path alone would resume stale data when a
            # corpus is regenerated in place under the same file names.
            # Local files get size+mtime; remote URIs (s3://...) fall back
            # to path-only — object stores version by key, not mtime.
            try:
                st = os.stat(path)
                # nanosecond mtime: whole-second granularity would resume
                # stale features for a corpus regenerated in place with the
                # same size within one second — the exact case the
                # fingerprint exists to catch
                mtime = getattr(st, "st_mtime_ns", None) or int(st.st_mtime * 1e9)
                return [path, st.st_size, int(mtime)]
            except OSError:
                return [path]

        lineage = {key: [_sig(p) for p in inputs] for key, inputs in partitions}
        part_dirs = [os.path.join(sdir, f"part-{key}") for key, _ in partitions]

        def read_current() -> "rd.Dataset":
            # read back ONLY the current partitions' files (a list given to
            # read_parquet must be files, and dataset discovery over the
            # stage dir would sweep up stale part dirs from an older
            # partitioning)
            files = [
                os.path.join(d, f)
                for d in part_dirs
                for f in sorted(os.listdir(d))
                if not f.startswith(("_", "."))
            ]
            return rd.read_parquet(files)

        if self.is_done(name):
            with open(os.path.join(sdir, "_DONE")) as f:
                done_meta = json.load(f)
            if done_meta.get("lineage") == lineage:
                return read_current()
            # partitioning changed since the stage finished: drop this
            # stage's marker AND every downstream stage's (their outputs
            # derive from the stale features), then fall through — per-part
            # validation below recomputes only the reassigned partitions
            self.invalidate_from(name)
        os.makedirs(sdir, exist_ok=True)
        t0 = time.time()
        resumed = 0
        total_rows = 0
        for key, inputs in partitions:
            pdir = os.path.join(sdir, f"part-{key}")
            marker = os.path.join(pdir, "_DONE")
            if os.path.exists(marker):
                with open(marker) as f:
                    rec = json.load(f)
                if rec.get("inputs") == lineage[key]:
                    total_rows += rec.get("rows", 0)
                    resumed += 1
                    continue
                shutil.rmtree(pdir)  # stale lineage: recompute
            pt0 = time.time()
            pds = compute_part(inputs)
            tmp = pdir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            pds.write_parquet(tmp)
            rows = rd.read_parquet(tmp).count()  # parquet metadata count
            with open(os.path.join(tmp, "_DONE"), "w") as f:
                json.dump(
                    {"inputs": lineage[key], "rows": rows,
                     "seconds": round(time.time() - pt0, 3)},
                    f,
                )
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
            os.replace(tmp, pdir)
            total_rows += rows
        current = {f"part-{key}" for key, _ in partitions}
        for entry in os.listdir(sdir):
            # prune EVERYTHING that is not a current partition or a marker:
            # stale part dirs from an older partitioning, orphaned .tmp
            # dirs, and flat parquet files left by a stage-granular
            # materialize() of the same stage (a later stage-granular
            # resume reads the whole dir and would double-count rows)
            if entry.startswith(("_", ".")) or entry in current:
                continue
            full = os.path.join(sdir, entry)
            if os.path.isdir(full):
                shutil.rmtree(full)
            else:
                os.remove(full)
        self.mark_done(
            name,
            {"seconds": round(time.time() - t0, 3), "rows": total_rows,
             "partitions": len(partitions), "resumed_partitions": resumed,
             "lineage": lineage},
        )
        return read_current()
