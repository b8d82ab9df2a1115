"""Per-partition feature checkpoints: path-input runs write one lineage-
carrying part per input-file group and a restarted run recomputes ONLY the
missing partitions (north-rule resumability: per-partition checkpoints with
lineage + metrics, not stage-granular restart-from-zero)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines import dedup_images as di

N_ROWS = 192
N_FILES = 4


def _cluster_sets(result):
    out = {}
    for m, c in result.cluster_map.items():
        out.setdefault(c, set()).add(m)
    return {frozenset(v) for v in out.values()}


def _write_corpus(dirpath: str) -> None:
    table = synth.CorpusGen(42).rows(range(N_ROWS))
    os.makedirs(dirpath)
    step = N_ROWS // N_FILES
    for i in range(N_FILES):
        pq.write_table(table.slice(i * step, step),
                       os.path.join(dirpath, f"f{i}.parquet"))


def test_partitioned_feature_checkpoint_and_partial_resume(tmp_path):
    corpus = str(tmp_path / "corpus")
    _write_corpus(corpus)
    cfg = DedupConfig(feature_checkpoint_parts=N_FILES)
    base = di.dedup_images(rd.read_parquet(corpus), cfg)

    run = str(tmp_path / "run")
    res = di.dedup_images(corpus, cfg, run_dir=run)
    assert _cluster_sets(res) == _cluster_sets(base)

    parts = sorted(glob.glob(os.path.join(run, "stage=features", "part-*")))
    assert len(parts) == N_FILES
    for p in parts:
        lineage = json.load(open(os.path.join(p, "_DONE")))
        assert lineage["inputs"] and lineage["rows"] > 0
        assert all(f.startswith(corpus) for f in lineage["inputs"])

    # kill one partition mid-stage: only it recomputes on resume
    shutil.rmtree(parts[1])
    os.remove(os.path.join(run, "stage=features", "_DONE"))
    mtime_keep = os.path.getmtime(os.path.join(parts[0], "_DONE"))
    res2 = di.dedup_images(corpus, cfg, run_dir=run)
    assert _cluster_sets(res2) == _cluster_sets(base)
    assert os.path.getmtime(os.path.join(parts[0], "_DONE")) == mtime_keep
    assert os.path.exists(os.path.join(parts[1], "_DONE"))
    feat_metrics = [m for m in json.load(open(os.path.join(run, "manifest.json")))
                    .get("stages", []) if m == "features"]
    assert feat_metrics  # stage recorded in the manifest
    resumed = [m for m in _metrics_lines(run)
               if m["stage"] == "features" and m.get("resumed_partitions") is not None]
    assert resumed[-1]["resumed_partitions"] == N_FILES - 1


def _metrics_lines(run: str):
    with open(os.path.join(run, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_fully_complete_partitioned_stage_short_circuits(tmp_path):
    corpus = str(tmp_path / "corpus")
    _write_corpus(corpus)
    cfg = DedupConfig(feature_checkpoint_parts=N_FILES)
    run = str(tmp_path / "run")
    first = di.dedup_images(corpus, cfg, run_dir=run)
    parts = sorted(glob.glob(os.path.join(run, "stage=features", "part-*")))
    mtimes = [os.path.getmtime(os.path.join(p, "_DONE")) for p in parts]
    again = di.dedup_images(corpus, cfg, run_dir=run)
    assert _cluster_sets(again) == _cluster_sets(first)
    assert [os.path.getmtime(os.path.join(p, "_DONE")) for p in parts] == mtimes
