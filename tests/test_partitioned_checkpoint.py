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
        # lineage entries are [path, size, mtime] fingerprints
        assert all(f[0].startswith(corpus) for f in lineage["inputs"])

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


def test_changed_corpus_invalidates_stale_partitions(tmp_path):
    """A corpus whose file list changed between runs must NOT resume from
    partitions computed under the old assignment: lineage is validated
    per-part, the stage fast path re-checks the whole partitioning, and
    read-back never sweeps up stale part dirs."""
    corpus = str(tmp_path / "corpus")
    _write_corpus(corpus)
    cfg = DedupConfig(feature_checkpoint_parts=N_FILES)
    run = str(tmp_path / "run")
    di.dedup_images(corpus, cfg, run_dir=run)

    # re-shard the same 192 rows into 3 files instead of 4 — every group's
    # file list changes, and one old part key (part-00003) goes stale
    table = synth.CorpusGen(42).rows(range(N_ROWS))
    for f in glob.glob(os.path.join(corpus, "*.parquet")):
        os.remove(f)
    step = N_ROWS // 3
    for i in range(3):
        end = N_ROWS if i == 2 else (i + 1) * step
        pq.write_table(table.slice(i * step, end - i * step),
                       os.path.join(corpus, f"g{i}.parquet"))
    cfg3 = DedupConfig(feature_checkpoint_parts=3)
    baseline = di.dedup_images(rd.read_parquet(corpus), cfg3)

    # same run dir, changed partitioning: without lineage validation this
    # would serve 4 stale parts (duplicated + misassigned rows). The config
    # guard keys on str(cfg), so reuse requires an equal cfg — simulate an
    # operator resuming after a corpus change by rewriting the manifest cfg.
    manifest = json.load(open(os.path.join(run, "manifest.json")))
    manifest["config"] = {"cfg": str(cfg3)}
    json.dump(manifest, open(os.path.join(run, "manifest.json"), "w"))
    res = di.dedup_images(corpus, cfg3, run_dir=run)
    assert _cluster_sets(res) == _cluster_sets(baseline)

    parts = sorted(glob.glob(os.path.join(run, "stage=features", "part-*")))
    assert len(parts) == 3  # the stale part-00003 was pruned
    for p in parts:
        lineage = json.load(open(os.path.join(p, "_DONE")))
        assert all(os.path.basename(f[0]).startswith("g") for f in lineage["inputs"])
    # feature row count must equal the corpus, not corpus + stale dup rows
    part_files = [f for p in parts for f in glob.glob(os.path.join(p, "*.parquet"))]
    assert rd.read_parquet(part_files).count() == N_ROWS


def test_regenerated_in_place_corpus_recomputes(tmp_path):
    """Same file NAMES, new contents: path-only lineage would resume every
    partition from stale data — the size/mtime fingerprint must force a
    recompute."""
    corpus = str(tmp_path / "corpus")
    _write_corpus(corpus)
    cfg = DedupConfig(feature_checkpoint_parts=N_FILES)
    run = str(tmp_path / "run")
    di.dedup_images(corpus, cfg, run_dir=run)
    sdir = os.path.join(run, "stage=features")
    mtimes = {p: os.path.getmtime(os.path.join(p, "_DONE"))
              for p in glob.glob(os.path.join(sdir, "part-*"))}

    # regenerate the corpus in place with DIFFERENT rows, same file names;
    # bump mtimes explicitly in case the fs clock is coarse
    table = synth.CorpusGen(7).rows(range(N_ROWS))
    step = N_ROWS // N_FILES
    for i in range(N_FILES):
        f = os.path.join(corpus, f"f{i}.parquet")
        pq.write_table(table.slice(i * step, step), f)
        os.utime(f, (os.path.getmtime(f) + 10, os.path.getmtime(f) + 10))
    baseline = di.dedup_images(rd.read_parquet(corpus), cfg)

    res = di.dedup_images(corpus, cfg, run_dir=run)
    assert _cluster_sets(res) == _cluster_sets(baseline)
    for p, old in mtimes.items():
        assert os.path.getmtime(os.path.join(p, "_DONE")) != old  # recomputed


def test_orphan_tmp_dir_not_read_back(tmp_path):
    """A crashed partition write leaves part-<key>.tmp; resume must neither
    read it back (parquet discovery would) nor leave it behind."""
    corpus = str(tmp_path / "corpus")
    _write_corpus(corpus)
    cfg = DedupConfig(feature_checkpoint_parts=N_FILES)
    run = str(tmp_path / "run")
    first = di.dedup_images(corpus, cfg, run_dir=run)

    sdir = os.path.join(run, "stage=features")
    parts = sorted(glob.glob(os.path.join(sdir, "part-*")))
    # fake a crash: a fully-written tmp dir (no _DONE inside counts as done
    # only via rename) plus a dropped stage marker
    shutil.copytree(parts[0], parts[0] + ".tmp")
    os.remove(os.path.join(sdir, "_DONE"))
    res = di.dedup_images(corpus, cfg, run_dir=run)
    assert _cluster_sets(res) == _cluster_sets(first)
    assert not os.path.exists(parts[0] + ".tmp")
