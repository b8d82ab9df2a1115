"""Checkpoint/resume: restart mid-pipeline must reproduce identical clusters."""

import json
import os
import shutil

import pytest
import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines.dedup_images import dedup_images
from bibexpy_ray.state.checkpoint import RunDir

N_ROWS = 120


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "c.parquet")
    synth.write_corpus_parquet(path, N_ROWS, use_ray=False)
    return path


def _run(corpus, run_dir):
    return dedup_images(rd.read_parquet(corpus), DedupConfig(), run_dir=run_dir)


def test_full_resume_skips_all_stages(corpus, tmp_path):
    rdir = str(tmp_path / "run")
    first = _run(corpus, rdir)
    stages_after_first = RunDir(rdir).manifest()["stages"]
    second = _run(corpus, rdir)
    assert second.cluster_map == first.cluster_map
    assert RunDir(rdir).manifest()["stages"] == stages_after_first


def test_partial_resume_recomputes_later_stage(corpus, tmp_path):
    rdir = str(tmp_path / "run")
    first = _run(corpus, rdir)
    # simulate a crash after candidate generation: nuke the verify checkpoint
    shutil.rmtree(os.path.join(rdir, "stage=verified"))
    second = _run(corpus, rdir)
    assert second.cluster_map == first.cluster_map
    assert sorted(map(tuple, second.borderline[["id_a", "id_b"]].to_numpy())) == sorted(
        map(tuple, first.borderline[["id_a", "id_b"]].to_numpy())
    )


def test_half_written_stage_is_not_trusted(corpus, tmp_path):
    rdir = str(tmp_path / "run")
    first = _run(corpus, rdir)
    # a stage dir without its _DONE marker must be recomputed, not read back
    vdir = os.path.join(rdir, "stage=verified")
    os.remove(os.path.join(vdir, "_DONE"))
    for f in os.listdir(vdir):
        if f.endswith(".parquet"):
            # truncate a shard to simulate a torn write
            with open(os.path.join(vdir, f), "w") as fh:
                fh.write("garbage")
            break
    second = _run(corpus, rdir)
    assert second.cluster_map == first.cluster_map


def test_config_mismatch_refuses(tmp_path):
    rdir = str(tmp_path / "run")
    RunDir(rdir, config={"cfg": "a"})
    with pytest.raises(ValueError):
        RunDir(rdir, config={"cfg": "b"})


def test_metrics_lineage_recorded(corpus, tmp_path):
    rdir = str(tmp_path / "run")
    _run(corpus, rdir)
    metrics = RunDir(rdir).metrics()
    stages = [m["stage"] for m in metrics]
    for expected in ("features", "exact_edges", "edges_raw", "verified", "result"):
        assert expected in stages
    for m in metrics:
        if m["stage"] != "result":
            assert m["rows"] >= 0 and m["seconds"] >= 0
