"""Run-folder export + borderline decision lifecycle tests."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines.borderline import (
    apply_decisions,
    authority_conflict,
    load_decisions,
    pair_key,
    save_decisions,
)
from bibexpy_ray.pipelines.dedup_images import dedup_images
from bibexpy_ray.pipelines.export import load_manifest, save_run

N_ROWS = 120  # 10 cohorts


@pytest.fixture(scope="module")
def corpus_table():
    return synth.CorpusGen(42).rows(range(N_ROWS))


@pytest.fixture(scope="module")
def result(corpus_table):
    return dedup_images(rd.from_arrow(corpus_table), DedupConfig())


def test_save_run(tmp_path, result, corpus_table):
    out = str(tmp_path / "run1")
    manifest = save_run(result, rd.from_arrow(corpus_table), out)
    assert load_manifest(out) == manifest
    assert manifest["rows_canonical"] < N_ROWS  # losers dropped
    clusters = pd.read_parquet(os.path.join(out, "clusters"))
    assert len(clusters) == manifest["n_clusters"]
    tsv = pd.read_csv(os.path.join(out, "exports", "clusters.tsv"), sep="\t")
    assert len(tsv) == len(clusters)
    canon = pd.read_parquet(os.path.join(out, "canonical"))
    assert "cluster_id" in canon.columns and "bytes" in canon.columns


def test_borderline_accept_merges(result):
    row = result.borderline.iloc[0]
    key = pair_key(row["id_a"], row["id_b"])
    out = apply_decisions(result, {key: "accept"})
    assert out.cluster_map[row["id_a"]] == out.cluster_map[row["id_b"]]
    # pair leaves the queue
    keys = {pair_key(a, b) for a, b in zip(out.borderline["id_a"], out.borderline["id_b"])}
    assert key not in keys
    # idempotent: applying again changes nothing
    again = apply_decisions(out, {key: "accept"})
    assert again.cluster_map == out.cluster_map


def test_borderline_reject_removes_from_queue(result):
    row = result.borderline.iloc[0]
    key = pair_key(row["id_a"], row["id_b"])
    out = apply_decisions(result, {key: "reject"})
    assert out.cluster_map.get(row["id_a"]) != out.cluster_map.get(row["id_b"]) or (
        row["id_a"] not in out.cluster_map
    )
    keys = {pair_key(a, b) for a, b in zip(out.borderline["id_a"], out.borderline["id_b"])}
    assert key not in keys


def test_authority_conflict_vetoes_accept(result):
    """A stale accept for a pair with conflicting authority ids never merges
    (the reference's retro DOI-conflict guard)."""
    a, b = "img_000000000009#na0", "img_000000000010#nb0"
    assert authority_conflict(a, b)
    fake = result.borderline.copy()
    fake.loc[len(fake)] = {c: None for c in fake.columns}
    fake.iloc[-1, fake.columns.get_loc("id_a")] = a
    fake.iloc[-1, fake.columns.get_loc("id_b")] = b
    from bibexpy_ray.pipelines.dedup_images import DedupResult

    import ray.data as rd2

    doctored = DedupResult(
        clusters_ds=result.clusters_ds,
        labels=result.labels,
        borderline_ds=rd2.from_pandas(fake),
        audit_ds=result.audit_ds,
        metrics=result.metrics,
    )
    out = apply_decisions(doctored, {pair_key(a, b): "accept"})
    assert out.cluster_map.get(a, a) != out.cluster_map.get(b, b)


def test_decisions_roundtrip(tmp_path):
    p = str(tmp_path / "decisions.json")
    d = {"x|y": "accept", "p|q": "reject"}
    save_decisions(d, p)
    assert load_decisions(p) == d
    assert load_decisions(str(tmp_path / "missing.json")) == {}


def test_merged_records(result, corpus_table):
    ds = rd.from_arrow(corpus_table)
    merged, conflicts = result.merged_records(ds, policies={"caption": "longer_wins"})
    assert len(merged) == len(result.clusters)
    assert set(merged["cluster_id"]) == set(result.clusters["cluster_id"])
    # contained-caption cluster: merged caption is the longest member's
    rows = {r["image_id"]: r for r in corpus_table.to_pylist()}
    for _, m in merged.iterrows():
        members = result.clusters.set_index("cluster_id").loc[
            m["cluster_id"], "members"
        ].split("|")
        longest = max((rows[i]["caption"] for i in members), key=len)
        assert len(m["caption"]) >= len(longest) or m["caption"] == longest
    # differing captions inside a cluster must produce conflict-log rows
    assert len(conflicts) > 0 and {"field", "chosen", "cluster_id"} <= set(conflicts.columns)
